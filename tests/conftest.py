"""Shared pytest fixtures: one SparkSession per test session (JVM spin-up is
~10 s; never per-test), testdata paths, and small canonical line fixtures
mirroring FIXTURES.md §A/§C."""

from __future__ import annotations

import os

import pytest

from otus_cpp_11_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    s = get_spark(app_name="otus-cpp-11-spark-tests", shuffle_partitions=4)
    yield s
    s.stop()


# FIXTURES.md §A.1 — exact replica of /root/reference/test.txt: the 69
# three-digit strings 111,121,...,391,411,...,801 (401 absent).
NUMBERS69 = [str(n) for n in range(111, 802, 10) if n != 401]


@pytest.fixture(scope="session")
def lines_numbers69(spark):
    return spark.createDataFrame([(v,) for v in NUMBERS69], ["value"])


@pytest.fixture(scope="session")
def lines_dups(spark):
    return spark.createDataFrame(
        [("alpha",), ("alpha",), ("beta",), ("gamma",)], ["value"]
    )


@pytest.fixture(scope="session")
def lines_trivial(spark):
    return spark.createDataFrame([("apple",), ("banana",), ("cherry",)], ["value"])


@pytest.fixture(scope="session")
def lines_edge(spark):
    # empty line, single char, short/long shared-prefix pair, UTF-8 multibyte
    return spark.createDataFrame(
        [("",), ("a",), ("ab",), ("abc",), ("déjà-vu",), ("déjà-lu",)], ["value"]
    )
