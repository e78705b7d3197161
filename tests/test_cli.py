"""CLI parity test: the golden e2e of the reference binary
(`Result = 2` on its bundled test.txt fixture, SURVEY.md §2.3.7) through
our argparse surface, including the per-iteration output layout
(iter{L}/result.txt with 0/1, mirroring src/runner.cpp:65)."""

from __future__ import annotations

import pytest

from otus_cpp_11_spark.cli import build_parser, main


@pytest.fixture(autouse=True)
def _restore_shuffle_partitions(spark):
    """cli.main builds its session with shuffle_partitions = R (the
    reference's reducer count); under getOrCreate that retunes the SHARED
    test session, and R=2 would leak into every later test (it broke the
    skew-split plan test: with 2 partitions the skew detector's median IS
    the hot partition). Snapshot and restore."""
    prior = spark.conf.get("spark.sql.shuffle.partitions")
    yield
    spark.conf.set("spark.sql.shuffle.partitions", prior)


def test_parser_defaults_mirror_reference():
    args = build_parser().parse_args(["-i", "x.txt"])
    # reference CLI defaults m=3, r=2 (src/main.cpp:49)
    assert (args.mappers, args.reducers, args.debug) == (3, 2, False)


def test_cli_golden_result_and_iter_layout(spark, tmp_path, capsys):
    out = tmp_path / "out"
    rc = main(["-i", "/root/reference/test.txt", "--out", str(out)])
    assert rc == 0
    assert "Result = 2" in capsys.readouterr().out
    assert (out / "iter1" / "result.txt").read_text() == "0\n"
    assert (out / "iter2" / "result.txt").read_text() == "1\n"


def test_cli_duplicate_lines_exit_code(spark, tmp_path, capsys):
    f = tmp_path / "dups.txt"
    f.write_text("same\nsame\nother\n")
    rc = main(["-i", str(f)])
    assert rc == 1
    assert "not found" in capsys.readouterr().out
