"""otus_cpp_11_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference MapReduce framework
(CityAplons/otus-cpp-11), re-expressed Spark-first.

Layout:
    session     SparkSession factory (local test mode / cluster-ready confs)
    catalog     testdata table loading + temp-view registration
    prefix      the reference's flagship query: minimal unique prefix length
    mapreduce   generic MapReduceJob API (reference framework parity)
    queries/    relational operator surface (TPC-H-ish) with DuckDB oracles
    ops/        LLM-pipeline extensions: dedup, similarity, text, multimodal
    streaming/  Structured Streaming over the events table

Reference parity citations use `/root/reference/<file>:<line>` in docstrings.
"""

from otus_cpp_11_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
