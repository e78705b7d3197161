"""quality_gate_kappa degenerate denominator (r8 advice): when both
gates are constant within a source, n*n - chance is exactly zero and
kappa is undefined — the Spark side must guard the division and the
DuckDB oracle must NULLIF, so BOTH engines agree on NULL instead of
relying on Spark's non-ANSI divide-by-zero semantics matching DuckDB's
double division."""

from __future__ import annotations

import duckdb
import pandas as pd

from otus_cpp_11_spark.registry import all_queries


def test_constant_gate_source_yields_null_kappa_in_both_engines(
    spark, tmp_path
):
    docs = pd.DataFrame(
        {
            # source "const": every doc fails BOTH gates (few tokens,
            # n_chars under the length gate) -> chance == n*n, denom 0
            "doc_id": [1, 2, 3, 4, 5, 6],
            "text": [
                "tiny", "tiny", "tiny",
                # source "mixed": one long-enough doc of pure stopwords
                # (passes A and B), one failing both
                "the and of to in that it is was for " * 30,
                "x",
                "the and of to in that it is was for " * 30,
            ],
            "lang": ["en"] * 6,
            "source": ["const"] * 3 + ["mixed"] * 3,
            "n_chars": [4, 4, 4, 1100, 1, 1100],
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    docs.to_parquet(sf / "documents.parquet", index=False)
    q = all_queries()["quality_gate_kappa"]
    got = q.fn(spark, str(sf)).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(q.oracle).df()
    assert list(got["source"]) == list(want["source"]) == ["const", "mixed"]
    # the constant source is NULL in BOTH engines — not 0, not an error
    assert pd.isna(got["kappa"][0]) and pd.isna(want["kappa"][0])
    # the mixed source divides identical integers to an identical double
    assert not pd.isna(got["kappa"][1])
    assert got["kappa"][1] == want["kappa"][1]
