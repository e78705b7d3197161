"""Round-7 operator invariants: incremental ANN (PQ) index refresh over
versioned manifest commits."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from otus_cpp_11_spark.catalog import load_table

SF = "/root/testdata/sf0.01"


class TestPqIncrementalRefresh:
    def test_append_refresh_encodes_only_the_delta(self, spark):
        """The r6 verdict item-6 'Done' gate, accounting half (the
        equality half is the driver oracle: pq_index_after_append's
        oracle is a from-scratch full rebuild): the refreshed index's
        v2 manifest must carry every v1 file BY REFERENCE, and the
        append's fresh files must hold exactly the ingest slice — i.e.
        the refresh encoded only the new vectors."""
        from otus_cpp_11_spark.ops.versioned import (
            current_version,
            read_manifest,
            version_header,
        )
        from otus_cpp_11_spark.queries.similarity import (
            PQ_INGEST_MOD,
            _pq_versioned_index,
        )

        path = _pq_versioned_index(spark, SF)
        assert current_version(spark, path) == 2
        h1, files1 = read_manifest(spark, path, 1)
        h2, files2 = read_manifest(spark, path, 2)
        assert h1["stage"] == "bulk-build"
        assert h2["op"] == "append" and h2["stage"] == "ingest-refresh"
        # every bulk-build file is referenced verbatim by the refresh
        assert set(files1) < set(files2)
        fresh = sorted(set(files2) - set(files1))
        assert fresh
        delta_ids = {
            r["vec_id"]
            for r in spark.read.parquet(*[f"{path}/{f}" for f in fresh])
            .select("vec_id")
            .collect()
        }
        e = load_table(spark, SF, "embeddings")
        want = {
            r["vec_id"]
            for r in e.where(
                F.col("vec_id") % PQ_INGEST_MOD == PQ_INGEST_MOD - 1
            ).collect()
        }
        assert delta_ids == want  # only the delta was encoded, all of it

    def test_refresh_is_idempotent_reentry(self, spark):
        """A second call must be a pure read: no version 3, no re-encode
        (the stored-index contract — queries never rebuild a live
        index)."""
        from otus_cpp_11_spark.ops.versioned import current_version
        from otus_cpp_11_spark.queries.similarity import _pq_versioned_index

        p1 = _pq_versioned_index(spark, SF)
        p2 = _pq_versioned_index(spark, SF)
        assert p1 == p2
        assert current_version(spark, p1) == 2

    def test_time_travel_to_pre_ingest_build(self, spark):
        """Readers pinned to the bulk build (v1) must see ONLY pre-ingest
        vectors — the snapshot-isolation face of the index lifecycle."""
        from otus_cpp_11_spark.ops.versioned import read_version
        from otus_cpp_11_spark.queries.similarity import (
            PQ_INGEST_MOD,
            _pq_versioned_index,
        )

        path = _pq_versioned_index(spark, SF)
        v1 = read_version(spark, path, 1)
        assert (
            v1.where(
                F.col("vec_id") % PQ_INGEST_MOD == PQ_INGEST_MOD - 1
            ).count()
            == 0
        )
        n_all = load_table(spark, SF, "embeddings").count()
        assert v1.count() < n_all
        assert read_version(spark, path, 2).count() == n_all
