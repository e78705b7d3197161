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


class TestBm25Retrieval:
    def test_topk_shape_and_rare_term_dominance(self, spark):
        from otus_cpp_11_spark.queries.text import (
            BM25_QUERIES,
            BM25_TOPK,
            doc_bm25_top5,
        )

        rows = doc_bm25_top5(spark, SF).collect()
        by_q = {}
        for r in rows:
            by_q.setdefault(r["query_id"], []).append(r)
        assert set(by_q) == {q for q, _ in BM25_QUERIES}
        docs = {
            r["doc_id"]: r["text"]
            for r in load_table(spark, SF, "documents").collect()
        }
        for qid, rs in by_q.items():
            assert [r["rank"] for r in rs] == list(range(1, BM25_TOPK + 1))
            scores = [r["score_units"] for r in rs]
            assert scores == sorted(scores, reverse=True)
            assert all(s > 0 for s in scores)
        # query 4 carries 'dup' (corpus df two orders below the common
        # vocabulary): its idf weight must put a dup-bearing doc at rank 1.
        # Tokenize the way the query does (any-whitespace split), not by
        # single-space substring match.
        top_doc = by_q[4][0]["doc_id"]
        assert "dup" in docs[top_doc].lower().split()

    def test_scores_are_exact_integers_no_transcendentals(self, spark):
        """The cross-engine determinism contract: score_units is bigint
        (exact integer micro-units), never a float column."""
        from otus_cpp_11_spark.queries.text import doc_bm25_top5

        schema = dict(doc_bm25_top5(spark, SF).dtypes)
        assert schema["score_units"] == "bigint"


class TestHardNegativeMining:
    def test_negatives_cross_label_and_ranked(self, spark):
        from otus_cpp_11_spark.queries.similarity import (
            HARDNEG_ANCHORS,
            HARDNEG_TOPK,
            hard_negative_mining,
        )

        e = load_table(spark, SF, "embeddings")
        labels = {
            r["vec_id"]: r["label"]
            for r in e.where(
                F.col("vec_id").isin(list(HARDNEG_ANCHORS))
            ).collect()
        }
        rows = hard_negative_mining(spark, SF).collect()
        assert len(rows) == len(HARDNEG_ANCHORS) * HARDNEG_TOPK
        by_a = {}
        for r in rows:
            assert r["neg_label"] != labels[r["anchor_id"]]
            by_a.setdefault(r["anchor_id"], []).append(r)
        for a, rs in by_a.items():
            assert [r["rank"] for r in rs] == list(range(1, HARDNEG_TOPK + 1))
            cos = [r["cosine"] for r in rs]
            assert cos == sorted(cos, reverse=True)

    def test_local_prune_matches_naive_global_topk(self, spark):
        """The two-stage (salted) window is an EXACT top-k: compare
        against the single-window naive formulation."""
        from otus_cpp_11_spark.queries.similarity import (
            HARDNEG_ANCHORS,
            HARDNEG_TOPK,
            cosine_sim,
            hard_negative_mining,
        )
        from pyspark.sql import Window

        e = load_table(spark, SF, "embeddings")
        a = e.where(F.col("vec_id").isin(list(HARDNEG_ANCHORS))).select(
            F.col("vec_id").alias("anchor_id"),
            F.col("label").alias("anchor_label"),
            F.col("embedding").alias("av"),
        )
        naive = (
            e.join(F.broadcast(a), F.col("label") != F.col("anchor_label"))
            .select(
                "anchor_id",
                F.col("vec_id").alias("neg_vec_id"),
                cosine_sim(F.col("embedding"), F.col("av")).alias("cosine"),
            )
            .withColumn(
                "rank",
                F.row_number().over(
                    Window.partitionBy("anchor_id").orderBy(
                        F.desc("cosine"), F.asc("neg_vec_id")
                    )
                ),
            )
            .where(F.col("rank") <= HARDNEG_TOPK)
        )
        want = {
            (r["anchor_id"], r["rank"], r["neg_vec_id"])
            for r in naive.collect()
        }
        got = {
            (r["anchor_id"], r["rank"], r["neg_vec_id"])
            for r in hard_negative_mining(spark, SF).collect()
        }
        assert got == want


class TestRrfFusion:
    def test_fusion_invariants_and_ranker_diversity(self, spark):
        from otus_cpp_11_spark.queries.text import (
            BM25_QUERIES,
            RRF_K,
            RRF_TOPK,
            _RRF_UNIT,
            doc_bm25_top5,
            retrieval_rrf_fusion,
        )

        rows = retrieval_rrf_fusion(spark, SF).collect()
        by_q = {}
        for r in rows:
            by_q.setdefault(r["query_id"], []).append(r)
        assert set(by_q) == {q for q, _ in BM25_QUERIES}
        max_units = 2 * (_RRF_UNIT // (RRF_K + 1))  # rank 1 in both pools
        for qid, rs in by_q.items():
            assert [r["rank"] for r in rs] == list(range(1, RRF_TOPK + 1))
            units = [r["rrf_units"] for r in rs]
            assert units == sorted(units, reverse=True)
            assert all(0 < u <= max_units for u in units)
        # the tf ranker must actually move something: fused top-5 differs
        # from pure-BM25 top-5 for at least one query (otherwise the
        # fusion is vacuous at this fixture)
        bm25 = {
            (r["query_id"], r["rank"], r["doc_id"])
            for r in doc_bm25_top5(spark, SF).collect()
        }
        fused = {(r["query_id"], r["rank"], r["doc_id"]) for r in rows}
        assert fused != bm25


class TestBootstrapCi:
    def test_interval_brackets_point_and_matches_pure_python(self, spark):
        """Independent reference implementation: recompute the replica
        sums with hashlib md5 over the same (replica, position) keys and
        compare the exact integers — validates the in-engine hex-index
        math against a second implementation, not just DuckDB's."""
        import hashlib

        from otus_cpp_11_spark.queries.sampling import (
            BOOT_B,
            BOOT_HI_RANK,
            BOOT_LO_RANK,
            eval_bootstrap_ci,
        )
        from otus_cpp_11_spark.queries.text import (
            QUALITY_MIN_STOP_RATIO,
            QUALITY_MIN_TOKENS,
            STOPWORDS,
        )

        row = eval_bootstrap_ci(spark, SF).collect()[0]
        assert row["ci_lo_rate"] <= row["point_rate"] <= row["ci_hi_rate"]
        assert row["n_replicas"] == BOOT_B

        docs = sorted(
            load_table(spark, SF, "documents").collect(),
            key=lambda r: r["doc_id"],
        )
        s = []
        for r in docs:
            toks = [t for t in r["text"].split(" ") if t]
            stop = sum(1 for t in toks if t in STOPWORDS)
            ok = (
                len(toks) >= QUALITY_MIN_TOKENS
                and stop / len(toks) >= QUALITY_MIN_STOP_RATIO
            )
            s.append(1 if ok else 0)
        n = len(s)
        assert row["n_examples"] == n and row["point_sum"] == sum(s)
        sums = []
        for b in range(1, BOOT_B + 1):
            tot = 0
            for j in range(1, n + 1):
                h = hashlib.md5(f"{b}:{j}".encode()).hexdigest()
                tot += s[int(h[:12], 16) % n]
            sums.append(tot)
        sums.sort()
        assert row["ci_lo_rate"] == sums[BOOT_LO_RANK - 1] / n
        assert row["ci_hi_rate"] == sums[BOOT_HI_RANK - 1] / n


class TestDiversifiedRetrieval:
    def test_suppression_fires_and_preserves_order(self, spark):
        """The near-dup suppression must actually change the result at
        this fixture (the planted duplicates collide inside the BM25
        pools), and survivors must keep their BM25 relative order with
        unique signatures per (query, simhash)."""
        from otus_cpp_11_spark.queries.dedup import _simhash_df
        from otus_cpp_11_spark.queries.text import (
            DIVERSE_TOPK,
            _bm25_scores,
            retrieval_diversified_top3,
        )

        rows = retrieval_diversified_top3(spark, SF).collect()
        sig = {r["doc_id"]: r["simhash"] for r in _simhash_df(spark, SF).collect()}
        plain = {}
        for r in sorted(
            _bm25_scores(spark, SF).collect(),
            key=lambda r: (r["query_id"], -r["score_units"], r["doc_id"]),
        ):
            plain.setdefault(r["query_id"], []).append(r["doc_id"])
        by_q = {}
        for r in rows:
            by_q.setdefault(r["query_id"], []).append(r)
        for qid, rs in by_q.items():
            assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
            assert len(rs) <= DIVERSE_TOPK
            sigs = [sig[r["doc_id"]] for r in rs]
            assert len(sigs) == len(set(sigs))  # unique signature per result
            # survivors keep BM25 relative order: each result must appear
            # in the plain ordering, in the same relative sequence
            pos = [plain[qid].index(r["doc_id"]) for r in rs]
            assert pos == sorted(pos)
        # the suppression must have candidates to act on at this fixture:
        # at least one (query, signature) pool group holds > 1 doc (the
        # planted near-dups collide inside the top-20 pools — verified by
        # the DuckDB probe that motivated this query)
        from otus_cpp_11_spark.queries.text import RRF_POOL

        collisions = 0
        for qid, docs_ranked in plain.items():
            pool_sigs = [sig[d] for d in docs_ranked[:RRF_POOL]]
            collisions += len(pool_sigs) - len(set(pool_sigs))
        assert collisions >= 1


def test_filtered_ann_prefilter_beats_postfilter(spark):
    """The correctness trap ann_filtered_top5's docstring names: taking
    the UNFILTERED top-k and then filtering is not the filtered top-k.
    Concretely on this data: post-filtering loses eligible neighbors
    ranked below k (or returns fewer than k rows), while the pre-filter
    result is exactly brute force over the eligible set."""
    from otus_cpp_11_spark.queries.similarity import (
        ANN_FILTER_SQL,
        FILTERED_TOPK,
        QUERY_VEC_ID,
        ann_filtered_top5,
        cosine_sim,
    )

    got = [(r.vec_id, round(r.cosine, 9)) for r in ann_filtered_top5(spark, SF).collect()]
    assert len(got) == FILTERED_TOPK

    e = load_table(spark, SF, "embeddings")
    d = load_table(spark, SF, "documents")
    q = e.where(F.col("vec_id") == QUERY_VEC_ID).select(F.col("embedding").alias("qv"))
    scored = (
        e.where(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(q))
        .select("vec_id", cosine_sim(F.col("embedding"), F.col("qv")).alias("cosine"))
    )
    allowed = {r.doc_id for r in d.where(ANN_FILTER_SQL).select("doc_id").collect()}
    ranked = [
        (r.vec_id, round(r.cosine, 9))
        for r in scored.orderBy(F.desc("cosine"), "vec_id").collect()
    ]
    # exact filtered top-k from the full ranking == the query's answer
    want = [p for p in ranked if p[0] in allowed][:FILTERED_TOPK]
    assert got == want
    # the broken shape: filter AFTER truncating to the top-k
    post = [p for p in ranked[:FILTERED_TOPK] if p[0] in allowed]
    assert post != want, (
        "fixture too permissive: unfiltered top-k happens to be all "
        "eligible — tighten ANN_FILTER_SQL so the trap is demonstrable"
    )
