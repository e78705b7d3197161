"""Round-12 retrieval extensions: metadata-filtered batch retrieval
through the served IVF-PQ index (the pre-filter vs post-filter trap,
now at the index layer) and the recursive-CTE blast-radius sweep
(Spark-native WITH RECURSIVE cross-checked against a driver-side BFS).
Value-level identities vs from-scratch recomputation are the driver
oracles' job (``knn_join_ivfpq_filtered`` / ``knn_ivfpq_filtered_recall``
/ ``dup_blast_radius``); these tests pin the structural invariants the
hash can't express."""

from __future__ import annotations

from collections import defaultdict, deque

from otus_cpp_11_spark.catalog import load_table
from otus_cpp_11_spark.queries.dedup import (
    BLAST_MAX_HOPS,
    BLAST_N_SEEDS,
    dup_blast_radius,
    near_dup_pairs_minhash,
)
from otus_cpp_11_spark.queries.similarity import (
    ANN_FILTER_SQL,
    KNN_TOPK,
    knn_join_ivfpq_filtered,
    knn_join_ivfpq_topk,
)

SF_DIR = "/root/testdata/sf0.001"


def _eligible_ids(spark):
    d = load_table(spark, SF_DIR, "documents")
    return {r[0] for r in d.where(ANN_FILTER_SQL).select("doc_id").collect()}


def test_filtered_join_returns_only_eligible_neighbors(spark):
    allowed = _eligible_ids(spark)
    rows = knn_join_ivfpq_filtered(spark, SF_DIR).collect()
    assert rows, "filtered retrieval returned nothing"
    for r in rows:
        assert r["neighbor_id"] in allowed
        assert r["neighbor_id"] != r["query_id"]


def test_prefilter_beats_postfilter_at_the_index(spark):
    """The trap ann_filtered_top5 documents, demonstrated at the INDEX
    layer: taking the unfiltered index top-k and filtering afterwards
    starves every query on this data (selective predicate), while the
    pre-filtered pipeline fills all k slots with eligible vectors."""
    allowed = _eligible_ids(spark)
    filt = knn_join_ivfpq_filtered(spark, SF_DIR).collect()
    unf = knn_join_ivfpq_topk(spark, SF_DIR).collect()
    n_filt, n_post = defaultdict(int), defaultdict(int)
    for r in filt:
        n_filt[r["query_id"]] += 1
    for r in unf:
        if r["neighbor_id"] in allowed:
            n_post[r["query_id"]] += 1
    assert all(c == KNN_TOPK for c in n_filt.values())  # full k, eligible
    starved = [q for q in n_filt if n_post.get(q, 0) < n_filt[q]]
    assert starved, "post-filtering lost nothing — trap not demonstrated"
    # pre-filtering can only add eligible candidates, never lose one
    assert all(n_post.get(q, 0) <= n_filt[q] for q in n_filt)


def test_blast_radius_matches_driver_side_bfs(spark):
    """The Spark-native recursive CTE computes exactly the bounded BFS:
    recompute min-hop distances from the same seeds with a plain Python
    BFS over the collected near-dup pair list and compare row-for-row
    (seeds = the BLAST_N_SEEDS smallest ids in the edge set, the query's
    own deterministic seed rule)."""
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in near_dup_pairs_minhash(spark, SF_DIR)
        .select("doc_a", "doc_b")
        .collect()
    ]
    assert pairs, "fixture has no near-dup pairs"
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    seeds = sorted(adj)[:BLAST_N_SEEDS]
    expect = {}
    for s in seeds:
        dist = {s: 0}
        frontier = deque([s])
        while frontier:
            u = frontier.popleft()
            if dist[u] >= BLAST_MAX_HOPS:
                continue
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    frontier.append(v)
        for node, h in dist.items():
            expect[(s, node)] = h
    got = {
        (r["seed_id"], r["doc_id"]): r["hops"]
        for r in dup_blast_radius(spark, SF_DIR).collect()
    }
    assert got == expect


def test_blast_radius_hops_bounded_and_seeded(spark):
    rows = dup_blast_radius(spark, SF_DIR).collect()
    assert rows
    seeds = {r["seed_id"] for r in rows}
    assert len(seeds) <= BLAST_N_SEEDS
    for r in rows:
        assert 0 <= r["hops"] <= BLAST_MAX_HOPS
        if r["doc_id"] == r["seed_id"]:
            assert r["hops"] == 0


def test_sq8_codes_in_range_and_recall_well_formed(spark):
    """SQ8 structural invariants: every quantized code lands in [0,255]
    (the clamp is load-bearing for out-of-train-range values), the
    recall row is per-query with recall in [0,1], and a vector is its
    own exact nearest neighbor when included (sanity of the integer
    distance) — checked by quantizing twice and asserting zero distance
    to itself."""
    from otus_cpp_11_spark.queries.similarity import (
        KNN_QUERY_MOD,
        SQ8_K,
        SQ8_UNIT_SCALE,
        sq8_retrieval_recall,
    )
    from pyspark.sql import functions as F

    e = load_table(spark, SF_DIR, "embeddings")
    ux = e.selectExpr(
        "vec_id",
        f"transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * "
        f"{SQ8_UNIT_SCALE}.0) AS BIGINT)) AS xu",
    )
    dims = ux.select(F.posexplode("xu").alias("dim", "v"))
    mm = (
        dims.groupBy("dim")
        .agg(
            F.min("v").alias("mnu"),
            F.greatest(F.max("v") - F.min("v"), F.lit(1).cast("bigint")).alias(
                "rngu"
            ),
        )
        .orderBy("dim")
        .collect()
    )
    mns = "array(" + ",".join(str(r["mnu"]) + "L" for r in mm) + ")"
    rngs = "array(" + ",".join(str(r["rngu"]) + "L" for r in mm) + ")"
    codes = ux.selectExpr(
        "vec_id",
        f"transform(xu, (x, i) -> CAST(LEAST(255, GREATEST(0, "
        f"((x - element_at({mns}, i + 1)) * 255) DIV "
        f"element_at({rngs}, i + 1))) AS BIGINT)) AS qa",
    ).collect()
    assert codes
    for r in codes:
        assert all(0 <= c <= 255 for c in r["qa"])
    rows = sq8_retrieval_recall(spark, SF_DIR).collect()
    n_queries = e.where(F.col("vec_id") % KNN_QUERY_MOD == 0).count()
    assert len(rows) == n_queries
    for r in rows:
        assert 0 <= r["n_overlap"] <= SQ8_K
        assert 0.0 <= r["recall"] <= 1.0


def test_quarantine_sweep_composes_decontam_and_bfs(spark):
    """quarantine_blast_sweep == BFS from the decontamination hits:
    hop-0 rows are exactly the flagged set, and every row's hop equals
    the driver-side multi-source BFS distance through the near-dup
    graph (isolated flagged docs quarantine themselves at hop 0)."""
    from otus_cpp_11_spark.queries.curation import (
        benchmark_decontamination,
        quarantine_blast_sweep,
    )

    flagged = {
        r["doc_id"]
        for r in benchmark_decontamination(spark, SF_DIR)
        .select("doc_id")
        .collect()
    }
    assert flagged, "fixture has no decontamination hits"
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in near_dup_pairs_minhash(spark, SF_DIR)
        .select("doc_a", "doc_b")
        .collect()
    ]
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    dist = {s: 0 for s in flagged}
    frontier = deque(flagged)
    while frontier:
        u = frontier.popleft()
        if dist[u] >= BLAST_MAX_HOPS:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                frontier.append(v)
    got = {
        r["doc_id"]: r["hops"]
        for r in quarantine_blast_sweep(spark, SF_DIR).collect()
    }
    assert got == dist
    assert {d for d, h in got.items() if h == 0} == flagged
