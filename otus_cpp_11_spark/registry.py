"""Query registry: the single source of truth mapping query names to
(Spark implementation, DuckDB oracle SQL).

Every operator the engine claims (SURVEY.md §2) registers here; the driver
contract (``__spark_entry__.py``) and the bench harness both read this
registry, so an operator exists exactly when it is correctness-gated.

Determinism rules every registered query follows (so the driver's
order-insensitive value-hash matches the oracle bit-for-bit):

* Sums of double columns go through an exact decimal cast first —
  ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)`` — because floating-point
  summation order differs between engines (and between Spark partitions run
  to run); decimal addition is exact and associative, and the per-row
  double→decimal rounding of the *same* input value is identical in both
  engines. Averages are expressed as decimal-sum / count in double.
* Every LIMIT/top-k has a total tie-break order (append a unique key).
* Aggregate/computed columns are aliased identically in Spark and SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only
    doc: str = ""
    bench: bool = False  # include in bench.py headline set


_REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None = None, bench: bool = False
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name, fn, oracle, (fn.__doc__ or "").strip(), bench)
        return fn

    return deco


# Queries with a green hash_match row in a previous round's driver
# CORRECTNESS report. The driver verifies the FIRST 50 entries of
# ``queries()`` each round, so ``all_queries()`` orders not-yet-verified
# queries first: already-proven ones yield their window slot (they remain
# gated locally by scripts/check_oracle.py every round).
#
# A green row certifies the CODE that was verified, not the name: any
# query whose Spark impl or oracle SQL materially changes after its green
# round MUST leave this set so the driver re-verifies the new code.
# Removed for round 2 on that rule: near_dup_pairs_minhash (impl + oracle
# rewritten: Carter-Wegman signatures, array_intersect verify, salted
# candidates) and doc_dedup_clusters / near_dup_edit_distance (their
# oracles embed the rewritten near-pairs CTE chain and their impls
# consume the rewritten pairs query). Both re-verified green in r2.
# NOT listed despite r2 rows: user_event_sessions / purchase_prior_click_asof
# / view_purchase_within_6h (errored on TIMESTAMP_NTZ in r2, impls touched
# by the round-3 epoch_us fix — they re-queue) and events_user_sketches
# (rows-only in r2; round 3 added an exact-count oracle gate, re-queues).
DRIVER_VERIFIED: frozenset[str] = frozenset({
    # CORRECTNESS_r02.json (rows+schema+hash all true)
    "ann_cosine_top10", "bpe_pair_counts", "corpus_curation_pipeline",
    "customer_monthly_retention", "customer_order_window_family",
    "daily_open_shipments", "doc_dedup_clusters", "doc_pack_bins",
    "doc_passage_chunks",
    # embedding_near_dup_pairs deliberately NOT listed despite its r2 green:
    # round 3 added the hot-block salt-grid path, so it re-queues.
    "embedding_quantization", "events_multires_rollup",
    "events_session_windows", "events_sliding_10min_5min",
    "events_tumbling_5min", "ivf_cosine_top5", "label_centroids",
    "label_whitening_residuals", "lineitem_measures_unpivot",
    "lineitem_price_qty_corr", "lsh_cosine_top5",
    "lsh_cosine_top5_multiprobe", "nation_richest_customer",
    "near_dup_edit_distance", "near_dup_pairs_minhash",
    "orders_price_percentiles", "q11_important_stock",
    "q12_priority_shipping", "q13_customer_distribution",
    "q14_promo_revenue", "q15_top_supplier", "q16_part_supplier_relation",
    "q17_small_quantity_revenue", "q18_large_orders",
    "q19_discounted_revenue", "q20_potential_promotion",
    "q21_waiting_supplier", "q22_global_sales_opportunity",
    "q2_min_cost_supplier", "q4_order_priority", "q6_forecast_revenue",
    "q7_nation_volume", "q8_market_share", "q9_product_profit",
    "user_value_moving_avg", "user_value_zscore_outliers",
    # CORRECTNESS_r01.json (rows+schema+hash all true)
    "corpus_dedup_stats", "exact_dup_groups",
    "doc_simhash32", "simhash_near_pairs", "ngram_jaccard_pairs",
    # benchmark_decontamination NOT listed despite its r1 green: round 3
    # switched it to raw shingles (3x faster, same semantics) — re-queues.
    "doc_repetition_stats", "doc_top_terms",
    "prefix_min_unique_len", "word_count", "sum_of_squares",
    "unique_by_abs", "prefix_counts_l1", "multimodal_decode_features",
    "multimodal_frame_sample", "doc_passage_chunks_udtf", "doc_token_stats",
    "doc_quality_score", "doc_lang_id", "doc_fingerprint",
    "cross_modal_doc_features", "latest_event_per_user",
    "balanced_doc_sample", "q1_pricing_summary", "q3_shipping_priority",
    "q5_local_supplier_volume", "customers_without_orders",
    "suppliers_with_returns", "top3_orders_per_customer",
    "customer_running_spend", "orders_rollup", "orders_cube",
    "order_distinct_aggs", "nation_set_ops", "scalar_string_math",
    "orders_by_month", "nation_supplier_left_join",
    "region_nation_full_outer", "customers_above_avg_balance",
    "parts_larger_than_brand_avg", "orderstatus_pivot",
    "orders_grouping_sets", "region_nation_list", "q10_returned_revenue",
})

# Unverified queries that exceed the 50-slot window this round, ordered
# after the rest of the unverified set (they stay gated by the local
# oracle harness and take a slot next round). Queries added mid-round go
# here so they don't displace the 50 already queued for driver rows.
# Round 3: empty — the 90 r1+r2 greens yield their slots, so the 3 NTZ-fix
# re-queues, the 11 r2 deferrals, and every query added this round all fit
# inside the 50-slot window.
WINDOW_DEFER: frozenset[str] = frozenset()


def all_queries() -> dict[str, Query]:
    """Import every query module (idempotent) and return the registry,
    ordered driver-unverified first (stable registration order within each
    group) so the driver's first-50 correctness window always lands on
    queries that still need a green row."""
    from otus_cpp_11_spark.queries import (  # noqa: F401
        curation,
        dedup,
        mapreduce_ops,
        multimodal,
        pandas_ops,
        pipeline,
        relational,
        rollup,
        sampling,
        similarity,
        text,
        timeseries,
        tpch_extra,
    )

    items = list(_REGISTRY.items())
    items.sort(
        key=lambda kv: (kv[0] in DRIVER_VERIFIED, kv[0] in WINDOW_DEFER)
    )  # stable within each group
    return dict(items)
