"""Unit tests for ops.joins (as-of join, bounded range join) on tiny
frames — edge cases the sf-corpus oracle queries can't isolate: equal
timestamps, no-match lefts, window boundary inclusion/exclusion, and
cell-boundary pairs in the bucketed range join."""

from __future__ import annotations

import datetime as dt

import pytest

from otus_cpp_11_spark.ops.joins import asof_join, range_join_within

T0 = dt.datetime(2025, 1, 1, 0, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [(1, 1, _ts(10)), (2, 1, _ts(20)), (3, 1, _ts(5)), (4, 2, _ts(10))],
        "trade_id long, sym long, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [(100, 1, _ts(8)), (101, 1, _ts(10)), (102, 1, _ts(15)), (103, 3, _ts(1))],
        "quote_id long, sym long, ts timestamp",
    )
    return trades, quotes


def test_asof_backward_picks_latest_at_or_before(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="sym", right_cols=["quote_id"])
    got = {r.trade_id: r.asof_quote_id for r in out.collect()}
    assert got == {
        1: 101,  # equal timestamp (10) is visible
        2: 102,  # latest earlier quote (15), not first (8)
        3: None,  # before any quote for sym 1
        4: None,  # sym 2 has no quotes at all
    }


def test_asof_keeps_all_left_rows_and_columns(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="sym", right_cols=["quote_id", "ts"])
    assert out.count() == trades.count()
    assert set(out.columns) == {"trade_id", "sym", "ts", "asof_quote_id", "asof_ts"}


def test_range_join_window_boundaries(spark):
    left = spark.createDataFrame([(1, 1, _ts(0))], "id long, k long, ts timestamp")
    right = spark.createDataFrame(
        [
            (10, 1, _ts(0)),   # equal ts: excluded (strict lower bound)
            (11, 1, _ts(30)),  # inside
            (12, 1, _ts(60)),  # exactly at window end: included (<=)
            (13, 1, _ts(61)),  # past window: excluded
            (14, 2, _ts(30)),  # wrong key
        ],
        "id long, k long, ts timestamp",
    )
    out = range_join_within(left, right, on="k", window="'1' HOUR")
    assert sorted(r.r_id for r in out.collect()) == [11, 12]


def test_range_join_no_duplicate_pairs_across_cells(spark):
    # right rows sit in the left row's own cell AND the next cell; each
    # qualifying pair must appear exactly once.
    left = spark.createDataFrame(
        [(1, 1, _ts(50))], "id long, k long, ts timestamp"
    )  # cell 0 (width=1h), replicated to cells 0 and 1
    right = spark.createDataFrame(
        [(10, 1, _ts(55)), (11, 1, _ts(60)), (12, 1, _ts(70))],
        "id long, k long, ts timestamp",
    )  # cells 0, 1, 1
    out = range_join_within(left, right, on="k", window="'1' HOUR").collect()
    assert sorted(r.r_id for r in out) == [10, 11, 12]
    assert len(out) == len({(r.l_id, r.r_id) for r in out})
