"""Boundary tests for queries_ext27: forward as-of inclusion semantics
and percent_rank/cume_dist tie handling."""

from __future__ import annotations

import datetime as dt

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
ORDER_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def at(sec):
    return dt.datetime(2026, 1, 1, 10, 0, sec)


def test_forward_asof_next_purchase_gaps(spark, tmp_path):
    rows = [
        # user 1: view at t0, purchase at t10 -> gap 10; click at t20 with
        # no later purchase -> unconverted
        (1, at(0), 1, "view", 1.0, "{}"),
        (2, at(10), 1, "purchase", 5.0, "{}"),
        (3, at(20), 1, "click", 1.0, "{}"),
        # user 2: view AFTER their only purchase -> unconverted
        (4, at(30), 2, "purchase", 5.0, "{}"),
        (5, at(40), 2, "view", 1.0, "{}"),
    ]
    spark.createDataFrame(rows, EVENT_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    fn, _ = REGISTRY["time_to_next_purchase"]
    got = {r["event_type"]: r for r in fn(spark, str(tmp_path)).collect()}
    assert got["view"]["n_events"] == 2
    assert got["view"]["n_converted"] == 1
    assert got["view"]["sum_gap_s"] == 10
    assert got["click"]["n_converted"] == 0
    assert "purchase" not in got


def test_decile_profile_tie_semantics(spark, tmp_path):
    # 10 orders, one priority; the two top-priced are TIED -> percent_rank
    # gives both (rank-1)/(n-1) = 8/9 < 0.9, so NEITHER lands in the top
    # decile (ties stay together); the single cheapest has cume_dist 0.1.
    prices = [10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0, 80.0, 90.0, 90.0]
    rows = [
        (i, 1, "O", p, at(0), "1-URGENT") for i, p in enumerate(prices)
    ]
    spark.createDataFrame(rows, ORDER_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    fn, _ = REGISTRY["order_priority_decile_profile"]
    (row,) = fn(spark, str(tmp_path)).collect()
    assert row["n_orders"] == 10
    assert row["n_bottom_decile"] == 1
    assert row["n_top_decile"] == 0
