"""Boundary tests for queries_ext19: sorted-set rendering, tie-keeping
rank cut, and extremum-lookup ordering."""

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
T0 = dt.datetime(2026, 1, 1, 10, 0, 0)


def ts(m, s=0):
    return dt.datetime(2026, 1, 1, 10, m, s)


def test_type_sets_sorted_and_deduped(spark, tmp_path):
    rows = [
        (1, ts(0), 1, "view", 0.0, "{}"),
        (2, ts(1), 1, "click", 0.0, "{}"),
        (3, ts(2), 1, "view", 0.0, "{}"),  # dup type
    ]
    spark.createDataFrame(rows, EVENT_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    fn, _ = REGISTRY["user_event_type_sets"]
    row = fn(spark, str(tmp_path)).collect()[0]
    assert row["types_csv"] == "click,view"  # sorted, deduped
    assert row["n_types"] == 2


def test_rank_cut_keeps_ties_beyond_k(spark, tmp_path):
    # 4 orders: 300, 200, 100, 100 -> rank<=3 keeps ALL FOUR (tie at 3rd).
    rows = [
        (1, 1, "O", 300.0, T0, "2-HIGH"),
        (2, 1, "O", 200.0, T0, "2-HIGH"),
        (3, 1, "O", 100.0, T0, "2-HIGH"),
        (4, 1, "O", 100.0, T0, "2-HIGH"),
    ]
    spark.createDataFrame(rows, ORDER_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    fn, _ = REGISTRY["top3_orders_with_ties"]
    got = fn(spark, str(tmp_path)).collect()
    assert len(got) == 4
    assert sorted(r["rk"] for r in got) == [1, 2, 3, 3]


def test_first_last_follow_time_not_insertion(spark, tmp_path):
    # Insert out of time order; first/last must follow ts.
    rows = [
        (10, ts(5), 1, "click", 50.0, "{}"),
        (11, ts(0), 1, "view", 10.0, "{}"),
        (12, ts(9), 1, "purchase", 99.0, "{}"),
    ]
    spark.createDataFrame(rows, EVENT_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    fn, _ = REGISTRY["user_first_last_event_values"]
    row = fn(spark, str(tmp_path)).collect()[0]
    assert row["first_value"] == 10.0
    assert row["last_value"] == 99.0
    assert row["last_type"] == "purchase"
