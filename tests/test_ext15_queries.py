"""Boundary tests for queries_ext15: unpivot melt shape, grouping_id
provenance, equi-depth bin membership under ties, and the strict
above-own-average boundary."""

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


def write_events(spark, tmp_path, rows):
    spark.createDataFrame(rows, EVENT_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def write_orders(spark, tmp_path, rows):
    spark.createDataFrame(rows, ORDER_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    return str(tmp_path)


def test_unpivot_melts_all_metrics_including_zero(spark, tmp_path):
    sf = write_events(
        spark,
        tmp_path,
        [(1, T0, 7, "view", 1.0, "{}"), (2, T0, 7, "click", 1.0, "{}")],
    )
    fn, _ = REGISTRY["unpivot_user_metrics"]
    rows = fn(spark, sf).collect()
    got = {r["metric"]: r["n"] for r in rows}
    assert got == {"view": 1, "click": 1, "purchase": 0}
    assert all(r["user_id"] == 7 for r in rows)


def test_grouping_sets_gid_provenance(spark, tmp_path):
    sf = write_orders(
        spark,
        tmp_path,
        [
            (1, 1, "O", 10.0, T0, "1-URGENT"),
            (2, 1, "F", 20.0, T0, "2-HIGH"),
        ],
    )
    fn, _ = REGISTRY["grouping_sets_order_totals"]
    rows = fn(spark, sf).collect()
    by_gid = {}
    for r in rows:
        by_gid.setdefault(r["gid"], []).append(r)
    # gid 1: by-status (priority aggregated), gid 2: by-priority, gid 3: total
    assert sorted(by_gid) == [1, 2, 3]
    assert {r["orderstatus"] for r in by_gid[1]} == {"O", "F"}
    assert all(r["orderpriority"] == "__all__" for r in by_gid[1])
    assert {r["orderpriority"] for r in by_gid[2]} == {"1-URGENT", "2-HIGH"}
    total = by_gid[3][0]
    assert total["n_orders"] == 2 and total["total_price"] == 30.0


def test_equi_depth_bins_balanced_and_ordered(spark, tmp_path):
    # 20 distinct values -> 10 bins of exactly 2, edges non-overlapping.
    sf = write_events(
        spark,
        tmp_path,
        [(i, T0, 1, "view", float(i), "{}") for i in range(1, 21)],
    )
    fn, _ = REGISTRY["equi_depth_value_bins"]
    rows = sorted(fn(spark, sf).collect(), key=lambda r: r["bin"])
    assert [r["bin"] for r in rows] == list(range(1, 11))
    assert all(r["n"] == 2 for r in rows)
    for a, b in zip(rows, rows[1:]):
        assert a["hi"] < b["lo"]


def test_above_avg_is_strict(spark, tmp_path):
    # Customer 1: 10, 20, 30 -> avg 20; only 30 is strictly above.
    sf = write_orders(
        spark,
        tmp_path,
        [
            (1, 1, "O", 10.0, T0, "2-HIGH"),
            (2, 1, "O", 20.0, T0, "2-HIGH"),
            (3, 1, "O", 30.0, T0, "2-HIGH"),
        ],
    )
    fn, _ = REGISTRY["orders_above_customer_avg"]
    rows = fn(spark, sf).collect()
    assert len(rows) == 1
    assert rows[0]["o_custkey"] == 1
    assert rows[0]["n_above"] == 1
    assert rows[0]["n_orders"] == 3
