"""Boundary tests for queries_ext18: recursive spine completeness,
multiset-op arithmetic, and percentile_approx accuracy vs exact."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

REGISTRY = load_all()

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
ORDER_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def test_recursive_spine_manufactures_empty_months(spark, tmp_path):
    # Orders only in Jan and Apr -> spine must still emit Feb/Mar as 0.
    rows = [
        (1, 1, "O", 100.0, dt.datetime(2025, 1, 15), "2-HIGH"),
        (2, 1, "O", 200.0, dt.datetime(2025, 4, 10), "2-HIGH"),
    ]
    spark.createDataFrame(rows, ORDER_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    fn, _ = REGISTRY["monthly_calendar_gapfill_recursive"]
    got = sorted(fn(spark, str(tmp_path)).collect(), key=lambda r: r["month_start"])
    assert len(got) == 4
    assert [r["n_orders"] for r in got] == [1, 0, 0, 1]
    assert [r["revenue"] for r in got] == [100.0, 0.0, 0.0, 200.0]


def test_except_all_intersect_all_multiplicity(spark, tmp_path):
    # Day1: user 1 ×3, user 2 ×1. Day2: user 1 ×1, user 3 ×2.
    # EXCEPT ALL -> user1 ×2 + user2 ×1 = 3 events, 2 users.
    # INTERSECT ALL -> user1 ×1 = 1 event.
    d1 = dt.datetime(2024, 1, 5, 12, 0, 0)
    d2 = dt.datetime(2024, 1, 6, 12, 0, 0)
    rows = (
        [(i, d1, 1, "view", 0.0, "{}") for i in range(3)]
        + [(3, d1, 2, "view", 0.0, "{}")]
        + [(4, d2, 1, "view", 0.0, "{}")]
        + [(5 + i, d2, 3, "view", 0.0, "{}") for i in range(2)]
    )
    spark.createDataFrame(rows, EVENT_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    fn, _ = REGISTRY["user_multiset_except_all"]
    row = fn(spark, str(tmp_path)).collect()[0]
    assert row["surplus_events"] == 3
    assert row["surplus_users"] == 2
    assert row["common_events"] == 1


def test_percentile_approx_tracks_exact_within_rank_error(spark):
    sf = "/root/testdata/sf0.001"
    fn, _ = REGISTRY["value_percentiles_approx"]
    approx = {r["event_type"]: r for r in fn(spark, sf).collect()}
    ev = load_table(spark, sf, "events").filter(F.col("value").isNotNull())
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.9)").alias("p90"),
        )
        .collect()
    }
    # accuracy=10000 -> rank error <= n/10000; at fixture n (~12k/group)
    # that is a couple of ranks — values must sit within 2% of exact.
    for et in exact:
        for a_col, e_col in (("p50_approx", "p50"), ("p90_approx", "p90")):
            a, e = approx[et][a_col], exact[et][e_col]
            assert abs(a - e) <= max(0.02 * abs(e), 1e-6), (et, a_col, a, e)
