"""Boundary tests for queries_ext4: as-of join tie semantics, funnel
strict time-ordering, and hash-sample partition-independence.

The oracle harness (tools/check_oracle.py) checks these against DuckDB at
fixture scale; these tests pin the SEMANTIC edges on tiny hand-built
inputs where expected values are computable by eye.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()


def ts(minute: int, second: int = 0):
    return dt.datetime(2026, 1, 1, 10 + minute // 60, minute % 60, second)


def write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def test_asof_equal_ts_is_inclusive_and_no_prior_is_null(spark, tmp_path):
    rows = [
        # user 1: view BEFORE any purchase (no match), purchase, view after
        (1, ts(0), 1, "view", 1.0, "{}"),
        (2, ts(5), 1, "purchase", 1.0, "{}"),
        (3, ts(10), 1, "view", 1.0, "{}"),   # gap 300s to purchase@5
        # user 2: click at the EXACT instant of a purchase -> matches, gap 0
        (4, ts(20), 2, "purchase", 1.0, "{}"),
        (5, ts(20), 2, "click", 1.0, "{}"),
    ]
    write_events(spark, tmp_path, rows)
    fn, _ = REGISTRY["asof_join_last_purchase"]
    out = {
        r["event_type"]: r
        for r in fn(spark, str(tmp_path)).collect()
    }
    # purchase rows self-match at gap 0 (>= semantics)
    assert out["purchase"]["n_matched"] == 2
    assert out["purchase"]["sum_gap_s"] == 0
    # view@0 has no prior purchase; view@10 matches purchase@5 -> 300s
    assert out["view"]["n_events"] == 2
    assert out["view"]["n_matched"] == 1
    assert out["view"]["sum_gap_s"] == 300
    assert out["view"]["avg_gap_s"] == 300.0
    # click at equal ts matches with gap 0
    assert out["click"]["n_matched"] == 1
    assert out["click"]["sum_gap_s"] == 0


def test_funnel_requires_strict_time_order(spark, tmp_path):
    rows = [
        # user 1: proper view -> click -> purchase
        (1, ts(0), 1, "view", 1.0, "{}"),
        (2, ts(1), 1, "click", 1.0, "{}"),
        (3, ts(2), 1, "purchase", 1.0, "{}"),
        # user 2: click BEFORE first view -> does not advance
        (4, ts(0), 2, "click", 1.0, "{}"),
        (5, ts(1), 2, "view", 1.0, "{}"),
        (6, ts(2), 2, "purchase", 1.0, "{}"),
        # user 3: view then purchase, never clicks
        (7, ts(0), 3, "view", 1.0, "{}"),
        (8, ts(1), 3, "purchase", 1.0, "{}"),
    ]
    write_events(spark, tmp_path, rows)
    fn, _ = REGISTRY["funnel_conversion"]
    row = fn(spark, str(tmp_path)).collect()[0]
    assert row["users_viewed"] == 3
    assert row["users_clicked_after_view"] == 1
    assert row["users_purchased_after_click"] == 1


def test_sample_is_partition_layout_independent(spark, tmp_path):
    rows = [
        (i, ts(i % 60, i % 60), i % 7, "view", float(i), "{}")
        for i in range(500)
    ]
    write_events(spark, tmp_path, rows)
    fn, _ = REGISTRY["deterministic_event_sample"]
    a = sorted(map(tuple, fn(spark, str(tmp_path)).collect()))
    # rewrite the same rows shuffled into a different partition layout
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).repartition(7, "user_id")
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    b = sorted(map(tuple, fn(spark, str(tmp_path)).collect()))
    assert a == b


def test_top_supplier_keeps_all_ties(spark, tmp_path):
    li = spark.createDataFrame(
        [
            # two suppliers with IDENTICAL decimal revenue, one below
            (1, 1, 101, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", ts(0)),
            (2, 1, 102, 1, 1.0, 50.0, 0.0, 0.0, "N", "O", ts(0)),
            (3, 1, 102, 1, 1.0, 50.0, 0.0, 0.0, "N", "O", ts(0)),
            (4, 1, 103, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", ts(0)),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).withColumn(
        "l_shipdate", F.lit("1996-02-01").cast("timestamp")
    )
    li.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    fn, _ = REGISTRY["tpch_q15_top_supplier"]
    out = sorted(r["supplier_no"] for r in fn(spark, str(tmp_path)).collect())
    assert out == [101, 102]
