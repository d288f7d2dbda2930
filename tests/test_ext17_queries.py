"""Boundary tests for queries_ext17: LATERAL tie-break, percentile
definitions on a known vector, band edges, and streak islands."""

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
CUST_SCHEMA = (
    "c_custkey long, c_name string, c_nationkey long, c_acctbal double, "
    "c_mktsegment string"
)
T0 = dt.datetime(2026, 1, 1, 10, 0, 0)


def ts(m):
    return dt.datetime(2026, 1, 1, 10, m, 0)


def write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(tmp_path / f"{name}.parquet")
    )
    return str(tmp_path)


def test_lateral_top1_price_tie_takes_lower_orderkey(spark, tmp_path):
    write(spark, tmp_path, "customer", [(1, "c1", 0, 0.0, "A")], CUST_SCHEMA)
    sf = write(
        spark,
        tmp_path,
        "orders",
        [
            (10, 1, "O", 500.0, T0, "2-HIGH"),
            (5, 1, "O", 500.0, T0, "2-HIGH"),  # tie -> lower orderkey wins
            (7, 1, "O", 100.0, T0, "2-HIGH"),
        ],
        ORDER_SCHEMA,
    )
    fn, _ = REGISTRY["lateral_top_order_per_customer"]
    rows = fn(spark, sf).collect()
    assert len(rows) == 1
    assert rows[0]["top_orderkey"] == 5
    assert rows[0]["top_price"] == 500.0


def test_percentile_family_definitions(spark, tmp_path):
    # values 10,20,30,40: median=25 (interp), p90_cont=37 (interp at 2.7),
    # p90_disc=40 (first element with cume_dist >= 0.9).
    sf = write(
        spark,
        tmp_path,
        "orders",
        [(i, 1, "O", v, T0, "2-HIGH") for i, v in enumerate([10.0, 20.0, 30.0, 40.0])],
        ORDER_SCHEMA,
    )
    fn, _ = REGISTRY["grouped_price_median_percentiles"]
    row = fn(spark, sf).collect()[0]
    assert row["price_median"] == 25.0
    assert row["price_p90_cont"] == 37.0
    assert row["price_p90_disc"] == 40.0


def test_band_edges_inclusive_lower(spark, tmp_path):
    # 99999.99 -> band 0; 100000.00 -> band 1 (exact boundary).
    sf = write(
        spark,
        tmp_path,
        "orders",
        [
            (1, 1, "O", 99999.99, T0, "2-HIGH"),
            (2, 1, "O", 100000.00, T0, "2-HIGH"),
            (3, 1, "O", 100000.01, T0, "2-HIGH"),
        ],
        ORDER_SCHEMA,
    )
    fn, _ = REGISTRY["order_price_band_rollup"]
    got = {r["price_band"]: r["n_orders"] for r in fn(spark, sf).collect()}
    assert got == {0: 1, 1: 2}


def test_streaks_islands_split_on_interruption(spark, tmp_path):
    # user 1: view,view,click,view -> islands: [vv],[c],[v];
    # longest 2, n_islands 3.
    sf = write(
        spark,
        tmp_path,
        "events",
        [
            (1, ts(0), 1, "view", 0.0, "{}"),
            (2, ts(1), 1, "view", 0.0, "{}"),
            (3, ts(2), 1, "click", 0.0, "{}"),
            (4, ts(3), 1, "view", 0.0, "{}"),
        ],
        EVENT_SCHEMA,
    )
    fn, _ = REGISTRY["longest_event_streak"]
    row = fn(spark, sf).collect()[0]
    assert row["longest_streak"] == 2
    assert row["n_islands"] == 3
