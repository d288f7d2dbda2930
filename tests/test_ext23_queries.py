"""Boundary tests for queries_ext23: CUBE set membership, share-sum
closure, and planted-orphan detection."""

from __future__ import annotations

import datetime as dt

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()

ORDER_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)
T0 = dt.datetime(2026, 1, 1)


def test_cube_emits_all_four_granularities(spark, tmp_path):
    rows = [
        (1, 1, "O", 10.0, T0, "1-URGENT"),
        (2, 1, "F", 20.0, T0, "2-HIGH"),
    ]
    spark.createDataFrame(rows, ORDER_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    fn, _ = REGISTRY["cube_order_status_priority"]
    rows_out = fn(spark, str(tmp_path)).collect()
    gids = sorted({r["gid"] for r in rows_out})
    assert gids == [0, 1, 2, 3]  # detail, by-status, by-priority, total
    total = [r for r in rows_out if r["gid"] == 3][0]
    assert total["n_orders"] == 2
    # detail rows: exactly the two (status, priority) pairs
    detail = {(r["orderstatus"], r["orderpriority"]) for r in rows_out if r["gid"] == 0}
    assert detail == {("O", "1-URGENT"), ("F", "2-HIGH")}


def test_region_shares_sum_to_one(spark):
    fn, _ = REGISTRY["nation_revenue_region_share"]
    rows = fn(spark, "/root/testdata/sf0.001").collect()
    by_region = {}
    for r in rows:
        by_region.setdefault(r["r_name"], []).append(r["region_share"])
    for region, shares in by_region.items():
        assert abs(sum(shares) - 1.0) < 1e-4, (region, sum(shares))


def test_orphan_detection_with_planted_violations(spark, tmp_path):
    # customer 99 references nation 7 which does not exist; order 5
    # references customer 42 which does not exist; lineitems all valid.
    spark.createDataFrame(
        [(1, 10.0)], "l_orderkey long, l_extendedprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(1, 1, "O", 10.0, T0, "2-HIGH"), (5, 42, "O", 5.0, T0, "2-HIGH")],
        ORDER_SCHEMA,
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(1, "c", 0, 0.0, "A"), (99, "bad", 7, 0.0, "A")],
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double, "
        "c_mktsegment string",
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [(0, "NATION_0", 0)],
        "n_nationkey long, n_name string, n_regionkey long",
    ).write.mode("overwrite").parquet(str(tmp_path / "nation.parquet"))
    fn, _ = REGISTRY["referential_integrity_audit"]
    row = fn(spark, str(tmp_path)).collect()[0]
    assert row["lineitem_orphans"] == 0
    assert row["order_orphans"] == 1
    assert row["customer_orphans"] == 1
