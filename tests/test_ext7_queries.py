"""Boundary tests for queries_ext7: LOCF null-until-first-observation and
ntile total-order tie handling.
"""

from __future__ import annotations

import datetime as dt

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()


def test_locf_is_null_before_first_purchase_and_carries_after(spark, tmp_path):
    d = dt.datetime
    rows = [
        (1, d(2024, 1, 1, 0), 1, "view", 9.0, "{}"),      # before: no carry
        (2, d(2024, 1, 1, 1), 1, "purchase", 5.0, "{}"),  # sets carried=5
        (3, d(2024, 1, 1, 2), 1, "view", 9.0, "{}"),      # carries 5
        (4, d(2024, 1, 1, 3), 1, "purchase", 7.0, "{}"),  # resets to 7
        (5, d(2024, 1, 1, 4), 1, "click", 9.0, "{}"),     # carries 7
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    fn, _ = REGISTRY["locf_purchase_value_fill"]
    out = {
        r["event_type"]: (r["n_events"], r["n_filled"], r["sum_carried"])
        for r in fn(spark, str(tmp_path)).collect()
    }
    # view@0 has nothing to carry; view@2 carries 5
    assert out["view"] == (2, 1, 5.0)
    # purchases see their own value (ROWS frame includes current row)
    assert out["purchase"] == (2, 2, 12.0)
    assert out["click"] == (1, 1, 7.0)


def test_spend_quartiles_cover_and_partition_customers(spark, tmp_path):
    # 8 customers, one segment, distinct spends 1..8 -> quartiles of 2 each
    cust = [(i, f"c{i}", 0, 0.0, "SEG") for i in range(1, 9)]
    orders = [
        (100 + i, i, "O", float(i * 10), dt.datetime(1996, 1, 1), "3-MEDIUM")
        for i in range(1, 9)
    ]
    spark.createDataFrame(
        cust,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    fn, _ = REGISTRY["customer_spend_quartiles"]
    rows = {r["quartile"]: r for r in fn(spark, str(tmp_path)).collect()}
    assert sorted(rows) == [1, 2, 3, 4]
    assert all(rows[q]["n_cust"] == 2 for q in rows)
    # quartile 1 holds the two smallest spends (10 + 20)
    assert rows[1]["quartile_spend"] == 30.0
    assert rows[4]["quartile_spend"] == 150.0
    # cume_dist of the global max is exactly 1
    assert rows[4]["max_cd"] == 1.0
