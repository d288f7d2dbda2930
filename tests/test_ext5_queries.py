"""Boundary tests for queries_ext5: Q13 zero-order bucket survival, Q22
cross-multiplied threshold exactness + recency scoping, and cohort-week
assignment edges.

The oracle harness (tools/check_oracle.py) checks these against DuckDB at
fixture scale; these tests pin the SEMANTIC edges on tiny hand-built
inputs where expected values are computable by eye.
"""

from __future__ import annotations

import datetime as dt

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()

CUST_SCHEMA = (
    "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
    "c_mktsegment string"
)
ORDERS_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(tmp_path / f"{name}.parquet")
    )


def test_q13_zero_order_customers_survive_outer_join(spark, tmp_path):
    write(
        spark, tmp_path, "customer",
        [
            (1, "a", 0, 0.0, "X"),   # two non-urgent orders
            (2, "b", 0, 0.0, "X"),   # only an urgent order -> bucket 0
            (3, "c", 0, 0.0, "X"),   # no orders at all -> bucket 0
        ],
        CUST_SCHEMA,
    )
    d = dt.datetime(1996, 1, 1)
    write(
        spark, tmp_path, "orders",
        [
            (10, 1, "O", 1.0, d, "3-MEDIUM"),
            (11, 1, "O", 1.0, d, "3-MEDIUM"),
            (12, 2, "O", 1.0, d, "1-URGENT"),
        ],
        ORDERS_SCHEMA,
    )
    fn, _ = REGISTRY["tpch_q13_customer_distribution"]
    out = {r["c_count"]: r["custdist"] for r in fn(spark, str(tmp_path)).collect()}
    assert out == {2: 1, 0: 2}


def test_q22_threshold_is_strict_and_recency_scoped(spark, tmp_path):
    # positive balances: 10, 20, 30 -> avg exactly 20; negative excluded
    # from the average but still candidate rows (all fail the > avg test).
    write(
        spark, tmp_path, "customer",
        [
            (1, "a", 0, 10.0, "X"),
            (2, "b", 0, 20.0, "X"),   # == avg -> excluded (strict >)
            (3, "c", 0, 30.0, "X"),   # > avg, no recent order -> kept
            (4, "d", 0, 30.0, "Y"),   # > avg but ordered in 2001 -> dropped
            (5, "e", 0, -5.0, "X"),
        ],
        CUST_SCHEMA,
    )
    write(
        spark, tmp_path, "orders",
        [
            (10, 3, "O", 1.0, dt.datetime(1999, 6, 1), "3-MEDIUM"),  # old: ok
            (11, 4, "O", 1.0, dt.datetime(2001, 6, 1), "3-MEDIUM"),  # recent
        ],
        ORDERS_SCHEMA,
    )
    fn, _ = REGISTRY["tpch_q22_idle_rich_customers"]
    rows = fn(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0]["c_mktsegment"] == "X"
    assert rows[0]["numcust"] == 1
    assert rows[0]["totacctbal"] == 30.0


def test_cohort_weeks_are_monday_anchored_offsets(spark, tmp_path):
    # 2026-01-05 is a Monday. User 1 first seen Wed wk0, returns Mon wk1
    # and twice in wk3 (distinct -> counted once). User 2 first seen wk1.
    rows = [
        (1, dt.datetime(2026, 1, 7, 12), 1, "view", 1.0, "{}"),
        (2, dt.datetime(2026, 1, 12, 0), 1, "view", 1.0, "{}"),
        (3, dt.datetime(2026, 1, 26, 1), 1, "view", 1.0, "{}"),
        (4, dt.datetime(2026, 1, 26, 2), 1, "click", 1.0, "{}"),
        (5, dt.datetime(2026, 1, 14, 9), 2, "view", 1.0, "{}"),
    ]
    write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    fn, _ = REGISTRY["weekly_cohort_retention"]
    out = {
        (r["cohort_week"].isoformat(), r["week_offset"]): r["active_users"]
        for r in fn(spark, str(tmp_path)).collect()
    }
    assert out == {
        ("2026-01-05T00:00:00", 0): 1,
        ("2026-01-05T00:00:00", 1): 1,
        ("2026-01-05T00:00:00", 3): 1,
        ("2026-01-12T00:00:00", 0): 1,
    }
