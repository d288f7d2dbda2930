"""Planted-fixture tests for ext90: money reconciliation, file profile,
hash experiment assignment."""

from __future__ import annotations

import datetime as dt
import hashlib

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all


def test_reconciliation_hand_computed(spark, tmp_path):
    """Order 1: line of 100.00 at 5% disc, 8% tax -> 10000*95*108/10^4 =
    10260 cents vs header 102.60 -> reconciled. Order 2: header off by
    2.00 -> mismatched with delta 200. Order 3: no lines -> delta = full
    header."""
    d = dt.date(2026, 1, 1)
    li = [
        (1, 1, 1, 1, 1.0, 100.0, 0.05, 0.08, "N", "O", d),
        (2, 1, 1, 1, 1.0, 50.0, 0.00, 0.00, "N", "O", d),
    ]
    spark.createDataFrame(
        li,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate date",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    orders = [
        (1, 1, "O", 102.60, d, "p", 0, "c"),
        (2, 1, "O", 52.00, d, "p", 0, "c"),
        (3, 1, "O", 10.00, d, "p", 0, "c"),
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string, "
        "o_shippriority int, o_comment string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    reg = load_all()
    r = reg["order_totalprice_reconciliation"][0](
        spark, str(tmp_path)
    ).collect()[0]
    assert r.n_orders == 3
    assert r.n_reconciled == 1  # order 1 exact (order 3's 1000 > 100 tol)
    assert r.n_mismatched == 2
    assert r.worst_delta_cents == 1000  # order 3: no lines


def test_file_profile_groups_by_physical_file(spark, tmp_path):
    """Write lineitem as MULTIPLE parquet files: the profile must emit
    one row per physical part-file whose counts sum to the table."""
    d = dt.date(2026, 1, 1)
    rows = [
        (k, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d) for k in range(100)
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate date",
    ).repartition(4).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    reg = load_all()
    out = reg["table_file_row_profile"][0](spark, str(tmp_path)).collect()
    assert len(out) == 4
    assert sum(r.n_rows for r in out) == 100
    assert sum(r.n_orders for r in out) == 100  # orderkeys unique
    assert all(r.file_name.endswith(".parquet") for r in out)
    assert len({r.file_name for r in out}) == 4


def test_hash_assignment_matches_contract(spark, tmp_path):
    """Assignment replays the md5 contract: variant of user u is
    control iff int(md5(str(u))[:15], 16) % 100 < 50."""
    t0 = dt.datetime(2026, 2, 1)
    rows = []
    eid = 0
    for u in range(40):
        eid += 1
        rows.append((eid, t0, u, "view", 1.0, "{}"))
        if u % 4 == 0:
            eid += 1
            rows.append((eid, t0, u, "purchase", 5.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    def variant(u: int) -> str:
        h = int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)
        return "control" if h % 100 < 50 else "treatment"

    want = {"control": [0, 0], "treatment": [0, 0]}
    for u in range(40):
        v = variant(u)
        want[v][0] += 1
        want[v][1] += 1 if u % 4 == 0 else 0

    reg = load_all()
    got = {
        r.variant: (r.n_users, r.n_converted, r.conversion)
        for r in reg["hash_experiment_assignment"][0](
            spark, str(tmp_path)
        ).collect()
    }
    for v, (nu, nc) in want.items():
        assert got[v][0] == nu
        assert got[v][1] == nc
        assert got[v][2] == round(nc / nu, 6)
