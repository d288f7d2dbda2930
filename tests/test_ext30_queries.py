"""Closed-form fixtures for the round-30 TPC-H-shaped adaptations."""

from __future__ import annotations

import datetime as dt

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()

LI_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
    "l_quantity double, l_extendedprice double, l_discount double, "
    "l_tax double, l_returnflag string, l_linestatus string, "
    "l_shipdate timestamp"
)
ORD_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)
SUP_SCHEMA = "s_suppkey long, s_name string, s_nationkey int, s_acctbal double"
NAT_SCHEMA = "n_nationkey int, n_name string, n_regionkey int"
PART_SCHEMA = (
    "p_partkey long, p_name string, p_brand string, p_type string, "
    "p_size int, p_retailprice double"
)

D0 = dt.datetime(2024, 1, 1)


def _li(orderkey, suppkey=1, partkey=1, qty=1.0, price=100.0, disc=0.0, ship=D0):
    return (orderkey, partkey, suppkey, 1, qty, price, disc, 0.0, "N", "O", ship)


def _ord(orderkey, status="F", prio="1-URGENT", date=D0):
    return (orderkey, 1, status, 100.0, date, prio)


def test_q12_late_classification(spark, tmp_path):
    late = D0 + dt.timedelta(days=91)
    on_time = D0 + dt.timedelta(days=90)  # boundary: exactly +90d is on time
    spark.createDataFrame(
        [_li(1, ship=late), _li(2, ship=on_time), _li(3, ship=late)], LI_SCHEMA
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [_ord(1, prio="2-HIGH"), _ord(2, prio="5-LOW"), _ord(3, prio="3-MEDIUM")],
        ORD_SCHEMA,
    ).write.parquet(str(tmp_path / "orders.parquet"))
    fn, _ = REGISTRY["tpch_q12_late_line_priority"]
    got = {r.ship_class: (r.high_line_count, r.low_line_count) for r in fn(
        spark, str(tmp_path)
    ).collect()}
    assert got == {"late": (1, 1), "on_time": (0, 1)}


def test_q19_disjunct_membership(spark, tmp_path):
    spark.createDataFrame(
        [
            (1, "a", "Brand#1", "t", 5, 10.0),   # matches arm 1 w/ qty<=20
            (2, "b", "Brand#2", "t", 20, 10.0),  # matches arm 2 w/ 10<=qty<=40
            (3, "c", "Brand#9", "t", 5, 10.0),   # no arm
        ],
        PART_SCHEMA,
    ).write.parquet(str(tmp_path / "part.parquet"))
    spark.createDataFrame(
        [
            _li(1, partkey=1, qty=10.0, price=100.0),
            _li(1, partkey=1, qty=30.0, price=100.0),  # qty outside arm 1
            _li(1, partkey=2, qty=15.0, price=50.0, disc=0.1),
            _li(1, partkey=3, qty=5.0, price=999.0),  # part not in any arm
        ],
        LI_SCHEMA,
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    fn, _ = REGISTRY["tpch_q19_disjunctive_revenue"]
    (row,) = fn(spark, str(tmp_path)).collect()
    assert row.n_lines == 2
    assert row.revenue == round(100.0 + 50.0 * 0.9, 2)


def test_q21_sole_late_supplier(spark, tmp_path):
    late = D0 + dt.timedelta(days=120)
    ok = D0 + dt.timedelta(days=10)
    rows = [
        # order 1: supplier 1 late, supplier 2 on time -> s1 counted
        _li(1, suppkey=1, ship=late),
        _li(1, suppkey=2, ship=ok),
        # order 2: suppliers 1 AND 2 both late -> nobody counted
        _li(2, suppkey=1, ship=late),
        _li(2, suppkey=2, ship=late),
        # order 3: single-supplier late order -> fails EXISTS, not counted
        _li(3, suppkey=1, ship=late),
        # order 4: open status -> excluded entirely
        _li(4, suppkey=1, ship=late),
        _li(4, suppkey=2, ship=ok),
    ]
    spark.createDataFrame(rows, LI_SCHEMA).write.parquet(
        str(tmp_path / "lineitem.parquet")
    )
    spark.createDataFrame(
        [_ord(1), _ord(2), _ord(3), _ord(4, status="O")], ORD_SCHEMA
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(1, "Supplier#1", 0, 0.0), (2, "Supplier#2", 0, 0.0)], SUP_SCHEMA
    ).write.parquet(str(tmp_path / "supplier.parquet"))
    spark.createDataFrame(
        [(0, "NATION_0", 0)], NAT_SCHEMA
    ).write.parquet(str(tmp_path / "nation.parquet"))
    fn, _ = REGISTRY["tpch_q21_waiting_supplier"]
    got = {(r.s_name, r.numwait) for r in fn(spark, str(tmp_path)).collect()}
    assert got == {("Supplier#1", 1)}


def test_q9_profit_arithmetic(spark, tmp_path):
    spark.createDataFrame(
        [(1, "red widget", "Brand#1", "t", 5, 20.0)], PART_SCHEMA
    ).write.parquet(str(tmp_path / "part.parquet"))
    spark.createDataFrame(
        [_li(1, partkey=1, suppkey=1, qty=10.0, price=100.0, disc=0.1)],
        LI_SCHEMA,
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(1, "Supplier#1", 0, 0.0)], SUP_SCHEMA
    ).write.parquet(str(tmp_path / "supplier.parquet"))
    spark.createDataFrame(
        [(0, "NATION_0", 0)], NAT_SCHEMA
    ).write.parquet(str(tmp_path / "nation.parquet"))
    spark.createDataFrame(
        [_ord(1, date=dt.datetime(2023, 6, 1))], ORD_SCHEMA
    ).write.parquet(str(tmp_path / "orders.parquet"))
    fn, _ = REGISTRY["tpch_q9_nation_profit_proxy"]
    (row,) = fn(spark, str(tmp_path)).collect()
    assert (row.nation, row.o_year) == ("NATION_0", 2023)
    # 100*0.9 revenue - 20*10*0.10 cost proxy = 90 - 20 = 70
    assert row.sum_profit == 70.0
