"""Closed-form fixtures for the round-31 TPC-H-shaped adaptations
(q2 / q11 / q16 / q20 — the supply-relation family)."""

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
SUP_SCHEMA = "s_suppkey long, s_name string, s_nationkey int, s_acctbal double"
NAT_SCHEMA = "n_nationkey int, n_name string, n_regionkey int"
REG_SCHEMA = "r_regionkey int, r_name string"
PART_SCHEMA = (
    "p_partkey long, p_name string, p_brand string, p_type string, "
    "p_size int, p_retailprice double"
)

D96 = dt.datetime(1996, 6, 1)


def _li(partkey, suppkey, price, qty=1.0, ship=D96, orderkey=1):
    return (orderkey, partkey, suppkey, 1, qty, price, 0.0, 0.0, "N", "O", ship)


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).write.parquet(
        str(tmp_path / f"{name}.parquet")
    )


def test_q2_min_cost_window_and_ties(spark, tmp_path):
    # part 1: suppliers 1 (min cost 50, via two lineitems) and 2 (cost 70)
    # part 2: suppliers 2 and 3 TIE at 60 -> both survive the window filter
    # part 3: out of scope (p_size > 25)
    _write(
        spark,
        tmp_path,
        "lineitem",
        [
            _li(1, 1, 90.0),
            _li(1, 1, 50.0),
            _li(1, 2, 70.0),
            _li(2, 2, 60.0),
            _li(2, 3, 60.0),
            _li(3, 1, 10.0),
        ],
        LI_SCHEMA,
    )
    _write(
        spark,
        tmp_path,
        "part",
        [
            (1, "p1", "Brand#9", "LARGE", 10, 1.0),
            (2, "p2", "Brand#9", "LARGE", 20, 1.0),
            (3, "p3", "Brand#9", "LARGE", 40, 1.0),
        ],
        PART_SCHEMA,
    )
    _write(
        spark,
        tmp_path,
        "supplier",
        [(1, "S1", 0, 300.0), (2, "S2", 0, 200.0), (3, "S3", 0, 100.0)],
        SUP_SCHEMA,
    )
    _write(spark, tmp_path, "nation", [(0, "NATION_0", 0)], NAT_SCHEMA)
    _write(spark, tmp_path, "region", [(0, "EUROPE")], REG_SCHEMA)
    fn, _ = REGISTRY["tpch_q2_min_cost_supplier"]
    rows = fn(spark, str(tmp_path)).collect()
    got = [(r.s_name, r.p_partkey, r.supplycost) for r in rows]
    # acctbal DESC ordering: S1 (300) first, then the part-2 tie pair
    assert got == [("S1", 1, 50.0), ("S2", 2, 60.0), ("S3", 2, 60.0)]


def test_q11_fraction_threshold(spark, tmp_path):
    # NATION_3 supplier ships part 1 for 900 and part 2 for 100;
    # threshold 0.002 * 1000 = 2 -> both pass; an out-of-nation supplier's
    # 5000-value part 3 must NOT enter value or total.
    _write(
        spark,
        tmp_path,
        "lineitem",
        [_li(1, 1, 900.0), _li(2, 1, 100.0), _li(3, 2, 5000.0)],
        LI_SCHEMA,
    )
    _write(
        spark, tmp_path, "supplier", [(1, "S1", 3, 0.0), (2, "S2", 4, 0.0)], SUP_SCHEMA
    )
    _write(
        spark, tmp_path, "nation", [(3, "NATION_3", 0), (4, "NATION_4", 0)], NAT_SCHEMA
    )
    fn, _ = REGISTRY["tpch_q11_important_stock"]
    got = [(r.p_partkey, r.part_value) for r in fn(spark, str(tmp_path)).collect()]
    assert got == [(1, 900.0), (2, 100.0)]


def test_q16_exclusion_and_distinct(spark, tmp_path):
    # part 1 (size 5, eligible) supplied by suppliers 1, 2, 3; supplier 3
    # has a negative balance -> excluded; duplicate (part, supp) lineitems
    # must not double-count. part 2 is PROMO -> filtered out.
    _write(
        spark,
        tmp_path,
        "lineitem",
        [
            _li(1, 1, 10.0),
            _li(1, 1, 20.0),
            _li(1, 2, 10.0),
            _li(1, 3, 10.0),
            _li(2, 1, 10.0),
        ],
        LI_SCHEMA,
    )
    _write(
        spark,
        tmp_path,
        "part",
        [
            (1, "p1", "Brand#2", "LARGE", 5, 1.0),
            (2, "p2", "Brand#2", "PROMO", 5, 1.0),
        ],
        PART_SCHEMA,
    )
    _write(
        spark,
        tmp_path,
        "supplier",
        [(1, "S1", 0, 10.0), (2, "S2", 0, 10.0), (3, "S3", 0, -5.0)],
        SUP_SCHEMA,
    )
    fn, _ = REGISTRY["tpch_q16_supplier_part_counts"]
    got = [
        (r.p_brand, r.p_type, r.p_size, r.supplier_cnt)
        for r in fn(spark, str(tmp_path)).collect()
    ]
    assert got == [("Brand#2", "LARGE", 5, 2)]


def test_q20_dominance_threshold_and_window(spark, tmp_path):
    # red part 1 total 1996 qty = 100: supplier 1 ships 40 (>30% -> dominant),
    # supplier 2 ships 35 (dominant), supplier 3 ships 25 (not).
    # supplier 4 dominates only a NON-red part -> excluded by the semi chain.
    # supplier 1 also ships OUTSIDE 1996 -> that row must not count.
    rows = [
        _li(1, 1, 1.0, qty=40.0),
        _li(1, 2, 1.0, qty=35.0),
        _li(1, 3, 1.0, qty=25.0),
        _li(2, 4, 1.0, qty=100.0),
        _li(1, 1, 1.0, qty=500.0, ship=dt.datetime(1997, 6, 1)),
    ]
    _write(spark, tmp_path, "lineitem", rows, LI_SCHEMA)
    _write(
        spark,
        tmp_path,
        "part",
        [(1, "red widget", "Brand#2", "LARGE", 5, 1.0),
         (2, "blue bolt", "Brand#2", "LARGE", 5, 1.0)],
        PART_SCHEMA,
    )
    _write(
        spark,
        tmp_path,
        "supplier",
        [(1, "S1", 0, 0.0), (2, "S2", 1, 0.0), (3, "S3", 0, 0.0), (4, "S4", 0, 0.0)],
        SUP_SCHEMA,
    )
    _write(
        spark, tmp_path, "nation", [(0, "NATION_0", 0), (1, "NATION_1", 0)], NAT_SCHEMA
    )
    fn, _ = REGISTRY["tpch_q20_dominant_supplier"]
    got = [(r.s_name, r.nation) for r in fn(spark, str(tmp_path)).collect()]
    assert got == [("S1", "NATION_0"), ("S2", "NATION_1")]
