"""Invariant tests for queries_ext13 (the closing TPC-H shapes). The
oracle harness hash-checks exact values against DuckDB; these pin the
semantic invariants that would survive a fixture regeneration: share
bounds, top-k ordering/cap, and direction symmetry of the Q7 pair
filter."""

from __future__ import annotations

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()
SF = "/root/testdata/sf0.001"


def run(name, spark):
    fn, _ = REGISTRY[name]
    return fn(spark, SF).collect()


def test_q6_single_nonnegative_row(spark):
    rows = run("tpch_q6_forecast_revenue", spark)
    assert len(rows) == 1
    assert rows[0]["revenue"] is None or rows[0]["revenue"] >= 0


def test_q7_only_the_two_nations_in_both_roles(spark):
    # sf0.01: the specific nation pair has no trades at sf0.001
    fn, _ = REGISTRY["tpch_q7_volume_shipping"]
    rows = fn(spark, "/root/testdata/sf0.01").collect()
    assert rows, "pair filter should survive at sf0.01"
    pair = {"NATION_1", "NATION_2"}
    for r in rows:
        assert {r["supp_nation"], r["cust_nation"]} == pair
        assert r["l_year"] in (1996, 1997)
        assert r["revenue"] > 0


def test_q8_share_is_a_proportion(spark):
    rows = run("tpch_q8_market_share", spark)
    assert rows
    for r in rows:
        assert 0.0 <= r["mkt_share"] <= 1.0


def test_q10_capped_sorted_desc_with_custkey_tiebreak(spark):
    rows = run("tpch_q10_returned_items", spark)
    assert 0 < len(rows) <= 20
    keys = [(-r["revenue"], r["c_custkey"]) for r in rows]
    assert keys == sorted(keys)


def test_q14_percent_bounds(spark):
    rows = run("tpch_q14_promo_revenue", spark)
    assert len(rows) == 1
    assert 0.0 <= rows[0]["promo_revenue"] <= 100.0
