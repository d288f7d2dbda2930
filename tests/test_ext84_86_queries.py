"""Planted-fixture tests for round-6 batch 2: max drawdown (ext84),
PMI collocations (ext85), time-decay attribution (ext86)."""

from __future__ import annotations

import datetime as dt
import math

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all


def test_drawdown_planted_ledger(spark, tmp_path):
    """Part 1: flows +10, -4, -9, +8, -7 -> balances 10,6,-3,5,-2;
    running max 10 -> drawdowns 0,4,13,5,12 -> max 13 on day 3.
    Part 2: monotonic inflows -> drawdown 0."""
    d0 = dt.date(2026, 5, 1)
    rows = []

    def li(partkey, day_off, qty, flag, ln):
        rows.append(
            (1000 + len(rows), partkey, 1, ln, float(qty), 1.0, 0.0, 0.0,
             flag, "O", d0 + dt.timedelta(days=day_off))
        )

    li(1, 0, 10, "R", 1)
    li(1, 1, 4, "N", 2)
    li(1, 2, 9, "A", 3)
    li(1, 3, 8, "R", 4)
    li(1, 4, 7, "N", 5)
    li(2, 0, 5, "R", 6)
    li(2, 1, 6, "R", 7)
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate date",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    reg = load_all()
    got = {
        r.l_partkey: (r.max_drawdown, str(r.trough_day))
        for r in reg["part_flow_max_drawdown"][0](
            spark, str(tmp_path)
        ).collect()
    }
    assert got[1] == (13.0, "2026-05-03")
    assert got[2] == (0.0, "2026-05-01")


def test_pmi_planted_counts(spark, tmp_path):
    """aa+bb co-occur in 6 of 10 docs, aa in 8, bb in 6; cc tags along in
    5 docs with aa -> PMI(aa,bb) = ln(6*10/48), PMI(aa,cc) = ln(5*10/40)."""
    docs = []
    for i in range(10):
        words = []
        if i < 8:
            words.append("aa")
        if i < 6:
            words.append("bb")
        if i < 5:
            words.append("cc")
        words.append(f"filler{i}")
        docs.append((i, "s", " ".join(words)))
    spark.createDataFrame(
        docs, "doc_id long, source string, text string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    reg = load_all()
    got = {
        (r.term_a, r.term_b): (r.c_ab, r.c_a, r.c_b, r.pmi)
        for r in reg["term_pmi_top_pairs"][0](spark, str(tmp_path)).collect()
    }
    assert got[("aa", "bb")] == (6, 8, 6, round(math.log(60 / 48), 6))
    assert got[("aa", "cc")] == (5, 8, 5, round(math.log(50 / 40), 6))
    assert got[("bb", "cc")] == (5, 6, 5, round(math.log(50 / 30), 6))
    # filler terms never reach MIN_CO
    assert all(not a.startswith("filler") for a, _ in got)


def test_time_decay_credit_conservation_and_split(spark, tmp_path):
    """One purchase with clicks 30 min / 5 h / 80 h before: the 80 h
    click is outside the window; weights 1e6/1 and 1e6/6 -> credits
    857142+remainder / 142857 with the remainder on the most recent."""
    t0 = dt.datetime(2026, 6, 1, 12, 0, 0)
    rows = [
        (1, t0, 7, "purchase", 50.0, "{}"),
        (2, t0 - dt.timedelta(minutes=30), 7, "click", 0.0, "{}"),
        (3, t0 - dt.timedelta(hours=5), 7, "click", 0.0, "{}"),
        (4, t0 - dt.timedelta(hours=80), 7, "click", 0.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    reg = load_all()
    out = {
        r.click_day: (r.n_credited_touches, r.micro_credit)
        for r in reg["time_decay_attribution"][0](
            spark, str(tmp_path)
        ).collect()
    }
    # weights: w1 = 1e6 (0 whole hours), w2 = 1e6 // 6 = 166666
    w1, w2 = 1_000_000, 1_000_000 // 6
    tw = w1 + w2
    base1 = 1_000_000 * w1 // tw
    base2 = 1_000_000 * w2 // tw
    rem = 1_000_000 - base1 - base2
    assert out["2026-06-01"] == (2, base1 + rem + base2)
    assert sum(c for _, c in out.values()) == 1_000_000
    assert "2026-05-29" not in out  # 80h click excluded