"""Planted-fixture tests for ext94: ABC classification and the dow/hour
heatmap."""

from __future__ import annotations

import datetime as dt

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all


def test_abc_planted_pareto(spark, tmp_path):
    """Revenues 800/100/60/40 (total 1000): cum shares 80/90/96/100% ->
    classes A, B, C, C (A iff cum <= 80%, B iff cum <= 95% — part 3's
    96% crosses the B boundary)."""
    d = dt.date(2026, 1, 1)
    rows = []
    for k, dollars in ((1, 800), (2, 100), (3, 60), (4, 40)):
        rows.append(
            (k, k, 1, 1, 1.0, float(dollars), 0.0, 0.0, "N", "O", d)
        )
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate date",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    reg = load_all()
    got = {
        r.abc: (r.n_parts, r.revenue_cents, r.share_micro)
        for r in reg["part_abc_classification"][0](
            spark, str(tmp_path)
        ).collect()
    }
    assert got["A"] == (1, 80000, 800000)
    assert got["B"] == (1, 10000, 100000)
    assert got["C"] == (2, 10000, 100000)


def test_dow_hour_grid(spark, tmp_path):
    """2026-01-04 is a Sunday (dow 1 in the Spark convention)."""
    sunday = dt.datetime(2026, 1, 4, 9, 30)
    monday = dt.datetime(2026, 1, 5, 23, 5)
    rows = [
        (1, sunday, 1, "view", 1.25, "{}"),
        (2, sunday, 2, "click", 2.50, "{}"),
        (3, monday, 1, "view", 0.75, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    reg = load_all()
    got = {
        (r.dow, r.hour): (r.n_events, r.value_cents)
        for r in reg["dow_hour_activity"][0](spark, str(tmp_path)).collect()
    }
    assert got[(1, 9)] == (2, 375)
    assert got[(2, 23)] == (1, 75)
    assert len(got) == 2
