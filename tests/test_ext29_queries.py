"""Boundary test for event_value_trimmed_stats: closed-form clamping on a
known distribution."""

from __future__ import annotations

import datetime as dt

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_winsorized_and_trimmed_closed_form(spark, tmp_path):
    t0 = dt.datetime(2026, 1, 1)
    # values 1..9 plus an extreme 1000: with the (n-1) interpolation both
    # engines use, p5 = 1 + 0.45*(2-1) = 1.45 and
    # p95 = 9 + 0.55*(1000-9) = 554.05
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 1000.0]
    rows = [(i, t0, 1, "view", v, "{}") for i, v in enumerate(vals)]
    spark.createDataFrame(rows, EVENT_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    fn, _ = REGISTRY["event_value_trimmed_stats"]
    (row,) = fn(spark, str(tmp_path)).collect()
    lo, hi = 1.45, 554.05
    clamped = [min(max(v, lo), hi) for v in vals]
    inside = [v for v in vals if lo <= v <= hi]
    assert row["n"] == 10
    assert row["n_outliers"] == 2  # 1.0 below lo, 1000.0 above hi
    assert row["winsorized_mean"] == round(sum(clamped) / 10, 6)
    assert row["trimmed_mean"] == round(sum(inside) / len(inside), 6)
