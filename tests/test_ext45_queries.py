"""Anomaly detection: CUSUM change-point + trailing z-score outliers."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()
SF = "/root/testdata/sf0.001"


def _planted_events(spark, counts, etype="view"):
    """One event row per planted count unit: minute i gets counts[i] rows."""
    rows = []
    eid = 0
    for i, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, f"2024-01-01T00:{i:02d}:30", 1, etype, 1.0, "{}"))
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts_s string, user_id long, event_type string,"
        " value double, props string",
    ).select(
        "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    d = tempfile.mkdtemp()
    ev.write.mode("overwrite").parquet(d + "/events.parquet")
    return d


def test_cusum_finds_planted_level_shift(spark):
    # 20 minutes at 5 events, then 20 minutes at 15: the |CUSUM| peak sits
    # at the last pre-shift minute (index 19 -> 00:19)
    d = _planted_events(spark, [5] * 20 + [15] * 20)
    fn, _ = REGISTRY["events_cusum_changepoint"]
    rows = fn(spark, d).collect()
    assert len(rows) == 1
    assert rows[0].change_minute == "2024-01-01 00:19:00"
    assert rows[0].n_minutes == 40


def test_zscore_flags_planted_spike_only(spark):
    # flat 10/min with one 50-event spike at minute 35
    counts = [10] * 40
    counts[35] = 50
    d = _planted_events(spark, counts)
    fn, _ = REGISTRY["events_zscore_outlier_minutes"]
    rows = fn(spark, d).collect()
    # zero trailing variance -> any deviation is infinite sigma; only the
    # spike minute deviates
    assert [r.minute for r in rows] == ["2024-01-01 00:35:00"]
    assert rows[0].minute_count == 50


def test_zscore_quiet_series_flags_nothing(spark):
    d = _planted_events(spark, [10] * 30)
    fn, _ = REGISTRY["events_zscore_outlier_minutes"]
    assert fn(spark, d).count() == 0


def test_fixture_scale_runs(spark):
    for name in ("events_cusum_changepoint", "events_zscore_outlier_minutes"):
        fn, _ = REGISTRY[name]
        assert fn(spark, SF).count() >= 0
