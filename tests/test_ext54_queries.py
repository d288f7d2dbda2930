"""Round-54 extension: SCD2 dimension build + point-in-time join."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()
SF = "/root/testdata/sf0.001"


def _write_events(spark, rows):
    ev = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string, value double"
    ).select(
        "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
        F.lit("{}").alias("props"),
    )
    d = tempfile.mkdtemp()
    ev.write.mode("overwrite").parquet(d + "/events.parquet")
    return d


def test_scd2_registry_shape(spark):
    fn, _ = REGISTRY["scd2_state_point_in_time"]
    rows = fn(spark, SF).collect()
    states = {r.state for r in rows}
    assert "purchase" not in states  # facts never appear as a state
    for r in rows:
        assert r.n_purchases >= r.n_buyers >= 1


def test_scd2_point_in_time_semantics(spark):
    """Planted history for one user:
      t1 view, t2 view (duplicate -> SAME version), t4 click, t6 error
    purchases at t0 (before any state -> UNKNOWN), t3 (inside the view
    version even though a LATER state exists), t5 (click version), and
    t7 (error version, which is OPEN — null valid_to)."""
    rows = [
        (1, "2024-01-01T00:01:00", 7, "view", 0.0),
        (2, "2024-01-01T00:02:00", 7, "view", 0.0),
        (3, "2024-01-01T00:04:00", 7, "click", 0.0),
        (4, "2024-01-01T00:06:00", 7, "error", 0.0),
        (10, "2024-01-01T00:00:30", 7, "purchase", 1.25),  # before all
        (11, "2024-01-01T00:03:00", 7, "purchase", 2.50),  # view era
        (12, "2024-01-01T00:05:00", 7, "purchase", 4.00),  # click era
        (13, "2024-01-01T00:07:00", 7, "purchase", 8.00),  # open error era
    ]
    d = _write_events(spark, rows)
    fn, _ = REGISTRY["scd2_state_point_in_time"]
    out = {r.state: r for r in fn(spark, d).collect()}
    assert set(out) == {"UNKNOWN", "view", "click", "error"}
    assert out["UNKNOWN"].n_purchases == 1 and out["UNKNOWN"].value_sum == 1.25
    assert out["view"].n_purchases == 1 and out["view"].value_sum == 2.50
    assert out["click"].n_purchases == 1 and out["click"].value_sum == 4.00
    assert out["error"].n_purchases == 1 and out["error"].value_sum == 8.00


def test_scd2_boundary_belongs_to_new_version(spark):
    """A purchase EXACTLY at a version's valid_from belongs to the new
    version (ts >= valid_from AND ts < old valid_to)."""
    rows = [
        (1, "2024-01-01T00:01:00", 3, "view", 0.0),
        (2, "2024-01-01T00:02:00", 3, "click", 0.0),
        (10, "2024-01-01T00:02:00", 3, "purchase", 5.0),  # == click start
    ]
    d = _write_events(spark, rows)
    fn, _ = REGISTRY["scd2_state_point_in_time"]
    out = {r.state: r for r in fn(spark, d).collect()}
    assert out["click"].n_purchases == 1
    assert "view" not in out
