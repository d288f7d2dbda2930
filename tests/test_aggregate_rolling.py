"""Tumbling-window aggregation + rolling RANGE-frame tests.

Key boundary: the 30-minute rolling frame is [t-29min, t] INCLUSIVE — a row
exactly 29 minutes earlier is in-frame, 30 minutes earlier is out
(ref: src/trino/rt_video_metrics_serving.sql:21-25).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.operators.aggregate import (
    duplicate_key_groups,
    null_profile,
    tumbling_window_agg,
)
from shortvideohybridanalyticslakehouse_spark.operators.rolling import rolling_range_sums


def ts(minute: int, second: int = 0):
    return dt.datetime(2026, 1, 1, minute // 60, minute % 60, second)


def test_tumbling_window_agg_counts_and_dedup(spark):
    rows = [
        ("e1", ts(0, 10), "v1", "impression", 100),
        ("e2", ts(0, 50), "v1", "impression", 0),
        ("e2", ts(0, 50), "v1", "impression", 0),  # duplicate event_id
        ("e3", ts(0, 59), "v1", "like", 0),
        ("e4", ts(1, 0), "v1", "impression", 0),  # next window
    ]
    df = spark.createDataFrame(
        rows, "event_id string, ts timestamp, video_id string, "
        "event_type string, watch_time_ms long"
    )
    out = tumbling_window_agg(
        df,
        ts_col="ts",
        key_cols=["video_id"],
        count_conditions={
            "impressions": F.col("event_type") == "impression",
            "likes": F.col("event_type") == "like",
        },
        sum_exprs={"watch_time_sum_ms": F.col("watch_time_ms")},
        dedup_col="event_id",
    ).orderBy("window_start")
    rows = out.collect()
    assert len(rows) == 2
    w0, w1 = rows
    assert (w0.impressions, w0.likes, w0.watch_time_sum_ms) == (2, 1, 100)
    assert (w1.impressions, w1.likes) == (1, 0)
    assert (w0.window_end - w0.window_start).total_seconds() == 60


def test_rolling_frame_inclusive_boundary(spark):
    rows = [
        ("v1", ts(0), 10),
        ("v1", ts(29), 5),   # exactly 29 min after first -> same frame
        ("v1", ts(30), 7),   # 30 min after first -> first drops out
        ("v2", ts(0), 100),  # other key, independent partition
    ]
    df = spark.createDataFrame(rows, "video_id string, window_start timestamp, x long")
    out = rolling_range_sums(
        df, ["video_id"], "window_start", ["x"], minutes=30
    )
    got = {
        (r.video_id, r.window_start.minute): r.x_30m for r in out.collect()
    }
    assert got[("v1", 0)] == 10
    assert got[("v1", 29)] == 15  # 10 + 5 (inclusive at -29min)
    assert got[("v1", 30)] == 12  # 5 + 7 (minute 0 dropped)
    assert got[("v2", 0)] == 100


def test_duplicate_key_groups_and_null_profile(spark):
    df = spark.createDataFrame(
        [("a", 1, None), ("a", 1, "x"), ("b", 2, "y")],
        "k string, w int, s string",
    )
    dups = duplicate_key_groups(df, ["k", "w"]).collect()
    assert len(dups) == 1 and dups[0].dup_count == 2
    prof = null_profile(df, ["s", "k"]).first()
    assert prof.row_count == 3 and prof.null_s == 1 and prof.null_k == 0


def test_approx_count_distinct_within_tolerance(spark):
    """A4 scale path: HLL++ sketch distinct must land within its rsd bound
    (exact distinct buffers values; the sketch merges map-side at 100 TB)."""
    from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    row = ev.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx"),
    ).first()
    assert abs(row.approx - row.exact) / row.exact <= 0.05
