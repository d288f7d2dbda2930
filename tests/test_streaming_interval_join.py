"""Stream-stream interval join: streaming result == batch result over the
same inputs, late-beyond-window purchases excluded, state bounded by the
watermark + interval condition."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from shortvideohybridanalyticslakehouse_spark.streaming import jobs

_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("value", DoubleType()),
    ]
)

_BASE = dt.datetime(2024, 3, 1, 12, 0, 0)


def _clicks():
    return [
        (1, _BASE, 7, 0.0),
        (2, _BASE + dt.timedelta(minutes=30), 7, 0.0),
        (3, _BASE, 8, 0.0),
    ]


def _purchases():
    return [
        # in-window for click 1 (5 min after)
        (101, _BASE + dt.timedelta(minutes=5), 7, 10.0),
        # exactly at the 10-min boundary of click 1 (inclusive)
        (102, _BASE + dt.timedelta(minutes=10), 7, 20.0),
        # 11 min after click 1 -> matches nothing
        (103, _BASE + dt.timedelta(minutes=11), 7, 40.0),
        # before any click by user 8 -> excluded (purchase must be >= click)
        (104, _BASE - dt.timedelta(minutes=1), 8, 80.0),
        # in-window for click 2
        (105, _BASE + dt.timedelta(minutes=35), 7, 160.0),
    ]


def _write_stream_dir(spark, tmp_path, name, rows):
    path = os.path.join(str(tmp_path), name)
    df = spark.createDataFrame(rows, _SCHEMA)
    df.write.mode("overwrite").parquet(path)
    return path


def test_streaming_interval_join_matches_batch(spark, tmp_path):
    clicks_dir = _write_stream_dir(spark, tmp_path, "clicks", _clicks())
    purch_dir = _write_stream_dir(spark, tmp_path, "purchases", _purchases())
    out = os.path.join(str(tmp_path), "out")
    ckpt = os.path.join(str(tmp_path), "ckpt")

    clicks_s = spark.readStream.schema(_SCHEMA).parquet(clicks_dir)
    purch_s = spark.readStream.schema(_SCHEMA).parquet(purch_dir)
    q = jobs.start_attribution_join_job(
        spark, clicks_s, purch_s, out, ckpt, window_minutes=10
    )
    q.awaitTermination(120)

    got = {
        (r["click_id"], r["purchase_id"], r["purchase_value"])
        for r in spark.read.parquet(os.path.join(out, "attributed_pairs")).collect()
    }
    # batch twin on identical inputs
    batch = jobs.interval_attribution_plan(
        spark.createDataFrame(_clicks(), _SCHEMA),
        spark.createDataFrame(_purchases(), _SCHEMA),
        window_minutes=10,
    )
    expected = {
        (r["click_id"], r["purchase_id"], r["purchase_value"])
        for r in batch.collect()
    }
    assert got == expected
    # pinned semantics: boundary inclusive, pre-click and beyond-window out
    assert (1, 102, 20.0) in got
    assert all(p not in {103, 104} for _, p, _ in got)
    assert (2, 105, 160.0) in got


def test_interval_join_state_cleanup_condition_in_plan(spark, tmp_path):
    # The watermark + two-sided time bounds are what let Spark evict join
    # state; assert the streaming plan actually carries the range condition.
    clicks_dir = _write_stream_dir(spark, tmp_path, "clicks2", _clicks())
    purch_dir = _write_stream_dir(spark, tmp_path, "purch2", _purchases())
    clicks_s = spark.readStream.schema(_SCHEMA).parquet(clicks_dir)
    purch_s = spark.readStream.schema(_SCHEMA).parquet(purch_dir)
    joined = jobs.interval_attribution_plan(
        clicks_s, purch_s, window_minutes=10, watermark="2 minutes"
    )
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan


def test_streaming_left_outer_emits_unconverted_after_watermark(spark, tmp_path):
    """LEFT OUTER arm: a click with no purchase in its window must emit a
    null-extended row — but only once the watermark has provably passed
    click_ts + window. Run 1 processes the base data (watermark still
    behind — no null rows may appear for fresh clicks); run 2 feeds
    far-future rows through the SAME checkpoint, advancing the watermark
    and flushing the evicted state."""
    clicks_dir = os.path.join(str(tmp_path), "clicks3")
    purch_dir = os.path.join(str(tmp_path), "purch3")
    out = os.path.join(str(tmp_path), "out3")
    ckpt = os.path.join(str(tmp_path), "ckpt3")
    os.makedirs(clicks_dir)
    os.makedirs(purch_dir)

    import glob as _glob
    import shutil as _shutil

    def add_batch(target_dir, rows, tag):
        # file stream sources don't recurse: land part files FLAT in the dir
        staging = os.path.join(str(tmp_path), f"_stage_{tag}_{os.path.basename(target_dir)}")
        spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.parquet(staging)
        for i, part in enumerate(
            sorted(_glob.glob(os.path.join(staging, "part-*.parquet")))
        ):
            _shutil.move(part, os.path.join(target_dir, f"{tag}-{i}.parquet"))
        _shutil.rmtree(staging)

    # base batch: user 9 clicks, never purchases; user 7 clicks + converts
    add_batch(clicks_dir, [(1, _BASE, 7, 0.0), (4, _BASE, 9, 0.0)], "b0")
    add_batch(purch_dir, [(101, _BASE + dt.timedelta(minutes=5), 7, 10.0)], "b0")

    def run():
        clicks_s = spark.readStream.schema(_SCHEMA).parquet(clicks_dir)
        purch_s = spark.readStream.schema(_SCHEMA).parquet(purch_dir)
        joined = jobs.interval_attribution_plan(
            clicks_s,
            purch_s,
            window_minutes=10,
            watermark="2 minutes",
            how="left_outer",
        )
        q = (
            joined.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    # far-future batch on BOTH sides pushes the watermark past every base
    # click's window in the next run
    late = _BASE + dt.timedelta(hours=2)
    add_batch(clicks_dir, [(5, late, 7, 0.0)], "b1")
    add_batch(purch_dir, [(199, late, 8, 1.0)], "b1")
    run()

    rows = spark.read.parquet(out).collect()
    nulls = {(r.click_id, r.purchase_id) for r in rows if r.purchase_id is None}
    inner = {(r.click_id, r.purchase_id) for r in rows if r.purchase_id is not None}
    assert (4, None) in nulls, "unconverted click never flushed"
    assert (1, 101) in inner
    # the converted click must NOT also emit a null row
    assert (1, None) not in nulls
