"""Streaming EWMA twin (streaming/stateful.ewma_incremental): the per-key
recurrence folded across micro-batches must equal the batch fold
(event_type_ewma, queries_ext59) BIT-FOR-BIT on the same closed set, and
replayed minutes must be ignored (exactly-once guard)."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table
from shortvideohybridanalyticslakehouse_spark.streaming.stateful import (
    ewma_incremental,
)

SF_DIR = "/root/testdata/sf0.001"


def _minute_counts(spark):
    ev = load_table(spark, SF_DIR, "events")
    return (
        ev.groupBy(
            "event_type", F.date_trunc("minute", F.col("ts")).alias("minute")
        )
        .agg(F.count(F.lit(1)).alias("x"))
        .select(
            "event_type",
            F.col("minute").cast("long").alias("minute_epoch"),
            F.col("x").cast("long").alias("x"),
        )
    )


def _batch_fold(rows_by_key):
    out = {}
    for k, series in rows_by_key.items():
        ewma = None
        n = total = 0
        for _, x in sorted(series):
            ewma = float(x) if ewma is None else ewma * 0.875 + float(x) * 0.125
            n += 1
            total += x
        out[k] = (n, total, ewma)
    return out


def test_stream_ewma_equals_batch_fold(spark, tmp_path):
    mc = _minute_counts(spark).collect()
    rows_by_key = {}
    for r in mc:
        rows_by_key.setdefault(r.event_type, []).append((r.minute_epoch, r.x))
    want = _batch_fold(rows_by_key)

    # split the minute series into 3 arrival files by minute (time-ordered;
    # mtimes pinned strictly increasing — FileStreamSource orders by mtime)
    ordered = sorted(mc, key=lambda r: (r.minute_epoch, r.event_type))
    src = os.path.join(str(tmp_path), "in")
    os.makedirs(src)
    chunk = (len(ordered) + 2) // 3
    base = time.time() - 3600
    for i in range(0, len(ordered), chunk):
        part = ordered[i : i + chunk]
        fp = os.path.join(src, f"p{i//chunk:04d}.csv")
        with open(fp, "w") as f:
            for r in part:
                f.write(f"{r.event_type},{r.minute_epoch},{r.x}\n")
        os.utime(fp, (base + i, base + i))

    stream = (
        spark.readStream.schema("event_type string, minute_epoch long, x long")
        .option("maxFilesPerTrigger", 1)
        .csv(src)
    )
    out = ewma_incremental(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("ewma_twin")
        .outputMode("update")
        .option(
            "checkpointLocation", os.path.join(str(tmp_path), "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    final = {}
    for r in spark.sql(
        "SELECT * FROM ewma_twin ORDER BY n_minutes"  # later updates overwrite
    ).collect():
        final[r.event_type] = (r.n_minutes, r.total_count, r.ewma_last)
    assert set(final) == set(want)
    for k in want:
        assert final[k] == want[k], k  # ewma compared EXACTLY, not approx


def test_stream_ewma_ignores_replayed_minutes(spark, tmp_path):
    # second file replays the first file's minutes plus one new one —
    # the fold must only advance on the new minute
    src = os.path.join(str(tmp_path), "in")
    os.makedirs(src)
    base = time.time() - 3600
    with open(os.path.join(src, "a.csv"), "w") as f:
        f.write("click,60,4\nclick,120,8\n")
    os.utime(os.path.join(src, "a.csv"), (base, base))
    with open(os.path.join(src, "b.csv"), "w") as f:
        f.write("click,60,4\nclick,120,8\nclick,180,16\n")
    os.utime(os.path.join(src, "b.csv"), (base + 10, base + 10))

    stream = (
        spark.readStream.schema("event_type string, minute_epoch long, x long")
        .option("maxFilesPerTrigger", 1)
        .csv(src)
    )
    q = (
        ewma_incremental(stream)
        .writeStream.format("memory")
        .queryName("ewma_replay")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT * FROM ewma_replay WHERE n_minutes = 3"
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    want = 4.0
    want = want * 0.875 + 8.0 * 0.125
    want = want * 0.875 + 16.0 * 0.125
    assert r.total_count == 28 and r.ewma_last == want
