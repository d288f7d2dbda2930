"""Streaming Holt-Winters twin == batch seasonal fold, bit for bit, on
the same closed hourly series — plus the replay guard."""

from __future__ import annotations

import datetime as dt
import os
import time

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all
from shortvideohybridanalyticslakehouse_spark.streaming.stateful import (
    holt_winters_incremental,
)


def _events_fixture(spark, tmp_path):
    t0 = dt.datetime(2026, 7, 1, 0, 0, 0)
    rows = []
    eid = 0
    # 30 hours each: crosses a day boundary so seasonal slots repeat
    series = {
        "click": [1 + (h % 24) // 6 for h in range(30)],
        "view": [5 if (h % 24) < 12 else 2 for h in range(30)],
    }
    for etype, xs in series.items():
        for hour, n in enumerate(xs):
            for _ in range(n):
                eid += 1
                rows.append(
                    (eid, t0 + dt.timedelta(hours=hour, minutes=3), 1,
                     etype, 1.0, "{}")
                )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return series, t0


def test_stream_holt_winters_equals_batch(spark, tmp_path):
    series, t0 = _events_fixture(spark, tmp_path)
    reg = load_all()
    batch = {
        r.event_type: r.asDict()
        for r in reg["event_type_holt_winters"][0](
            spark, str(tmp_path)
        ).collect()
    }

    # same hourly counts as 3 arrival files (10 hours each), mtime-pinned;
    # the last file REPLAYS hour 7 (must be dropped by the HWM guard)
    src = os.path.join(str(tmp_path), "in")
    os.makedirs(src)
    t_base = time.time() - 600
    epoch0 = int(t0.timestamp())
    chunks = [[], [], []]
    for etype, xs in series.items():
        for hour, x in enumerate(xs):
            chunks[hour // 10].append((etype, epoch0 + hour * 3600, x))
    chunks[2].append(("click", epoch0 + 7 * 3600, 999))  # replay, dropped
    for i, ch in enumerate(chunks):
        p = os.path.join(src, f"p{i:02d}.csv")
        with open(p, "w") as f:
            for etype, he, x in ch:
                f.write(f"{etype},{he},{x}\n")
        os.utime(p, (t_base + i, t_base + i))

    stream = (
        spark.readStream.schema("event_type string, hour_epoch long, x long")
        .option("maxFilesPerTrigger", 1)
        .csv(src)
    )
    q = (
        holt_winters_incremental(stream)
        .writeStream.format("memory")
        .queryName("hw_twin")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # Update-mode sink holds every per-key update; the FINAL row per key
    # is the one with the most hours absorbed (n_hours is monotone per
    # key), NOT the last row in sink order — monotonically_increasing_id
    # is partition-prefixed, not insertion-ordered (ADVICE r8).
    final = {}
    for r in spark.sql("SELECT * FROM hw_twin").collect():
        d = r.asDict()
        if (
            r.event_type not in final
            or d["n_hours"] > final[r.event_type]["n_hours"]
        ):
            final[r.event_type] = d
    for etype in series:
        b, s = batch[etype], final[etype]
        assert s == b, (etype, s, b)
