"""Streaming Misra-Gries twin == batch per-day fold, slot for slot, on
the same closed event set — plus the replay guard."""

from __future__ import annotations

import datetime as dt
import os
import time

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all
from shortvideohybridanalyticslakehouse_spark.streaming.stateful import (
    misra_gries_incremental,
)


def test_stream_mg_equals_batch(spark, tmp_path):
    # two days; day 1 has a planted heavy hitter (user 7)
    t0 = dt.datetime(2026, 7, 10, 0, 0, 0)
    rows = []
    eid = 0
    for i in range(40):
        eid += 1
        uid = 7 if i % 2 == 0 else 100 + i
        rows.append((eid, t0 + dt.timedelta(seconds=i), uid))
    for i in range(30):
        eid += 1
        rows.append((eid, t0 + dt.timedelta(days=1, seconds=i), 200 + i % 6))
    # batch twin input: a real events parquet
    spark.createDataFrame(
        [(e, ts, u, "view", 1.0, "{}") for e, ts, u in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, payload string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    reg = load_all()
    batch = {
        r.day: r.asDict()
        for r in reg["misra_gries_daily_users"][0](
            spark, str(tmp_path)
        ).collect()
    }

    # stream the SAME events as 3 mtime-pinned files in event_id order;
    # the last file REPLAYS an early event (must be dropped)
    src = os.path.join(str(tmp_path), "in")
    os.makedirs(src)
    t_base = time.time() - 600
    chunks = [rows[:25], rows[25:50], rows[50:]]
    chunks[2] = chunks[2] + [rows[3]]  # replay, at/below HWM: dropped
    for i, ch in enumerate(chunks):
        p = os.path.join(src, f"p{i:02d}.csv")
        with open(p, "w") as f:
            for e, ts, u in ch:
                f.write(f"{ts.strftime('%Y-%m-%d')},{e},{u}\n")
        os.utime(p, (t_base + i, t_base + i))

    stream = (
        spark.readStream.schema("day string, event_id long, uid long")
        .option("maxFilesPerTrigger", 1)
        .csv(src)
    )
    q = (
        misra_gries_incremental(stream)
        .writeStream.format("memory")
        .queryName("mg_twin")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    final = {
        r.day: r.asDict()
        for r in spark.sql("SELECT * FROM mg_twin")
        .withColumn("_rn", F.monotonically_increasing_id())
        .orderBy("_rn")
        .drop("_rn")
        .collect()
    }
    assert set(final) == set(batch)
    for day in batch:
        assert final[day] == batch[day], (day, final[day], batch[day])
    # the planted heavy hitter survived the stream with a positive count
    d1 = final[rows[0][1].strftime("%Y-%m-%d")]
    items = {d1[f"item_{j}"]: d1[f"cnt_{j}"] for j in range(4)}
    assert items.get(7, 0) > 0
