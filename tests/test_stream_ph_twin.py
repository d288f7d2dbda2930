"""Streaming Page-Hinkley twin == batch drift fold, bit for bit, on the
same closed daily series — the alarm latches mid-stream and survives
later batches; replays are dropped."""

from __future__ import annotations

import datetime as dt
import os
import time

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all
from shortvideohybridanalyticslakehouse_spark.streaming.stateful import (
    page_hinkley_incremental,
)


def test_stream_ph_equals_batch(spark, tmp_path):
    # drifting series (shift at day 11) and a stable one
    series = {"click": [5] * 10 + [50] * 10, "view": [7] * 20}
    t0 = dt.datetime(2026, 9, 1, 12, 0, 0)
    rows = []
    eid = 0
    for etype, counts in series.items():
        for day, c in enumerate(counts):
            for k in range(c):
                eid += 1
                rows.append(
                    (eid, t0 + dt.timedelta(days=day, seconds=k), 1,
                     etype, 1.0, "{}")
                )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, payload string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    reg = load_all()
    batch = {
        r.event_type: r.asDict()
        for r in reg["page_hinkley_daily_drift"][0](
            spark, str(tmp_path)
        ).collect()
    }

    # same daily counts as 4 arrival files (5 days each), mtime-pinned;
    # the last file REPLAYS day 3 with a bogus count (must be dropped)
    src = os.path.join(str(tmp_path), "in")
    os.makedirs(src)
    t_base = time.time() - 600
    epoch0 = int(t0.timestamp()) // 86400
    chunks = [[], [], [], []]
    for etype, counts in series.items():
        for day, c in enumerate(counts):
            chunks[day // 5].append((etype, epoch0 + day, c))
    chunks[3].append(("click", epoch0 + 3, 9999))  # replay, dropped
    for i, ch in enumerate(chunks):
        p = os.path.join(src, f"p{i:02d}.csv")
        with open(p, "w") as f:
            for etype, de, x in ch:
                f.write(f"{etype},{de},{x}\n")
        os.utime(p, (t_base + i, t_base + i))

    stream = (
        spark.readStream.schema("event_type string, day_epoch long, x long")
        .option("maxFilesPerTrigger", 1)
        .csv(src)
    )
    q = (
        page_hinkley_incremental(stream)
        .writeStream.format("memory")
        .queryName("ph_twin")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    hist = spark.sql("SELECT * FROM ph_twin").collect()
    # final row per key = max days absorbed (n_days is monotone per key);
    # sink row order is not insertion order (the hw-twin lesson)
    final = {}
    for r in hist:
        d = r.asDict()
        if (
            r.event_type not in final
            or d["n_days"] > final[r.event_type]["n_days"]
        ):
            final[r.event_type] = d
    for etype in series:
        assert final[etype] == batch[etype], (
            etype,
            final[etype],
            batch[etype],
        )
    # the alarm latched at the SAME day index in an intermediate batch
    # and never moved afterwards
    click_alarms = [
        r.alarm_day_idx for r in hist if r.event_type == "click"
    ]
    fired = [a for a in click_alarms if a is not None]
    assert fired and all(a == fired[0] for a in fired)
    assert batch["click"]["drift_detected"]
    assert not batch["view"]["drift_detected"]
