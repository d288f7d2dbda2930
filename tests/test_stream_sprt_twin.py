"""Streaming SPRT twin == batch sequential monitor, bit for bit, on the
same closed daily series: the decision latches at the mid-stream
crossing and survives the low-rate tail; replays are dropped; the
integer cumulative LLR equals the batch query's final value exactly
(the two log constants are collected FROM Spark, so both folds run the
identical IEEE chain)."""

from __future__ import annotations

import datetime as dt
import os
import time

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all
from shortvideohybridanalyticslakehouse_spark.streaming.stateful import (
    sprt_incremental,
)


def test_stream_sprt_equals_batch(spark, tmp_path):
    # front-loaded surge: 30% conversion for 10 days then 2% for 10 —
    # the upper bound crosses on day 2 (see test_ext129_131), the tail
    # drags the statistic negative, the decision must stay latched
    t0 = dt.datetime(2026, 10, 1, 0, 0, 0)
    daily = [(30 if d < 10 else 2, 100) for d in range(20)]
    rows = []
    eid = 0
    for day, (k, n) in enumerate(daily):
        for i in range(n):
            eid += 1
            rows.append(
                (eid, t0 + dt.timedelta(days=day, minutes=i), i,
                 "purchase" if i < k else "view", 1.0, "{}")
            )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    reg = load_all()
    batch = sorted(
        reg["sprt_conversion_monitor"][0](spark, str(tmp_path)).collect(),
        key=lambda r: r.day,
    )
    assert batch[-1].decision == "reject_h0"  # latched through the tail

    # the two LLR constants, computed by SPARK itself (identical IEEE
    # doubles to what the batch fold used)
    big_n = sum(n for _, n in daily)
    big_k = sum(k for k, _ in daily)
    p0 = big_k / big_n
    consts = spark.range(1).select(
        F.log(F.lit(1.2)).alias("a"),
        F.log(
            (F.lit(1.0) - F.lit(1.2) * F.lit(p0)) / (F.lit(1.0) - F.lit(p0))
        ).alias("b"),
    ).collect()[0]

    # stream the same closed (n, k) series as 4 arrival files,
    # mtime-pinned, with one REPLAYED day (bogus numbers, must drop)
    src = os.path.join(str(tmp_path), "in")
    os.makedirs(src)
    t_base = time.time() - 600
    epoch0 = int(t0.timestamp()) // 86400
    chunks = [[], [], [], []]
    for day, (k, n) in enumerate(daily):
        chunks[day // 5].append((epoch0 + day, n, k))
    chunks[3].append((epoch0 + 2, 100, 100))  # replay, dropped
    for i, ch in enumerate(chunks):
        p = os.path.join(src, f"p{i:02d}.csv")
        with open(p, "w") as f:
            for de, n, k in ch:
                f.write(f"conversion,{de},{n},{k}\n")
        os.utime(p, (t_base + i, t_base + i))

    stream = (
        spark.readStream.schema(
            "metric string, day_epoch long, n long, k long"
        )
        .option("maxFilesPerTrigger", 1)
        .csv(src)
    )
    q = (
        sprt_incremental(stream, float(consts.a), float(consts.b))
        .writeStream.format("memory")
        .queryName("sprt_twin")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    hist = spark.sql("SELECT * FROM sprt_twin").collect()
    final = max(hist, key=lambda r: r.n_days)
    assert final.n_days == 20
    # bit-for-bit: the streamed integer cumsum equals the batch query's
    # final cumulative LLR
    assert final.cum_llr_micro == batch[-1].cum_llr_micro
    assert final.decision == "reject_h0"
    # the decision latched mid-stream (some intermediate update already
    # says reject while days were still arriving) and never changed
    rejects = [r for r in hist if r.decision == "reject_h0"]
    assert rejects and min(r.n_days for r in rejects) < 20
    assert all(
        r.decision == "reject_h0" for r in hist if r.n_days >= 5
    )
