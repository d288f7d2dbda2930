"""Streaming PSI monitor == the ext134 batch drift lane, bit for bit, on
the same closed series: the frozen reference histogram is the batch
lane's first calendar half; the streamed second half accumulates as
state; the final PSI equals the exact integer sum of the batch query's
per-bin nano terms (identical IEEE chain per term)."""

from __future__ import annotations

import datetime as dt
import os
import time

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all
from shortvideohybridanalyticslakehouse_spark.streaming.stateful import (
    psi_incremental,
)

T0 = dt.datetime(2026, 5, 4, 0, 0, 0)


def test_stream_psi_equals_batch(spark, tmp_path):
    # first half: uniform values 0..9; second half: skewed to the top
    rows = []
    eid = 0
    for i in range(100):
        eid += 1
        rows.append(
            (eid, T0 + dt.timedelta(minutes=i), i, "view",
             float(i % 10), "{}")
        )
    for i in range(100):
        eid += 1
        rows.append(
            (eid, T0 + dt.timedelta(days=10, minutes=i), i, "view",
             float(9 if i % 2 else i % 10), "{}")
        )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    reg = load_all()
    batch = sorted(
        reg["psi_value_drift_halves"][0](spark, str(tmp_path)).collect(),
        key=lambda r: r.bin,
    )
    ref_counts = [r.n_first for r in batch]
    batch_psi = sum(r.psi_term_nano for r in batch)
    assert batch_psi > 0  # the skew is real

    # stream the second half's binned counts as 3 seq-ordered files,
    # plus one REPLAYED seq (bogus counts, must drop)
    src = os.path.join(str(tmp_path), "in")
    os.makedirs(src)
    t_base = time.time() - 600
    second = [r.n_second for r in batch]
    # split each bin's count into 3 chunks across seqs
    chunks: list[list[tuple]] = [[], [], []]
    for b, n in enumerate(second):
        third = n // 3
        parts = [third, third, n - 2 * third]
        for s, p in enumerate(parts):
            if p:
                chunks[s].append(("value", s, b, p))
    chunks[2].append(("value", 0, 0, 999))  # replayed seq 0: dropped
    # malformed bins (ADVICE r10): outside [0, nbins) — must be dropped
    # AND counted, never IndexError-kill the query
    chunks[1].append(("value", 1, len(second), 7))
    chunks[1].append(("value", 1, -3, 7))
    for i, ch in enumerate(chunks):
        p = os.path.join(src, f"p{i:02d}.csv")
        with open(p, "w") as f:
            for metric, s, b, n in ch:
                f.write(f"{metric},{s},{b},{n}\n")
        os.utime(p, (t_base + i, t_base + i))

    stream = (
        spark.readStream.schema("metric string, seq long, bin long, n long")
        .option("maxFilesPerTrigger", 1)
        .csv(src)
    )
    q = (
        psi_incremental(stream, ref_counts)
        .writeStream.format("memory")
        .queryName("psi_twin")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    hist = spark.sql("SELECT * FROM psi_twin").collect()
    final = max(hist, key=lambda r: r.n_cur)
    assert final.n_ref == sum(ref_counts)
    assert final.n_cur == sum(second)
    # bit-for-bit: streamed PSI == exact sum of the batch per-bin terms
    assert final.psi_nano == batch_psi
    assert final.n_batches_dropped == 1
    assert final.n_rows_bad == 2  # the two malformed-bin rows
    # the monitor moved as data arrived (intermediate PSI values exist)
    assert len({r.psi_nano for r in hist}) > 1
