"""Crash-restart for the streaming EWMA twin: stop the query after the
first micro-batches, restart from the same checkpoint, drain — the
per-key state (one EWMA double + counters) must survive the restart and
the final fold must equal the batch fold EXACTLY. This exercises the
applyInPandasWithState state-store round trip across processes, not
just the in-process logic the other EWMA tests cover. Sink is
foreachBatch (checkpoint-recoverable, unlike the memory sink) writing
batch-id-keyed parquet parts."""

from __future__ import annotations

import os
import time

from shortvideohybridanalyticslakehouse_spark.streaming.stateful import (
    ewma_incremental,
)


def _write_chunks(src: str, chunks) -> None:
    os.makedirs(src, exist_ok=True)
    t0 = time.time() - 600
    for i, ch in enumerate(chunks):
        p = os.path.join(src, f"p{i:04d}.csv")
        with open(p, "w") as f:
            for etype, me, x in ch:
                f.write(f"{etype},{me},{x}\n")
        os.utime(p, (t0 + i, t0 + i))


def test_ewma_state_survives_restart(spark, tmp_path):
    # 4 arrival files; minutes strictly increasing per key across files
    series = [(60 * (i + 1), (i * 7) % 23 + 1) for i in range(16)]
    chunks = [
        [("click", me, x) for me, x in series[i * 4 : (i + 1) * 4]]
        for i in range(4)
    ]
    src = os.path.join(str(tmp_path), "in")
    _write_chunks(src, chunks)
    ckpt = os.path.join(str(tmp_path), "ckpt")
    store = os.path.join(str(tmp_path), "out")

    def sink(batch_df, batch_id: int) -> None:
        # ALWAYS consume every partition first: for a stateful query the
        # state-store commits ride on partition processing, and Spark 4
        # fails the batch (STATE_STORE_COMMIT_VALIDATION_FAILED) if a
        # replayed batch returns early without touching the data
        rows = batch_df.collect()
        part = os.path.join(store, f"batch={batch_id}")
        if os.path.exists(part) or not rows:
            return  # replayed batch after restart: idempotent skip
        batch_df.sparkSession.createDataFrame(
            rows, batch_df.schema
        ).write.mode("overwrite").parquet(part)

    def start(trigger_kwargs):
        stream = (
            spark.readStream.schema(
                "event_type string, minute_epoch long, x long"
            )
            .option("maxFilesPerTrigger", 1)
            .csv(src)
        )
        return (
            ewma_incremental(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(**trigger_kwargs)
            .start()
        )

    q = start({"processingTime": "300 milliseconds"})
    # let at least 2 micro-batches commit, then kill mid-stream
    deadline = time.time() + 60
    while time.time() < deadline:
        lp = q.lastProgress
        if lp and lp["batchId"] >= 1:
            break
        time.sleep(0.3)
    q.stop()
    q.awaitTermination(30)

    # restart from the SAME checkpoint and drain everything remaining
    q2 = start({"availableNow": True})
    q2.awaitTermination(120)

    out = spark.read.parquet(store)
    rows = sorted(out.collect(), key=lambda r: r.n_minutes)
    assert rows, "restarted query emitted nothing"
    final = rows[-1]

    ewma = None
    total = 0
    for me, x in series:
        ewma = float(x) if ewma is None else ewma * 0.875 + float(x) * 0.125
        total += x
    assert final.event_type == "click"
    assert final.n_minutes == len(series)
    assert final.total_count == total
    assert final.ewma_last == ewma  # EXACT across the restart
