"""Streaming PSI drift: per-bin counts are ADDITIVE across micro-batches
(plain integer sums), so a foreachBatch accumulator keyed by batch_id
merged at read time must equal the batch PSI exactly — the same
additive-merge family as CMS/AMS, applied to the drift monitor. The
anchor (reference lo/hi) is FROZEN up front, exactly how a production
drift monitor pins its baseline window."""

from __future__ import annotations

import datetime as dt
import os
import time

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.queries_ext87 import (
    psi_bin_counts,
    psi_report,
    psi_values,
)


def _mk_events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_stream_psi_equals_batch(spark, tmp_path):
    t0 = dt.datetime(2026, 10, 1)
    rows = []
    eid = 0
    # reference: views over 0..199 cents; current: clicks skewed high,
    # scattered across 3 arrival files
    for c in range(0, 200, 2):
        eid += 1
        rows.append((eid, t0, 1, "view", c / 100.0, "{}"))
    for i in range(60):
        eid += 1
        rows.append((eid, t0, 1, "click", (150 + (i % 50)) / 100.0, "{}"))
    for i in range(10):
        eid += 1
        rows.append((eid, t0, 1, "purchase", 1.0, "{}"))  # ignored type

    batch = _mk_events(spark, rows)
    vals = psi_values(batch)
    anchor_row = (
        vals.filter(F.col("event_type") == "view")
        .agg(F.min("cents").alias("lo"), F.max("cents").alias("hi"))
        .first()
    )
    anchor = spark.createDataFrame([anchor_row], "lo bigint, hi bigint")
    want = psi_report(psi_bin_counts(vals, anchor)).first()

    # stream the same events as 3 mtime-pinned csv files
    src = os.path.join(str(tmp_path), "in")
    os.makedirs(src)
    t_base = time.time() - 600
    chunks = [rows[0::3], rows[1::3], rows[2::3]]
    for i, ch in enumerate(chunks):
        p = os.path.join(src, f"p{i:04d}.csv")
        with open(p, "w") as f:
            for eid_, ts, uid, et, v, _ in ch:
                f.write(f"{eid_},{ts.isoformat()},{uid},{et},{v}\n")
        os.utime(p, (t_base + i, t_base + i))

    store = os.path.join(str(tmp_path), "store")

    def accumulate(batch_df, batch_id: int) -> None:
        part = os.path.join(store, f"batch={batch_id}")
        if os.path.exists(part):
            return  # additive: replays must not double-count
        psi_bin_counts(psi_values(batch_df), anchor).write.mode(
            "overwrite"
        ).parquet(part)

    q = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double"
        )
        .option("maxFilesPerTrigger", 1)
        .csv(src)
        .writeStream.foreachBatch(accumulate)
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    merged = (
        spark.read.parquet(store)
        .groupBy("bin")
        .agg(F.sum("c_ref").alias("c_ref"), F.sum("c_cur").alias("c_cur"))
    )
    got = psi_report(merged).first()
    assert (got.n_ref, got.n_cur) == (want.n_ref, want.n_cur)
    assert got.psi == want.psi  # bit-identical: same counts, same fold
