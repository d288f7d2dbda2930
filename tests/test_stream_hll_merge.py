"""Streaming HLL: incremental register maintenance across micro-batches
must reproduce the batch sketch EXACTLY (the union law, end-to-end).

This is the property that makes sketch-based monitoring viable on an
unbounded stream: each micro-batch contributes its own registers, the
accumulator is a read-modify-write elementwise max (a MERGE in sketch
space), and at any point the merged registers — and hence the estimate,
a pure function of registers — are IDENTICAL to a from-scratch batch
sketch over everything seen so far. No approximation drift, no
order-dependence, no double-counting on replays (max is idempotent).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions import sketches


def _write_user_files(tmpdir: str, chunks: list[list[int]]) -> str:
    src = os.path.join(tmpdir, "users_in")
    os.makedirs(src, exist_ok=True)
    t0 = time.time() - 600
    for i, users in enumerate(chunks):
        path = os.path.join(src, f"part-{i:04d}.csv")
        with open(path, "w") as f:
            f.write("\n".join(str(u) for u in users))
        os.utime(path, (t0 + i, t0 + i))  # pin arrival order (mtime source)
    return src


def test_stream_hll_registers_match_batch_exactly(spark, tmp_path):
    tmpdir = str(tmp_path)
    # overlapping chunks: duplicates across micro-batches must not move
    # the registers (max is idempotent)
    chunks = [
        list(range(0, 500)),
        list(range(300, 900)),
        list(range(850, 1400)),
    ]
    src = _write_user_files(tmpdir, chunks)
    store = os.path.join(tmpdir, "hll_store")
    ckpt = os.path.join(tmpdir, "ckpt")

    stream = (
        spark.readStream.schema("u string")
        .option("maxFilesPerTrigger", 1)
        .csv(src)
    )

    def merge_batch(batch_df, batch_id: int) -> None:
        regs = sketches.hll_registers(batch_df, [], F.col("u"))
        if os.path.exists(store):
            prev = batch_df.sparkSession.read.parquet(store)
            regs = sketches.hll_merge(prev, regs)
        # collect-then-rewrite: O(m)=256 rows, safe to materialize before
        # overwriting the store the merge just read from
        rows = regs.collect()
        batch_df.sparkSession.createDataFrame(
            rows, "bucket int, rho int"
        ).coalesce(1).write.mode("overwrite").parquet(store)

    q = stream.writeStream.foreachBatch(merge_batch).option(
        "checkpointLocation", ckpt
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)

    merged = {
        (r.bucket, r.rho) for r in spark.read.parquet(store).collect()
    }
    all_users = spark.createDataFrame(
        [(str(u),) for chunk in chunks for u in chunk], "u string"
    )
    batch = {
        (r.bucket, r.rho)
        for r in sketches.hll_registers(all_users, [], F.col("u")).collect()
    }
    assert merged == batch  # exact register equality, not approximate

    est_stream = sketches.hll_estimate(
        spark.read.parquet(store).withColumn("g", F.lit(1)), ["g"]
    ).collect()[0]["hll_estimate"]
    est_batch = sketches.hll_estimate(
        sketches.hll_registers(all_users, [], F.col("u")).withColumn(
            "g", F.lit(1)
        ),
        ["g"],
    ).collect()[0]["hll_estimate"]
    assert est_stream == est_batch
    n_true = 1400  # union of the overlapping ranges
    assert abs(est_stream - n_true) / n_true < 0.2
