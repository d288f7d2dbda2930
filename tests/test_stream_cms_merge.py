"""Streaming CMS: counter matrices are additive across micro-batches —
per-batch (row, bucket) counts summed across batches equal the batch
sketch exactly, and the point estimates (a pure function of counters)
therefore agree too. Like AMS (and unlike HLL's idempotent max), the
merge is a plain sum, so the accumulator keys the store by batch_id."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions import sketches


def test_stream_cms_counters_match_batch_exactly(spark, tmp_path):
    chunks = [
        [f"w{i % 37}" for i in range(400)],
        [f"w{i % 11}" for i in range(300)],
        [f"w{(i * 7) % 53}" for i in range(350)],
    ]
    src = os.path.join(str(tmp_path), "in")
    os.makedirs(src)
    t0 = time.time() - 600
    for i, words in enumerate(chunks):
        p = os.path.join(src, f"p{i:04d}.csv")
        with open(p, "w") as f:
            f.write("\n".join(words))
        os.utime(p, (t0 + i, t0 + i))

    all_words = [w for c in chunks for w in c]
    batch = spark.createDataFrame([(w,) for w in all_words], "term string")
    want = {
        (r.row, r.bucket): r.cnt
        for r in sketches.cms_counters(batch, "term").collect()
    }

    store = os.path.join(str(tmp_path), "store")

    def accumulate(batch_df, batch_id: int) -> None:
        part = os.path.join(store, f"batch={batch_id}")
        if os.path.exists(part):
            return  # additive sketch: replays must not double-count
        sketches.cms_counters(batch_df, "term").write.mode(
            "overwrite"
        ).parquet(part)

    q = (
        spark.readStream.schema("term string")
        .option("maxFilesPerTrigger", 1)
        .csv(src)
        .writeStream.foreachBatch(accumulate)
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    merged = (
        spark.read.parquet(*[os.path.join(store, d) for d in os.listdir(store)])
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    got = {(r.row, r.bucket): r.cnt for r in merged.collect()}
    assert got == want

    # point estimates from merged counters == estimates from batch counters
    terms = spark.createDataFrame(
        [("w0",), ("w5",), ("w10",), ("zzz",)], "term string"
    )
    est_merged = {
        r.term: r[1]
        for r in sketches.cms_point_estimates(terms, merged, "term").collect()
    }
    est_batch = {
        r.term: r[1]
        for r in sketches.cms_point_estimates(
            terms, sketches.cms_counters(batch, "term"), "term"
        ).collect()
    }
    assert est_merged == est_batch
