"""Streaming merge proofs for the two remaining sketches: Bloom (bitwise
OR — idempotent, so replays are safe WITHOUT batch markers) and KMV
(min-k of unioned per-batch min-k sets == batch min-k — order statistics
dominate, and distinct absorbs replays). Completes the sketch-twin
family: HLL (max), CMS/AMS (sum), Bloom (or), KMV (min-k)."""

from __future__ import annotations

import os
import time


from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions.dedupfns import hash60
from shortvideohybridanalyticslakehouse_spark.plans.queries_ext57 import (
    _WORD,
    _positions,
)

_K = 64


def _write_chunks(src, chunks):
    os.makedirs(src, exist_ok=True)
    t0 = time.time() - 600
    for i, keys in enumerate(chunks):
        p = os.path.join(src, f"p{i:04d}.csv")
        with open(p, "w") as f:
            f.write("\n".join(str(k) for k in keys))
        os.utime(p, (t0 + i, t0 + i))


def _bloom_words(df):
    mpos = df.select(F.explode(_positions(F.col("key"))).alias("p"))
    return (
        mpos.select(
            F.expr(f"p DIV {_WORD}").alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(p % {_WORD} AS INT))"
            ).alias("bitv"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(bitv)").alias("bits"))
    )


def test_stream_bloom_or_merge_idempotent(spark, tmp_path):
    chunks = [
        [i * 7 for i in range(200)],
        [i * 13 + 1 for i in range(150)],
        [i * 7 for i in range(100)],  # heavy overlap with chunk 0
    ]
    src = os.path.join(str(tmp_path), "in")
    _write_chunks(src, chunks)
    allk = [k for c in chunks for k in c]
    want = {
        (r.word, r.bits)
        for r in _bloom_words(
            spark.createDataFrame([(k,) for k in allk], "key long")
        ).collect()
    }

    store = os.path.join(str(tmp_path), "store")

    def accumulate(batch_df, batch_id: int) -> None:
        # NO batch-id guard on purpose: bit_or is idempotent, so even a
        # double-applied batch cannot corrupt the filter
        _bloom_words(batch_df).write.mode("append").parquet(store)

    q = (
        spark.readStream.schema("key long")
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
        .groupBy("word")
        .agg(F.expr("bit_or(bits)").alias("bits"))
    )
    got = {(r.word, r.bits) for r in merged.collect()}
    assert got == want
    # simulate a REPLAYED batch: re-apply chunk 1's words, re-merge —
    # the filter must be unchanged (idempotence)
    _bloom_words(
        spark.createDataFrame([(k,) for k in chunks[1]], "key long")
    ).write.mode("append").parquet(store)
    remerged = (
        spark.read.parquet(store)
        .groupBy("word")
        .agg(F.expr("bit_or(bits)").alias("bits"))
    )
    assert {(r.word, r.bits) for r in remerged.collect()} == want


def _kmv(df):
    h = df.select(hash60(F.col("u").cast("string")).alias("h")).distinct()
    return h.orderBy("h").limit(_K).select("h")


def test_stream_kmv_min_k_merge(spark, tmp_path):
    chunks = [
        [i * 3 for i in range(300)],
        [i * 5 + 2 for i in range(250)],
        [i * 3 for i in range(150)],  # replayed overlap
    ]
    src = os.path.join(str(tmp_path), "in")
    _write_chunks(src, chunks)
    allu = [u for c in chunks for u in c]
    want = sorted(
        r.h
        for r in _kmv(
            spark.createDataFrame([(u,) for u in allu], "u long")
        ).collect()
    )

    store = os.path.join(str(tmp_path), "store")

    def accumulate(batch_df, batch_id: int) -> None:
        # per-batch min-k candidate set; distinct at merge time absorbs
        # replays, order statistics make per-batch top-k sufficient
        _kmv(batch_df).write.mode("append").parquet(store)

    q = (
        spark.readStream.schema("u long")
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
        .distinct()
        .orderBy("h")
        .limit(_K)
    )
    got = sorted(r.h for r in merged.collect())
    assert got == want
    assert len(got) == _K
