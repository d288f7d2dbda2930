"""Streaming AMS F2: sign-sum estimators are ADDITIVE across arbitrary
splits of the input — per-micro-batch S_j vectors summed across batches
equal a from-scratch batch sketch exactly. Unlike HLL's idempotent max,
AMS merge is a plain sum, so REPLAYS would double-count; the foreachBatch
accumulator therefore keys the store by batch_id (insert-if-absent),
which is the standard exactly-once pattern for additive sketches."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.queries_ext68 import _A, _B, _P


def _signs(df, ucol):
    a_arr = F.array(*[F.lit(a) for a in _A])
    b_arr = F.array(*[F.lit(b) for b in _B])
    exploded = df.select(
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(7)),
                lambda j: F.lit(1)
                - 2
                * (
                    (
                        (
                            F.element_at(a_arr, j + 1) * (F.col(ucol) % _P)
                            + F.element_at(b_arr, j + 1)
                        )
                        % _P
                    )
                    % 2
                ),
            )
        ).alias("j", "sgn")
    )
    return exploded.groupBy("j").agg(F.sum("sgn").cast("bigint").alias("s"))


def test_ams_sign_sums_additive_and_streamable(spark, tmp_path):
    chunks = [
        list(range(0, 400)) * 2,  # duplicates inside a chunk
        list(range(200, 700)),
        list(range(650, 1000)) + [5, 5, 5],
    ]
    src = os.path.join(str(tmp_path), "in")
    os.makedirs(src)
    t0 = time.time() - 600
    for i, users in enumerate(chunks):
        p = os.path.join(src, f"p{i:04d}.csv")
        with open(p, "w") as f:
            f.write("\n".join(str(u) for u in users))
        os.utime(p, (t0 + i, t0 + i))

    # batch truth over the concatenation
    all_users = [u for c in chunks for u in c]
    batch = spark.createDataFrame([(u,) for u in all_users], "u long")
    want = {r.j: r.s for r in _signs(batch, "u").collect()}

    store = os.path.join(str(tmp_path), "store")

    def accumulate(batch_df, batch_id: int) -> None:
        part = os.path.join(store, f"batch={batch_id}")
        if os.path.exists(part):
            return  # replay: additive sketch must not double-count
        _signs(batch_df.select(F.col("u").cast("long").alias("u")), "u") \
            .write.mode("overwrite").parquet(part)

    q = (
        spark.readStream.schema("u string")
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
        .groupBy("j")
        .agg(F.sum("s").cast("bigint").alias("s"))
    )
    got = {r.j: r.s for r in merged.collect()}
    assert got == want  # EXACT additivity, duplicates and all
