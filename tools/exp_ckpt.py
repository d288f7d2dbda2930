"""Round-12 measurement experiment (guide §1): what does an eager
localCheckpoint of a small post-shuffle frame cost, what partitioning does
it freeze, and how do the iterative-lane alternatives compare?

Variants timed on the HITS half-round shape (join edges x scores ->
groupBy -> max-normalize):
  A. current: agg-for-max job + crossJoin(broadcast(max)) + eager ckpt
     (the heavy join+agg executes TWICE per half-round)
  B. ckpt the RAW sums first, 1-row collect for max, then a cheap map
     (heavy join+agg executes ONCE; normalize is lineage on the ckpt)
Prints partition counts of the checkpointed RDDs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.session import get_spark
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("exp-ckpt")
spark.sparkContext.setLogLevel("ERROR")

orders = load_table(spark, sf_dir, "orders").select(
    F.col("o_orderkey"), F.col("o_custkey").alias("cust")
)
li = load_table(spark, sf_dir, "lineitem").select(
    F.col("l_orderkey"), F.col("l_partkey").alias("part")
)
e = (
    orders.join(li, orders.o_orderkey == li.l_orderkey)
    .select("cust", "part")
    .distinct()
    .persist()
)
print("edges:", e.count(), "partitions:", e.rdd.getNumPartitions())

a0 = e.select("part").distinct().select(
    "part", F.lit(1_000_000).cast("bigint").alias("s")
)

# warmup one half-round
_ = (
    e.join(a0, "part").groupBy("cust").agg(F.sum("s").alias("s")).localCheckpoint()
)
print("warm ckpt partitions:", _.rdd.getNumPartitions())


def variant_a(rounds: int = 3) -> float:
    t0 = time.time()
    a = a0
    h = None
    for _ in range(rounds):
        hraw = e.join(a, "part").groupBy("cust").agg(
            F.sum("s").cast("bigint").alias("s")
        )
        hmax = hraw.agg(F.max("s").alias("mx"))
        h = (
            hraw.crossJoin(F.broadcast(hmax))
            .select("cust", F.expr("CAST(s * 1000000 DIV mx AS BIGINT)").alias("s"))
            .localCheckpoint(eager=True)
        )
        araw = e.join(h, "cust").groupBy("part").agg(
            F.sum("s").cast("bigint").alias("s")
        )
        amax = araw.agg(F.max("s").alias("mx"))
        a = (
            araw.crossJoin(F.broadcast(amax))
            .select("part", F.expr("CAST(s * 1000000 DIV mx AS BIGINT)").alias("s"))
            .localCheckpoint(eager=True)
        )
    n = a.count() + h.count()
    dt = time.time() - t0
    print(f"A: {dt:.3f}s rows={n} parts={a.rdd.getNumPartitions()}")
    return dt


def variant_b(rounds: int = 3) -> float:
    t0 = time.time()
    a = a0
    h = None
    for _ in range(rounds):
        hraw = (
            e.join(a, "part")
            .groupBy("cust")
            .agg(F.sum("s").cast("bigint").alias("s"))
            .localCheckpoint(eager=True)
        )
        mx = hraw.agg(F.max("s")).collect()[0][0]
        h = hraw.select(
            "cust", F.expr(f"CAST(s * 1000000 DIV {mx} AS BIGINT)").alias("s")
        )
        araw = (
            e.join(h, "cust")
            .groupBy("part")
            .agg(F.sum("s").cast("bigint").alias("s"))
            .localCheckpoint(eager=True)
        )
        mxa = araw.agg(F.max("s")).collect()[0][0]
        a = araw.select(
            "part", F.expr(f"CAST(s * 1000000 DIV {mxa} AS BIGINT)").alias("s")
        )
    n = a.count() + h.count()
    dt = time.time() - t0
    print(f"B: {dt:.3f}s rows={n} parts={araw.rdd.getNumPartitions()}")
    return dt


def variant_c(rounds: int = 3) -> float:
    """B + edge copies pre-partitioned on each half-round's join key, so
    the per-round join shuffles only the O(nodes) score frame."""
    t0 = time.time()
    e_p = e.repartition("part").persist()
    e_c = e.repartition("cust").persist()
    e_p.count(), e_c.count()
    a = a0
    h = None
    for _ in range(rounds):
        hraw = (
            e_p.join(a.hint("shuffle_hash"), "part")
            .groupBy("cust")
            .agg(F.sum("s").cast("bigint").alias("s"))
            .localCheckpoint(eager=True)
        )
        mx = hraw.agg(F.max("s")).collect()[0][0]
        h = hraw.select(
            "cust", F.expr(f"CAST(s * 1000000 DIV {mx} AS BIGINT)").alias("s")
        )
        araw = (
            e_c.join(h.hint("shuffle_hash"), "cust")
            .groupBy("part")
            .agg(F.sum("s").cast("bigint").alias("s"))
            .localCheckpoint(eager=True)
        )
        mxa = araw.agg(F.max("s")).collect()[0][0]
        a = araw.select(
            "part", F.expr(f"CAST(s * 1000000 DIV {mxa} AS BIGINT)").alias("s")
        )
    n = a.count() + h.count()
    dt = time.time() - t0
    e_p.unpersist()
    e_c.unpersist()
    print(f"C: {dt:.3f}s rows={n}")
    return dt


for trial in range(3):
    ta = variant_a()
    tb = variant_b()
    tc = variant_c()
spark.stop()
