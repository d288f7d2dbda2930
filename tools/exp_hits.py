"""Round-12 experiment: HITS iteration shapes (guide §1 empirical loop).

Variants, all producing identical scores:
  A  broadcast scores side + ckpt raw sums + scalar max fold   (current)
  B  shuffle join + ckpt raw sums + scalar max fold
  C  B but edge list repartitioned to N partitions before persist
  D  original r11 shape (broadcast-max crossJoin, ckpt normalized) for ref
Prints wall per full query body (3 rounds + topk collect), 3 trials each.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.session import get_spark
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("exp-hits")
spark.sparkContext.setLogLevel("ERROR")
ROUNDS = 3


def build_e(nparts=None):
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey"), F.col("o_custkey").alias("cust")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey"), F.col("l_partkey").alias("part")
    )
    e = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
        "cust", "part"
    ).distinct()
    if nparts:
        e = e.repartition(nparts)
    return e.persist()


def topk(a, h):
    wa = Window.orderBy(F.col("s").desc(), F.col("part").asc())
    wh = Window.orderBy(F.col("s").desc(), F.col("cust").asc())
    tops = (
        a.select(F.lit("authority").alias("role"), F.col("part").alias("k"),
                 F.col("s"), F.row_number().over(wa).alias("r"))
        .filter("r <= 10")
        .unionByName(
            h.select(F.lit("hub").alias("role"), F.col("cust").alias("k"),
                     F.col("s"), F.row_number().over(wh).alias("r"))
            .filter("r <= 10"))
    )
    return tops.collect()


def run(variant, nparts=None):
    e = build_e(nparts)
    if variant == "A":
        side = lambda df: F.broadcast(df)
    else:
        side = lambda df: df
    a = e.select("part").distinct().select(
        "part", F.lit(1_000_000).cast("bigint").alias("s"))
    h = None
    for _ in range(ROUNDS):
        if variant == "D":
            hraw = e.join(a, "part").groupBy("cust").agg(
                F.sum("s").cast("bigint").alias("s"))
            hmax = hraw.agg(F.max("s").alias("mx"))
            h = hraw.crossJoin(F.broadcast(hmax)).select(
                "cust", F.expr("CAST(s * 1000000 DIV mx AS BIGINT)").alias("s")
            ).localCheckpoint(eager=True)
            araw = e.join(h, "cust").groupBy("part").agg(
                F.sum("s").cast("bigint").alias("s"))
            amax = araw.agg(F.max("s").alias("mx"))
            a = araw.crossJoin(F.broadcast(amax)).select(
                "part", F.expr("CAST(s * 1000000 DIV mx AS BIGINT)").alias("s")
            ).localCheckpoint(eager=True)
        else:
            hraw = e.join(side(a), "part").groupBy("cust").agg(
                F.sum("s").cast("bigint").alias("s")).localCheckpoint(eager=True)
            mx = hraw.agg(F.max("s")).collect()[0][0] or 1
            h = hraw.select("cust", F.expr(
                f"CAST(s * 1000000 DIV {int(mx)} AS BIGINT)").alias("s"))
            araw = e.join(side(h), "cust").groupBy("part").agg(
                F.sum("s").cast("bigint").alias("s")).localCheckpoint(eager=True)
            mx = araw.agg(F.max("s")).collect()[0][0] or 1
            a = araw.select("part", F.expr(
                f"CAST(s * 1000000 DIV {int(mx)} AS BIGINT)").alias("s"))
    rows = topk(a, h)
    e.unpersist()
    return rows


# warmup
spark.range(1_000_000).groupBy((F.col("id") % 10).alias("k")).agg(
    F.sum("id")).collect()

results = {}
for label, (v, np_) in {
    "A_bcast": ("A", None),
    "B_shuffle": ("B", None),
    "C_shuffle_p8": ("C", 8),
    "C_shuffle_p4": ("C", 4),
    "D_orig": ("D", None),
}.items():
    times = []
    for t in range(3):
        t0 = time.time()
        rows = run(v, np_)
        times.append(time.time() - t0)
    results[label] = (sorted(times)[1], [round(x, 2) for x in times],
                      len(rows))
for k, v in results.items():
    print(k, v)
