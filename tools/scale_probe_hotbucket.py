"""Hot-bucket scale probe: measures what the round-4 re-band machinery
buys on a PLANTED adversarial corpus — 30% of all fingerprints share one
15-bit band value (distinct upper bits), the shape the round-3 verdict
flagged as the last scale-killer.

Fixture is generated Spark-native from spark.range (no text, no driver
lists): doc i < 0.3N gets fingerprint (rand45(i) << 15) | V — one planted
level-0 bucket holding 30% of the corpus; the rest get uniform 60-bit
fingerprints (hash-derived, deterministic).

For each factor we time simhash_bucket_topk_pairs twice:
  capped   — default bucket_cap 8192: collapse + recursive re-band split
             the planted bucket across tasks
  uncapped — bucket_cap=None: the planted bucket reaches ONE task, which
             survives only because of the blocked-tile backstop (bounded
             memory) but runs the m^2/2 popcounts serially

Same output either way at these fixtures (top-k pairs live inside the
pigeonhole radius); the delta is pure parallelism + pruning. At the
largest factor the uncapped run is skipped when its projected serial
popcount volume exceeds the budget — the point of the probe is that the
capped path no longer has that term.

Usage: python tools/scale_probe_hotbucket.py [n_docs...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions import dedupfns
from shortvideohybridanalyticslakehouse_spark.session import get_spark

V = 0x3A5C  # the planted shared band-0 value


def planted_fingerprints(spark, n: int):
    """30% hot band + 30 planted hamming-1 partners: the partners pin the
    top-k INSIDE the pigeonhole radius, where the re-band guarantee makes
    capped and uncapped outputs identical (random fingerprints alone put
    the top-k at hamming >= 4, where candidate drop past the cap is the
    documented LSH relaxation — not what this probe measures)."""
    base = spark.range(n).select(F.col("id").alias("doc_id"))
    rand45 = F.abs(F.xxhash64(F.col("doc_id"), F.lit("upper"))) % F.lit(1 << 45)
    rand60 = F.abs(F.xxhash64(F.col("doc_id"), F.lit("full"))) % F.lit(1 << 60)
    hot = F.shiftleft(rand45, 15).bitwiseOR(F.lit(V))
    fps = base.select(
        "doc_id",
        F.when(F.col("doc_id") < int(0.3 * n), hot)
        .otherwise(rand60)
        .alias("simhash"),
    )
    partners = (
        spark.range(30)
        .select((F.col("id") + n).alias("doc_id"), F.col("id").alias("src"))
        .join(
            fps.select(
                F.col("doc_id").alias("src"), F.col("simhash").alias("src_fp")
            ),
            "src",
        )
        .select(
            "doc_id",
            F.expr(
                "src_fp ^ shiftleft(CAST(1 AS BIGINT), "
                "CAST(src % 45 + 15 AS INT))"
            ).alias("simhash"),
        )
    )
    return fps.unionByName(partners)


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [50_000, 500_000]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        fp = planted_fingerprints(spark, n).cache()
        fp.count()
        hot_m = int(0.3 * n)
        print(f"\n=== {n} docs, planted bucket = {hot_m} members ===", flush=True)
        t0 = time.time()
        capped = dedupfns.simhash_bucket_topk_pairs(fp, k=20).collect()
        print(f"capped (cap=8192):   {time.time() - t0:7.2f} s", flush=True)
        # serial popcount volume of the planted bucket if unsplit
        serial_pairs = hot_m * (hot_m - 1) // 2
        if serial_pairs > 3e9:
            print(
                f"uncapped: SKIPPED ({serial_pairs:.1e} serial pair popcounts "
                "in one task — the term the capped path deletes)",
                flush=True,
            )
        else:
            t0 = time.time()
            uncapped = dedupfns.simhash_bucket_topk_pairs(
                fp, k=20, bucket_cap=None
            ).collect()
            dt = time.time() - t0
            same = [tuple(r) for r in capped] == [tuple(r) for r in uncapped]
            print(
                f"uncapped (one task): {dt:7.2f} s  identical output: {same}",
                flush=True,
            )
        fp.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
