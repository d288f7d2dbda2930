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
    args = sys.argv[1:]
    do_vectors = "--vectors" in args
    sizes = [int(a) for a in args if a.isdigit()] or (
        [20_000, 200_000] if do_vectors else [50_000, 500_000]
    )
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    if do_vectors:
        vector_probe(spark, sizes)
        spark.stop()
        return
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


# ---------------------------------------------------------------------------
# Vector-side twin: planted duplicate-heavy embedding corpus
# ---------------------------------------------------------------------------


def planted_vectors(spark, n: int, dim: int = 64):
    """30% exact-duplicate vectors (one shared embedding) + 70% distinct
    hash-derived vectors — the mass-duplicate corpus shape that makes one
    sketch bucket hold 30% of all rows. Spark-native generation."""
    base = spark.range(n).select(F.col("id").alias("vec_id"))
    dup_flag = F.col("vec_id") < int(0.3 * n)
    comps = []
    for d in range(dim):
        # deterministic pseudo-gaussian-ish component in [-1, 1)
        h = F.xxhash64(F.col("vec_id"), F.lit(d))
        rnd = (F.abs(h) % 2_000_000).cast("double") / 1_000_000.0 - 1.0
        dup_h = F.xxhash64(F.lit(-1), F.lit(d))
        dup_v = (F.abs(dup_h) % 2_000_000).cast("double") / 1_000_000.0 - 1.0
        comps.append(F.when(dup_flag, dup_v).otherwise(rnd))
    return base.select("vec_id", F.array(*comps).alias("embedding"))


def vector_probe(spark, sizes) -> None:
    from shortvideohybridanalyticslakehouse_spark.functions import similarity

    for n in sizes:
        emb = planted_vectors(spark, n).cache()
        emb.count()
        print(f"\n=== {n} vectors, {int(0.3*n)} exact duplicates ===", flush=True)
        t0 = time.time()
        capped = similarity.lsh_bucket_topk_pairs(emb, k=20).collect()
        print(f"capped (collapse+reband): {time.time() - t0:7.2f} s", flush=True)
        dup_pairs = int(0.3 * n) * (int(0.3 * n) - 1) // 2
        if dup_pairs > 2e8:
            print(
                f"uncapped: SKIPPED ({dup_pairs:.1e} duplicate pairs through "
                "one bucket GEMM — the term the collapse deletes)",
                flush=True,
            )
        else:
            t0 = time.time()
            uncapped = similarity.lsh_bucket_topk_pairs(
                emb, k=20, bucket_cap=None
            ).collect()
            same = [tuple(r) for r in capped] == [tuple(r) for r in uncapped]
            print(
                f"uncapped (one task):      {time.time() - t0:7.2f} s  "
                f"identical output: {same}",
                flush=True,
            )
        emb.unpersist()


if __name__ == "__main__":
    main()
