"""Synthetic scale-up probe for the ANN/similarity-search paths.

Scales the sf0.1 embeddings corpus 1x/10x/100x (deterministic per-replica
perturbation so clones are distinct points, ids disjoint), then times the
three search strategies against the same query point:

  - brute-force HOF cosine top-k      (the linear-scan baseline)
  - Arrow-vectorized GEMM top-k       (numpy per batch, local top-k)
  - deterministic-medoid IVF top-k    (nprobe cell pruning)

Inputs cached before timing (compute+shuffle, not I/O) — same method as
the flagship and dedup scale-up tables in PLANS.md.

Usage: python tools/scale_probe_ann.py [sf_dir] [factors...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions import similarity
from shortvideohybridanalyticslakehouse_spark.session import get_spark
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table


def scaled_embeddings(spark, sf_dir: str, factor: int):
    base = load_table(spark, sf_dir, "embeddings", ensure_parallelism=True).select(
        "vec_id", "embedding", "label"
    )
    if factor == 1:
        return base
    stride = 10_000_000
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    # per-replica deterministic tilt: distinct points, same distribution
    tilt = (F.col("rep") % 7).cast("double") * F.lit(0.003)
    return base.crossJoin(reps).select(
        (F.col("vec_id") + F.col("rep") * stride).alias("vec_id"),
        F.transform(
            F.col("embedding"), lambda x, i: x + tilt * (i % 3).cast("double")
        ).alias("embedding"),
        "label",
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factors = [int(a) for a in sys.argv[2:]] or [1, 10, 100]
    spark = get_spark()
    for factor in factors:
        emb = scaled_embeddings(spark, sf_dir, factor).cache()
        n = emb.count()
        qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()[1]]
        print(f"\n=== factor {factor}: {n} vectors ===", flush=True)

        def timed(label, fn):
            t = time.time()
            rows = fn().collect()
            print(f"{label}: {time.time()-t:6.2f} s  (top ids {[r[0] for r in rows[:3]]})", flush=True)

        q_lit = F.array(*[F.lit(x) for x in qvec])
        timed(
            "brute-force HOF cosine top-10",
            lambda: similarity.cosine_topk(emb, q_lit, k=10),
        )
        timed(
            "Arrow GEMM vectorized top-10",
            lambda: similarity.cosine_topk_vectorized(emb, qvec, k=10),
        )
        timed(
            "medoid IVF (8 cells, nprobe 3) top-10",
            lambda: similarity.medoid_ivf_topk(emb, query_id=0, k=10),
        )
        emb.unpersist()


if __name__ == "__main__":
    main()
