"""Synthetic scale-up probe for the dedup/near-dup pipelines.

Scales the sf0.1 documents corpus 1x/10x/100x by cloning every doc with a
replica-suffixed id and a per-replica token perturbation (so the clone is
a NEAR duplicate of its source — the workload LSH exists for), then times:

  - minhash-LSH candidates + est-Jaccard prefilter + exact verify
    (the near_dup_lsh_verified composition)
  - simhash fingerprint + bucketed hamming top-k
    (the simhash_closest_pairs composition)

Inputs are cached before timing so the numbers are compute+shuffle, not
parquet I/O — the same method as the flagship scale-up table in PLANS.md.

Usage: python tools/scale_probe_dedup.py [sf_dir] [factors...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions import dedupfns
from shortvideohybridanalyticslakehouse_spark.session import get_spark
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table


def scaled_docs(spark, sf_dir: str, factor: int):
    base = load_table(spark, sf_dir, "documents", ensure_parallelism=True).select(
        "doc_id", "text", "source"
    )
    if factor == 1:
        return base
    n_base = 10_000_000  # id stride keeping replica ids disjoint
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    # Replicas come in GROUPS OF TWO (gid = rep // 2): every token is
    # salted with the group id, so different groups share no vocabulary
    # (cross-group Jaccard ~ 0 — LSH banding sees them as unrelated, like
    # a real crawl), while the two docs inside a group differ by a single
    # extra token (Jaccard ~ 0.96 — a genuine near-dup pair). Duplicate
    # cluster size stays BOUNDED at 2 as the corpus scales, so verified
    # pair volume grows linearly with the corpus, not quadratically.
    gid = (F.col("rep") / 2).cast("long")
    salted = F.array_join(
        F.transform(
            F.split(F.col("text"), " "),
            lambda t: F.concat(t, F.lit("g"), gid.cast("string")),
        ),
        " ",
    )
    return base.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * n_base).alias("doc_id"),
        F.when(F.col("rep") % 2 == 0, salted)
        .otherwise(F.concat_ws(" ", salted, F.lit("oddtail")))
        .alias("text"),
        "source",
    )


def time_action(label: str, fn) -> float:
    t = time.time()
    n = fn()
    dt = time.time() - t
    print(f"{label}: {dt:6.2f} s  (result rows: {n})", flush=True)
    return dt


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factors = [int(a) for a in sys.argv[2:]] or [1, 10, 100]
    spark = get_spark()
    for factor in factors:
        docs = scaled_docs(spark, sf_dir, factor).cache()
        n_docs = docs.count()
        print(f"\n=== factor {factor}: {n_docs} docs ===", flush=True)

        def near_dup():
            with_sig = dedupfns.minhash_signatures_df(
                docs, "doc_id", "text", k=2, num_hashes=16, out_col="minhash"
            )
            cand = (
                dedupfns.minhash_candidate_pairs(
                    with_sig,
                    id_col="doc_id",
                    sig_col="minhash",
                    num_hashes=16,
                    band_size=2,
                )
                .filter(F.col("est_jaccard") * 16 >= 4)
                .select("doc_a", "doc_b")
            )
            verified = dedupfns.verify_candidate_jaccard(
                docs, cand, "doc_id", "text", k=2
            )
            return verified.filter(F.col("jaccard") >= 0.5).count()

        def simhash_topk():
            f = dedupfns.simhash_df(docs, "doc_id", "text")
            return dedupfns.simhash_bucket_topk_pairs(
                f, "doc_id", "simhash", k=20
            ).count()

        def winnowing():
            # Probe-local cap/threshold: the clone fixture salts every
            # token with ONE group id, so each group's docs share far
            # more k-grams than a real crawl and the engine's default
            # 64-doc hot cap filters the evidence — the probe widens the
            # cap to keep pair volume observable; the engine constants
            # are unchanged (queries_ext95). The probe's signal is the
            # WALL-TIME scaling of the fingerprint+bucket-join shape.
            from shortvideohybridanalyticslakehouse_spark.plans.queries_ext95 import (
                _POS_PACK,
                winnowing_fingerprints_df,
            )

            probe_cap, probe_min_shared = 256, 2
            fps = winnowing_fingerprints_df(docs)
            hashes = fps.select(
                "doc_id",
                (F.col("wmin") / _POS_PACK).cast("bigint").alias("fph"),
            ).distinct()
            buck = (
                hashes.groupBy("fph")
                .agg(F.count(F.lit(1)).alias("n_docs"))
                .filter(
                    (F.col("n_docs") >= 2) & (F.col("n_docs") <= probe_cap)
                )
                .select("fph")
            )
            bounded = hashes.join(buck, "fph")
            pairs = (
                bounded.alias("a")
                .join(
                    bounded.alias("b"),
                    (F.col("a.fph") == F.col("b.fph"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")),
                )
                .groupBy(F.col("a.doc_id"), F.col("b.doc_id"))
                .agg(F.countDistinct(F.col("a.fph")).alias("shared"))
                .filter(F.col("shared") >= probe_min_shared)
            )
            return pairs.count()

        time_action("minhash-LSH verify pipeline", near_dup)
        time_action("simhash bucket top-k", simhash_topk)
        time_action("winnowing fingerprint dup pairs", winnowing)
        docs.unpersist()


if __name__ == "__main__":
    main()
