"""Synthetic scale-up probe for the two slowest COMPOSITE queries
(round-4 verdict task 5): corpus_curation_funnel and
doc_similarity_pagerank.

Same method as scale_probe_dedup.py: clone the sf0.1 documents corpus
1x/10x/100x with per-group token salting so near-dup cluster size stays
BOUNDED at 2 (verified pair volume grows linearly, the realistic crawl
shape), cache inputs before timing (compute+shuffle cost, not parquet
I/O), and report wall seconds + per-doc microseconds per factor. A
sublinear-or-flat per-doc cost means the composition inherits its stages'
scale shape; a superlinear one names the offending stage.

Usage: python tools/scale_probe_composites.py [sf_dir] [factors...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import Window

from shortvideohybridanalyticslakehouse_spark.functions import dedupfns
from shortvideohybridanalyticslakehouse_spark.functions.dedupfns import hash60
from shortvideohybridanalyticslakehouse_spark.plans.queries_ext40 import (
    QF_MAX_TOP_FRACTION,
    QF_MEAN_WORD_LEN_HI,
    QF_MEAN_WORD_LEN_LO,
    QF_MIN_TOKENS,
    QF_MIN_TTR,
)
from shortvideohybridanalyticslakehouse_spark.session import get_spark
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table


def scaled_docs(spark, sf_dir: str, factor: int):
    """Same replication scheme as scale_probe_dedup.scaled_docs, plus the
    lang column the funnel's language stage filters on."""
    base = load_table(spark, sf_dir, "documents", ensure_parallelism=True).select(
        "doc_id", "lang", "text", "source"
    )
    if factor == 1:
        return base
    n_base = 10_000_000
    reps = spark.range(factor).select(F.col("id").alias("rep"))
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
        "lang",
        F.when(F.col("rep") % 2 == 0, salted)
        .otherwise(F.concat_ws(" ", salted, F.lit("oddtail")))
        .alias("text"),
        "source",
    )


def funnel_over(docs):
    """corpus_curation_funnel's exact composition over an arbitrary docs
    frame (mirrors plans/queries_ext40.q_curation_funnel stage for stage)."""
    base = docs.select(
        "doc_id",
        "lang",
        "text",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tok"),
    )
    s1 = base.filter(F.col("lang") == "en")
    qtok = s1.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token"),
    )
    qper = qtok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("cnt"))
    qdoc = qper.groupBy("doc_id").agg(
        F.sum("cnt").alias("q_n"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("cnt").alias("top_cnt"),
        F.sum(F.col("cnt") * F.length("token")).alias("sum_len"),
    )
    pass_all = (
        (F.col("q_n") >= QF_MIN_TOKENS)
        & (F.col("sum_len").cast("double") / F.col("q_n") >= QF_MEAN_WORD_LEN_LO)
        & (F.col("sum_len").cast("double") / F.col("q_n") <= QF_MEAN_WORD_LEN_HI)
        & (F.col("n_distinct").cast("double") / F.col("q_n") >= QF_MIN_TTR)
        & (F.col("top_cnt").cast("double") / F.col("q_n") <= QF_MAX_TOP_FRACTION)
    )
    s2 = s1.join(qdoc.filter(pass_all).select("doc_id"), "doc_id", "left_semi")
    w = Window.partitionBy(F.md5(F.col("text"))).orderBy(F.col("doc_id").asc())
    s3 = (
        s2.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    with_sig = dedupfns.minhash_signatures_df(
        s3, "doc_id", "text", k=2, num_hashes=16, out_col="minhash"
    )
    near_drop = (
        dedupfns.minhash_candidate_pairs(
            with_sig, id_col="doc_id", sig_col="minhash", num_hashes=16, band_size=2
        )
        .filter(F.col("est_jaccard") * 16 >= 8)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    s4 = s3.join(near_drop, "doc_id", "left_anti")
    holdout = base.filter(hash60(F.col("doc_id").cast("string")) % 10 == 9)
    hold_g = (
        holdout.select(F.explode(dedupfns.shingles(F.col("text"), 8)).alias("g"))
        .select(hash60(F.col("g")).alias("gh"))
        .distinct()
    )
    cand = s4.join(holdout.select("doc_id"), "doc_id", "left_anti")
    cand_g = cand.select(
        "doc_id", F.explode(dedupfns.shingles(F.col("text"), 8)).alias("g")
    ).select("doc_id", hash60(F.col("g")).alias("gh"))
    contaminated = cand_g.join(hold_g, "gh", "left_semi").select("doc_id").distinct()
    s5 = cand.join(contaminated, "doc_id", "left_anti")

    def stage(df, no, name):
        return df.agg(
            F.lit(no).cast("bigint").alias("stage_no"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum("n_tok"), F.lit(0)).alias("n_tokens"),
        ).select("stage_no", "stage", "n_docs", "n_tokens")

    return (
        stage(base, 0, "raw")
        .unionByName(stage(s1, 1, "language"))
        .unionByName(stage(s2, 2, "quality"))
        .unionByName(stage(s3, 3, "exact_dedup"))
        .unionByName(stage(s4, 4, "near_dedup"))
        .unionByName(stage(s5, 5, "decontaminated"))
        .orderBy("stage_no")
    )


def pagerank_over(docs, iters: int = 3, base_rank: float = 0.15, damp: float = 0.85):
    """doc_similarity_pagerank's composition over an arbitrary docs frame
    (mirrors plans/queries_ext38.q_doc_pagerank)."""
    with_sig = dedupfns.minhash_signatures_df(
        docs, "doc_id", "text", k=2, num_hashes=16, out_col="minhash"
    )
    pairs = (
        dedupfns.minhash_candidate_pairs(
            with_sig, id_col="doc_id", sig_col="minhash", num_hashes=16, band_size=2
        )
        .filter(F.col("est_jaccard") * 16 >= 4)
        .select("doc_a", "doc_b")
    )
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    # mirror queries_ext38: loop-invariant degree attached once
    edges = edges.withColumn(
        "deg", F.count(F.lit(1)).over(Window.partitionBy("src"))
    ).persist()
    nodes = docs.select("doc_id").distinct()
    rank = nodes.withColumn("rank", F.lit("1.0").cast("decimal(28,12)"))
    for _ in range(iters):
        contrib = (
            edges.join(rank.withColumnRenamed("doc_id", "src"), "src")
            .select(
                F.col("dst").alias("doc_id"),
                F.round(F.col("rank").cast("double") / F.col("deg"), 12)
                .cast("decimal(28,12)")
                .alias("contrib"),
            )
            .groupBy("doc_id")
            .agg(F.sum("contrib").alias("acc"))
        )
        rank = nodes.join(contrib, "doc_id", "left").select(
            "doc_id",
            F.round(
                F.lit(base_rank)
                + F.lit(damp) * F.coalesce(F.col("acc"), F.lit(0)).cast("double"),
                12,
            )
            .cast("decimal(28,12)")
            .alias("rank"),
        )
    return (
        rank.select(
            "doc_id", F.round(F.col("rank").cast("double"), 9).alias("pagerank")
        )
        .orderBy(F.col("pagerank").desc(), F.col("doc_id").asc())
        .limit(20)
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factors = [int(a) for a in sys.argv[2:]] or [1, 10, 100]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    for factor in factors:
        docs = scaled_docs(spark, sf_dir, factor).cache()
        n_docs = docs.count()
        print(f"\n=== factor {factor}: {n_docs} docs ===", flush=True)
        for label, builder in (("funnel", funnel_over), ("pagerank", pagerank_over)):
            t0 = time.time()
            rows = builder(docs).collect()
            dt = time.time() - t0
            print(
                f"{label}: {dt:7.2f} s  ({dt / n_docs * 1e6:8.2f} us/doc, "
                f"{len(rows)} result rows)",
                flush=True,
            )
        docs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
