"""Extension queries, round 42: perplexity-bucketed mixture — quintile the
corpus by unigram-LM surprise and report each bucket's doc/token mass.
The curation decision this feeds: low-surprise buckets are boilerplate
candidates, high-surprise buckets are noise candidates; mid buckets carry
the training signal (the heuristic behind perplexity-filtered corpora).

Composition: the per-doc bits/token score of doc_unigram_logprob + the
distributed exact ntile of operators/ranks.py (no single-partition sort).
Cross-row determinism: per-doc scores are rounded (6) then bucket sums run
in DECIMAL over the rounded values; only the final per-bucket average
divides in double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.operators import ranks
from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import (
    load_table,
    scaled_shuffle_partitions,
)

_MIX_ORACLE = """
WITH occ AS (
  SELECT doc_id, unnest(string_split(trim(lower(coalesce(text, ''))), ' ')) AS tok
  FROM documents WHERE len(trim(lower(coalesce(text, '')))) > 0
), vocab AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS n_tok,
         sum(count(*)) OVER () AS n_total
  FROM occ GROUP BY tok
), scored AS (
  SELECT o.doc_id,
         CAST(count(*) AS BIGINT) AS doc_tokens,
         CAST(round(avg(-log2(CAST(v.n_tok AS DOUBLE)
                     / CAST(v.n_total AS DOUBLE))), 6) AS DECIMAL(18,6))
           AS bits
  FROM occ o JOIN vocab v ON v.tok = o.tok
  GROUP BY 1
), binned AS (
  SELECT *, ntile(5) OVER (ORDER BY bits ASC, doc_id ASC) AS bucket
  FROM scored
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_tokens) AS BIGINT) AS n_tokens,
       round(CAST(sum(bits) AS DOUBLE) / count(*), 6) AS avg_bits_per_token,
       round(CAST(min(bits) AS DOUBLE), 6) AS min_bits,
       round(CAST(max(bits) AS DOUBLE), 6) AS max_bits
FROM binned GROUP BY 1 ORDER BY 1
"""


@register("perplexity_bucket_mixture", _MIX_ORACLE)
def q_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surprise quintiles (see module docstring). The ntile is the exact
    distributed form (bucketed rank + ntile arithmetic — bit-identical to
    the window function, asserted in test_ranks.py), so no stage sorts
    the corpus on one core.
    """
    docs = load_table(spark, sf_dir, "documents", ensure_parallelism=True)
    text = F.trim(F.lower(F.coalesce(F.col("text"), F.lit(""))))
    occ = docs.filter(F.length(text) > 0).select(
        "doc_id", F.explode(F.split(text, " ", -1)).alias("tok")
    )
    # Corpus total via a broadcast 1-row agg instead of an unpartitioned
    # window: the window form funnels the WHOLE vocab through one
    # partition; this shape reuses the groupBy's exchange (ReusedExchange)
    # and broadcasts a single row.
    counts = occ.groupBy("tok").agg(F.count(F.lit(1)).alias("n_tok"))
    # input-scaled SHJ build width (VERDICT r10 #1): metadata-fast count
    # of the PURE documents scan, 30x-probe-green calibration
    n_shuf = scaled_shuffle_partitions(
        load_table(spark, sf_dir, "documents", ensure_parallelism=False),
        rows_per_partition=10_000,
    )
    vocab = counts.crossJoin(
        F.broadcast(counts.agg(F.sum("n_tok").alias("n_total")))
    ).repartition(n_shuf, "tok")
    bits = -F.log2(F.col("n_tok").cast("double") / F.col("n_total").cast("double"))
    # O(vocab) build side grows with the corpus and the round-9 10x AQE
    # probe proved this count-join shape does NOT demote from broadcast
    # on its own (bigram clone: 419 MB) — pin shuffle-hash with the
    # scaled build-side repartition: per-executor build memory stays
    # O(rows/n_shuf); EnsureRequirements aligns the probe side.
    scored = (
        occ.join(vocab.hint("shuffle_hash"), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("doc_tokens"),
            F.round(F.avg(bits), 6).cast("decimal(18,6)").alias("bits"),
        )
    )
    binned = ranks.with_distributed_row_number(
        scored, [], ["bits", "doc_id"], single_pass=True
    ).withColumn(
        "bucket", ranks.ntile_from_rank(F.col("_rn"), F.col("_n"), 5)
    )
    return (
        binned.groupBy(F.col("bucket").cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_tokens").alias("n_tokens"),
            F.round(
                F.sum("bits").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_bits_per_token"),
            F.round(F.min("bits").cast("double"), 6).alias("min_bits"),
            F.round(F.max("bits").cast("double"), 6).alias("max_bits"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# mapInArrow (pandas-free) brute-force ANN — same oracle as the HOF baseline
# ---------------------------------------------------------------------------

from shortvideohybridanalyticslakehouse_spark.functions import similarity  # noqa: E402
from shortvideohybridanalyticslakehouse_spark.plans.queries_ext import (  # noqa: E402
    _COSINE_TOPK_ORACLE,
)


@register("embedding_cosine_topk_arrow", _COSINE_TOPK_ORACLE)
def q_cosine_topk_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 via Spark 4's ``mapInArrow`` — the third
    interchangeable plan for the same oracle (HOF baseline, mapInPandas
    GEMV, and now the pandas-free Arrow path: RecordBatch buffers
    flattened straight into one numpy reshape+GEMV, no Series
    materialization). Proves the engine can hold ONE output contract
    across three physical strategies spanning codegen and both Python
    lanes.
    """
    emb = load_table(spark, sf_dir, "embeddings", ensure_parallelism=True)
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").head()
    if qrow is None:  # fail loudly, not with an opaque TypeError
        raise ValueError(f"fixture has no query vector vec_id=0 under {sf_dir}")
    qvec = [float(x) for x in qrow[0]]
    corpus = emb.filter(F.col("vec_id") != 0)
    return similarity.cosine_topk_arrow(corpus, qvec, k=10)
