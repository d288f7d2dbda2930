"""Extension queries, round 36: shingle-containment near-dup detection —
the ASYMMETRIC companion to Jaccard. Containment(A->B) = |A∩B| / |A|
catches quote/subset relationships (a doc embedded inside a larger one)
that symmetric Jaccard scores low because the size difference inflates
the union. Standard in corpus curation for detecting wholesale inclusion
(Broder's original resemblance/containment pair).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions.dedupfns import (
    hash60,
    shingles,
)
from shortvideohybridanalyticslakehouse_spark.plans.queries_ext import _duck_shingles
from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_CONTAINMENT_ORACLE = rf"""
WITH sh AS (
  SELECT doc_id, {_duck_shingles(3)} AS shs FROM documents
), sized AS (
  SELECT doc_id, len(shs) AS sh_size,
         CAST(('0x' || substr(md5(unnest(shs)), 1, 15)) AS BIGINT) AS shingle_h
  FROM sh
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.sh_size AS size_a, b.sh_size AS size_b,
         CAST(count(*) AS BIGINT) AS n_inter
  FROM sized a JOIN sized b
    ON a.shingle_h = b.shingle_h AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT doc_a, doc_b,
       round(n_inter / CAST(least(size_a, size_b) AS DOUBLE), 6)
         AS max_containment,
       round(n_inter / CAST(size_a + size_b - n_inter AS DOUBLE), 6)
         AS jaccard
FROM inter
ORDER BY max_containment DESC, doc_a ASC, doc_b ASC
LIMIT 20
"""


@register("containment_top_pairs", _CONTAINMENT_ORACLE)
def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 pairs by MAX directional containment (|A∩B| over the smaller
    shingle set), with Jaccard alongside to show the asymmetry. Same
    scale shape as exact_jaccard_pairs: distinct 3-gram shingles explode
    once, equi-join on the 60-bit shingle hash (8-byte shuffle keys,
    shuffle-hash hinted — never doc x doc), one grouped count. At corpus
    scale the pair feed comes from LSH candidates; note plain MinHash-LSH
    under-recalls high-containment/low-Jaccard pairs — the subset side's
    signature is dominated by the superset's vocabulary — so containment
    screens run on the shared-shingle join (as here) or containment-aware
    sketches.
    """
    docs = load_table(spark, sf_dir, "documents", ensure_parallelism=True)
    sh = docs.select(
        F.col("doc_id"), shingles(F.col("text"), 3).alias("sh")
    ).withColumn("sh_size", F.size("sh"))
    exploded = (
        sh.select("doc_id", "sh_size", F.explode("sh").alias("shingle"))
        .withColumn("shingle_h", hash60(F.col("shingle")))
        .drop("shingle")
    )
    a = exploded.alias("a")
    b = exploded.hint("shuffle_hash").alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle_h") == F.col("b.shingle_h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sh_size").alias("size_a"),
            F.col("b.sh_size").alias("size_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter")
                / F.least(F.col("size_a"), F.col("size_b")).cast("double"),
                6,
            ).alias("max_containment"),
            F.round(
                F.col("n_inter")
                / (F.col("size_a") + F.col("size_b") - F.col("n_inter")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
        .orderBy(
            F.col("max_containment").desc(),
            F.col("doc_a").asc(),
            F.col("doc_b").asc(),
        )
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Temperature-scaled mixture shares (tau-sampling)
# ---------------------------------------------------------------------------

_TEMP_MIX_ORACLE = """
WITH s AS (
  SELECT source,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
  FROM documents GROUP BY 1
), t AS (
  SELECT source, tokens,
         CAST(round(sqrt(CAST(tokens AS DOUBLE)), 6) AS DECIMAL(28,6)) AS powed,
         sum(tokens) OVER () AS tot_raw,
         sum(CAST(round(sqrt(CAST(tokens AS DOUBLE)), 6) AS DECIMAL(28,6)))
           OVER () AS tot_pow
  FROM s
)
SELECT source, tokens,
       round(CAST(tokens AS DOUBLE) / CAST(tot_raw AS DOUBLE), 6) AS raw_share,
       round(CAST(powed AS DOUBLE) / CAST(tot_pow AS DOUBLE), 6) AS temp_share
FROM t ORDER BY source
"""


@register("temperature_mixture_shares", _TEMP_MIX_ORACLE)
def q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled sampling shares (tau = 0.5, i.e. sqrt scaling —
    the multilingual/pretraining standard for upweighting small sources
    without letting any source dominate): share_i = tokens_i^tau / sum.
    Raw share shown beside for the flattening comparison. One scan, one
    O(sources) aggregate; the window totals run over the aggregated grain
    (O(sources) rows — a deliberate tiny-side window, not a data-scale
    one). Determinism: the raw total is an EXACT bigint sum; the
    temperature total quantizes each sqrt to DECIMAL(28,6) before summing
    so the cross-row accumulation is reassociation-safe — a plain double
    window sum would depend on partition order on both engines.
    """
    s = load_table(spark, sf_dir, "documents", ensure_parallelism=True).groupBy(
        "source"
    ).agg(
        F.sum(F.size(F.split(F.col("text"), " ")).cast("bigint")).alias("tokens")
    )
    from pyspark.sql import Window

    # O(sources)-row frame: single partition is the design; non-foldable
    # constant key silences the WindowExec warning.
    w = Window.partitionBy(F.col("tokens") * 0)
    powed = F.round(F.sqrt(F.col("tokens").cast("double")), 6).cast(
        "decimal(28,6)"
    )
    t = s.select(
        "source",
        "tokens",
        powed.alias("powed"),
        F.sum("tokens").over(w).alias("tot_raw"),
        F.sum(powed).over(w).alias("tot_pow"),
    )
    return t.select(
        "source",
        "tokens",
        F.round(
            F.col("tokens").cast("double") / F.col("tot_raw").cast("double"), 6
        ).alias("raw_share"),
        F.round(
            F.col("powed").cast("double") / F.col("tot_pow").cast("double"), 6
        ).alias("temp_share"),
    ).orderBy("source")
