"""Extension queries, round 104: the corpus datasheet — the one-row
"datasheets for datasets" summary a training-data release ships with
(counts, composition, duplication, length profile), composed from the
same shared primitives as the per-source scorecard (ext99) so the two
cannot disagree. Every field is an exact integer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions import text
from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_DATASHEET_ORACLE = r"""
WITH norm AS (
  SELECT doc_id, source, lang, n_chars,
         md5(substr(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'),
                    1, 200)) AS pfp,
         len(regexp_split_to_array(lower(trim(text)), '\s+')) AS n_tokens
  FROM documents
), dup_fps AS (
  SELECT pfp FROM norm GROUP BY pfp HAVING count(*) >= 2
), lang_counts AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n FROM norm GROUP BY 1
), top_lang AS (
  SELECT lang, n FROM lang_counts ORDER BY n DESC, lang ASC LIMIT 1
), flagged AS (
  SELECT n.*, CASE WHEN d.pfp IS NOT NULL THEN 1 ELSE 0 END AS dup
  FROM norm n LEFT JOIN dup_fps d ON n.pfp = d.pfp
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       (SELECT lang FROM top_lang) AS top_lang,
       CAST((SELECT n FROM top_lang) * 1000000 // count(*) AS BIGINT)
         AS top_lang_share_micro,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       CAST(sum(n_chars) AS BIGINT) AS n_chars,
       CAST(sum(n_chars) // count(*) AS BIGINT) AS mean_chars,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars,
       CAST(sum(dup) AS BIGINT) AS n_dup_docs,
       CAST(sum(dup) * 1000000 // count(*) AS BIGINT) AS dup_rate_micro,
       CAST(sum(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS short_rate_micro
FROM flagged
"""


@register("corpus_datasheet", _DATASHEET_ORACLE)
def q_corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row dataset datasheet: docs / sources / languages (+ top
    language and its share), token and char totals, length extrema, and
    the prefix-fingerprint duplication and short-doc rates."""
    docs = load_table(spark, sf_dir, "documents")
    norm_txt = F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")
    norm = docs.select(
        "doc_id",
        "source",
        "lang",
        "n_chars",
        F.md5(F.substring(norm_txt, 1, 200)).alias("pfp"),
        text.token_count(F.col("text")).alias("n_tokens"),
    )
    dup_fps = (
        norm.groupBy("pfp")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= 2)
        .select("pfp", F.lit(1).alias("_dup"))
    )
    top_lang = F.broadcast(
        norm.groupBy("lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_tn"))
        .orderBy(F.desc("_tn"), F.asc("lang"))
        .limit(1)
        .select(
            F.col("lang").alias("top_lang"), F.col("_tn").alias("_top_n")
        )
    )
    flagged = norm.join(F.broadcast(dup_fps), "pfp", "left").select(
        "source",
        "lang",
        "n_chars",
        "n_tokens",
        F.coalesce(F.col("_dup"), F.lit(0)).alias("dup"),
    )
    n = F.count(F.lit(1))
    return (
        flagged.crossJoin(top_lang)
        .groupBy("top_lang", "_top_n")
        .agg(
            n.cast("bigint").alias("n_docs"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
            # Integer DIV mirrors the oracle's '//' (ext90/ext103 rule).
            F.expr("CAST(sum(n_chars) DIV count(1) AS BIGINT)").alias(
                "mean_chars"
            ),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
            F.sum("dup").cast("bigint").alias("n_dup_docs"),
            F.expr(
                "CAST((sum(dup) * 1000000) DIV count(1) AS BIGINT)"
            ).alias("dup_rate_micro"),
            F.expr(
                "CAST((sum(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END)"
                " * 1000000) DIV count(1) AS BIGINT)"
            ).alias("short_rate_micro"),
        )
        .select(
            "n_docs",
            "n_sources",
            "n_langs",
            "top_lang",
            F.expr(
                "CAST((_top_n * 1000000) DIV n_docs AS BIGINT)"
            ).alias("top_lang_share_micro"),
            "n_tokens",
            "n_chars",
            "mean_chars",
            "min_chars",
            "max_chars",
            "n_dup_docs",
            "dup_rate_micro",
            "short_rate_micro",
        )
    )
