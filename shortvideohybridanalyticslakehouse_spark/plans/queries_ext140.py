"""Extension queries, round 140: two corpus-freshness lanes.

1. shingle_temporal_novelty — per-source share of 8-token shingles
   whose FIRST occurrence (by doc_id order, the ingest order proxy) is
   in an earlier document: the "how much of this feed is recycled
   text" freshness monitor that complements the exact/near-dup lanes
   (novelty is per-shingle, so partial copying shows up even when no
   doc-level dup fires). First-seen = min(doc_id) per shingle — one
   aggregation; the re-join is the volume-build class, merge-pinned
   (the probed SHJ OOM family).
2. source_token_hhi — Herfindahl concentration of each source's token
   distribution and the effective vocabulary size 1/HHI (exp-entropy's
   robust cousin; a feed whose tokens concentrate on few types is
   boilerplate). HHI = sum (c/n)^2 computed EXACTLY as an integer
   cross-ratio: sum(c^2) * 1e9 // n^2 — no floats at all.
   The wide products ride DECIMAL(38,0) on the Spark side and HUGEINT
   in the oracle so neither engine wraps at 100-TB token counts (a
   single token with >~3e9 occurrences overflows c*c in int64, and
   sum(c^2)*1e9 wraps once sum(c^2) > ~9.2e9 — ADVICE r10 medium).
   Final quotients are bounded (hhi_nano <= 1e9, effective_types <=
   n_tokens, recycled_micro <= 1e6) so the closing BIGINT cast is
   always exact; Spark DIV and DuckDB // both truncate toward zero.

Plan shapes at 100 TB: novelty is two shingle-grain aggregations + one
merge join on the shingle key; HHI is a token-count aggregation with
integer arithmetic only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_SHINGLE_N = 8

_NOVELTY_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source,
         string_split(trim(lower(coalesce(text, ''))), ' ') AS ts
  FROM documents WHERE length(trim(lower(coalesce(text, '')))) > 0
), sh AS (
  SELECT DISTINCT doc_id, source,
         array_to_string(
           list_slice(ts, i, i + {_SHINGLE_N - 1}), ' ') AS shingle
  FROM (
    SELECT doc_id, source, ts,
           unnest(generate_series(1, len(ts) - {_SHINGLE_N - 1})) AS i
    FROM toks WHERE len(ts) >= {_SHINGLE_N}
  )
), first_seen AS (
  SELECT shingle, CAST(min(doc_id) AS BIGINT) AS first_doc
  FROM sh GROUP BY 1
)
SELECT s.source,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN f.first_doc < s.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_recycled,
       CAST(CAST(sum(CASE WHEN f.first_doc < s.doc_id THEN 1 ELSE 0 END)
                 AS HUGEINT)
            * 1000000 // count(*) AS BIGINT) AS recycled_micro
FROM sh s JOIN first_seen f ON f.shingle = s.shingle
GROUP BY 1
"""


@register("shingle_temporal_novelty", _NOVELTY_ORACLE)
def q_shingle_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source share of (distinct per-doc) 8-token shingles first
    seen in an EARLIER doc — recycled-text freshness monitor."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.trim(F.lower(F.coalesce(F.col("text"), F.lit(""))))
    toks = docs.filter(F.length(text) > 0).select(
        "doc_id", "source", F.split(text, " ", -1).alias("ts")
    )
    n = _SHINGLE_N
    sh = (
        toks.filter(F.size("ts") >= n)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ts") - (n - 1)),
                    lambda i: F.array_join(F.slice(F.col("ts"), i, n), " "),
                )
            ).alias("shingle"),
        )
        .distinct()
    )
    first_seen = sh.groupBy("shingle").agg(
        F.min("doc_id").cast("bigint").alias("first_doc")
    )
    # first_seen is the volume-build class (grows with distinct
    # shingles): merge pin, never a spill-less hash build
    return (
        sh.join(first_seen.hint("merge"), "shingle")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(
                F.when(F.col("first_doc") < F.col("doc_id"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_recycled"),
        )
        .select(
            "source",
            "n_shingles",
            "n_recycled",
            F.expr(
                "CAST(CAST(n_recycled AS DECIMAL(38,0)) * 1000000"
                " DIV n_shingles AS BIGINT)"
            ).alias("recycled_micro"),
        )
    )


_HHI_ORACLE = """
WITH occ AS (
  SELECT source, unnest(string_split(trim(lower(coalesce(text, ''))), ' '))
           AS tok
  FROM documents WHERE length(trim(lower(coalesce(text, '')))) > 0
), counts AS (
  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
  FROM occ GROUP BY 1, 2
)
SELECT source,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(sum(CAST(c AS HUGEINT) * c) * 1000000000
            // (CAST(sum(c) AS HUGEINT) * CAST(sum(c) AS HUGEINT))
            AS BIGINT) AS hhi_nano,
       CAST(CAST(sum(c) AS HUGEINT) * CAST(sum(c) AS HUGEINT)
            // sum(CAST(c AS HUGEINT) * c) AS BIGINT) AS effective_types
FROM counts GROUP BY 1
"""


@register("source_token_hhi", _HHI_ORACLE)
def q_source_token_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl token concentration per source and the effective
    vocabulary size 1/HHI — pure integer cross-ratios."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.trim(F.lower(F.coalesce(F.col("text"), F.lit(""))))
    occ = docs.filter(F.length(text) > 0).select(
        "source", F.explode(F.split(text, " ", -1)).alias("tok")
    )
    counts = occ.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    # c*c and the cross-products wrap in int64 at large corpora: ride
    # DECIMAL(38,0) (oracle: HUGEINT) so the ratios stay exact at any SF
    return (
        counts.groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
            F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias(
                "_sum_c2"
            ),
        )
        .select(
            "source",
            "n_tokens",
            "n_types",
            F.expr(
                "CAST(_sum_c2 * 1000000000"
                " DIV (CAST(n_tokens AS DECIMAL(38,0))"
                " * CAST(n_tokens AS DECIMAL(38,0))) AS BIGINT)"
            ).alias("hhi_nano"),
            F.expr(
                "CAST(CAST(n_tokens AS DECIMAL(38,0))"
                " * CAST(n_tokens AS DECIMAL(38,0))"
                " DIV _sum_c2 AS BIGINT)"
            ).alias("effective_types"),
        )
    )
