"""Extension queries, round 138: three corpus-profile lanes.

1. exact_dup_cluster_histogram — size histogram of the normalized-text
   sha256 duplicate groups (how much of the corpus is singletons vs
   2x/3x/... copies — the first number any dedup run reports).
2. fano_burstiness_by_type — Fano factor (variance/mean of per-minute
   event counts, zero minutes included via the bounded calendar) per
   event_type: >1 = bursty/clumped arrivals, ~1 = Poisson-like. Exact
   integer moments over the gap-filled minute grid, one micro-floored
   ratio.
3. doclen_percentile_bands_by_source — exact P10/P50/P90 token-length
   bands per source (the length-filter design input for curation),
   via the order-statistic window per source (bounded per-source
   partitions, the value_percentiles discipline).

Plan shapes at 100 TB: histogram is two hash aggregations; Fano is one
shuffle to (type, minute) + a broadcast 1-row calendar span; bands are
one per-source window over per-source partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_DUP_HIST_ORACLE = """
WITH hashed AS (
  SELECT sha256(trim(lower(coalesce(text, '')))) AS h
  FROM documents WHERE length(trim(lower(coalesce(text, '')))) > 0
), groups AS (
  SELECT h, CAST(count(*) AS BIGINT) AS group_size
  FROM hashed GROUP BY 1
)
SELECT group_size,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(count(*) * group_size AS BIGINT) AS n_docs
FROM groups GROUP BY 1
"""


@register("exact_dup_cluster_histogram", _DUP_HIST_ORACLE)
def q_exact_dup_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of sha256 duplicate-group sizes over normalized text."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.trim(F.lower(F.coalesce(F.col("text"), F.lit(""))))
    groups = (
        docs.filter(F.length(text) > 0)
        .select(F.sha2(text, 256).alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).cast("bigint").alias("group_size"))
    )
    return groups.groupBy("group_size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        (F.count(F.lit(1)) * F.col("group_size"))
        .cast("bigint")
        .alias("n_docs"),
    )


_FANO_ORACLE = """
WITH ev AS (
  SELECT event_type,
         date_diff('second', TIMESTAMP '1970-01-01', ts) // 60 AS minute
  FROM events
), span AS (
  SELECT min(minute) AS lo, max(minute) AS hi FROM ev
), counts AS (
  SELECT event_type, minute, CAST(count(*) AS BIGINT) AS c
  FROM ev GROUP BY 1, 2
), moments AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_active_minutes,
         CAST(sum(c) AS BIGINT) AS s1,
         CAST(sum(c * c) AS BIGINT) AS s2
  FROM counts GROUP BY 1
)
SELECT m.event_type,
       (s.hi - s.lo + 1) AS n_minutes,
       m.s1 AS n_events,
       CAST(floor(
         ((CAST(m.s2 AS DOUBLE) / (s.hi - s.lo + 1))
          - (CAST(m.s1 AS DOUBLE) / (s.hi - s.lo + 1))
            * (CAST(m.s1 AS DOUBLE) / (s.hi - s.lo + 1)))
         / (CAST(m.s1 AS DOUBLE) / (s.hi - s.lo + 1)) * 1000000.0
       ) AS BIGINT) AS fano_micro
FROM moments m CROSS JOIN span s
"""


@register("fano_burstiness_by_type", _FANO_ORACLE)
def q_fano_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor of per-minute counts per event_type over the full
    calendar span (zero minutes contribute via the closed-form moments:
    sum over the grid == sum over active minutes, so no gap-fill scan
    is needed — the zero rows add nothing to s1/s2)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.col("ts").cast("long") / 60).cast("bigint").alias("minute"),
    )
    span = F.broadcast(
        ev.agg(F.min("minute").alias("lo"), F.max("minute").alias("hi"))
    )
    counts = ev.groupBy("event_type", "minute").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    moments = counts.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active_minutes"),
        F.sum("c").cast("bigint").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("s2"),
    )
    n = F.col("hi") - F.col("lo") + 1
    mean = F.col("s1").cast("double") / n
    var = F.col("s2").cast("double") / n - mean * mean
    return moments.crossJoin(span).select(
        "event_type",
        n.alias("n_minutes"),
        F.col("s1").alias("n_events"),
        F.floor(var / mean * 1_000_000.0).cast("bigint").alias("fano_micro"),
    )


_BANDS_ORACLE = """
WITH docs AS (
  SELECT source,
         CAST(len(string_split(trim(lower(coalesce(text, ''))), ' '))
              AS BIGINT) AS w
  FROM documents WHERE length(trim(lower(coalesce(text, '')))) > 0
), ranked AS (
  SELECT source, w,
         row_number() OVER (PARTITION BY source ORDER BY w, source) AS rn,
         count(*) OVER (PARTITION BY source) AS n
  FROM docs
)
SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
       CAST(max(CASE WHEN rn = (n * 10 + 99) // 100 THEN w END) AS BIGINT)
         AS p10_tokens,
       CAST(max(CASE WHEN rn = (n * 50 + 99) // 100 THEN w END) AS BIGINT)
         AS p50_tokens,
       CAST(max(CASE WHEN rn = (n * 90 + 99) // 100 THEN w END) AS BIGINT)
         AS p90_tokens
FROM ranked GROUP BY 1
"""


@register("doclen_percentile_bands_by_source", _BANDS_ORACLE)
def q_doclen_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact P10/P50/P90 token-length order statistics per source
    (ceil-rank convention: rank = ceil(n*q/100), exact in integers)."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.trim(F.lower(F.coalesce(F.col("text"), F.lit(""))))
    w = F.size(F.split(text, " ", -1)).cast("bigint")
    base = docs.filter(F.length(text) > 0).select(
        "source", w.alias("w")
    )
    win = Window.partitionBy("source").orderBy("w", "source")
    cnt = Window.partitionBy("source")
    ranked = base.select(
        "source",
        "w",
        F.row_number().over(win).alias("rn"),
        F.count(F.lit(1)).over(cnt).alias("n"),
    )

    def pick(q: int):
        rank = F.expr(f"(n * {q} + 99) DIV 100")
        return (
            F.max(F.when(F.col("rn") == rank, F.col("w")))
            .cast("bigint")
            .alias(f"p{q}_tokens")
        )

    return ranked.groupBy("source").agg(
        F.max("n").cast("bigint").alias("n_docs"),
        pick(10),
        pick(50),
        pick(90),
    )
