"""Extension queries, round 98: pipeline-engineering audits — the gold
rollup cascade (re-aggregation associativity, the serving cascade
shape), normalized exact dedup, the event-time disorder audit behind
watermark sizing, and the partition-skew audit behind salting decisions.

All four are exact-integer (counts, cents, packed keys); the only
doubles are final cast-divide-round(6) ratios.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_CASCADE_ORACLE = """
WITH minute_gold AS (
  SELECT event_type, date_trunc('minute', ts) AS m,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
)
SELECT event_type, date_trunc('hour', m) AS h,
       CAST(sum(n) AS BIGINT) AS n_events,
       CAST(sum(cents) AS BIGINT) AS cents,
       CAST(count(*) AS BIGINT) AS minutes_present,
       CAST(max(n) AS BIGINT) AS peak_minute_events
FROM minute_gold GROUP BY 1, 2
"""


@register("gold_hourly_rollup_cascade", _CASCADE_ORACLE)
def q_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly gold re-aggregated FROM the minute gold grain (the serving
    cascade: events -> minute -> hour -> day reuses partial aggregates
    instead of rescanning events). The oracle derives the same hourly
    frame through the identical two-stage cascade — equality proves the
    re-agg decomposition (sum-of-sums, max-of-maxes, count-of-groups) is
    lossless. Cents stay integers through both hops."""
    ev = load_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    minute_gold = ev.groupBy(
        "event_type", F.date_trunc("minute", F.col("ts")).alias("m")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(cents).cast("bigint").alias("cents"),
    )
    return minute_gold.groupBy(
        "event_type", F.date_trunc("hour", F.col("m")).alias("h")
    ).agg(
        F.sum("n").cast("bigint").alias("n_events"),
        F.sum("cents").cast("bigint").alias("cents"),
        F.count(F.lit(1)).cast("bigint").alias("minutes_present"),
        F.max("n").cast("bigint").alias("peak_minute_events"),
    )


_NORM_DEDUP_ORACLE = """
WITH norm AS (
  SELECT doc_id, source,
         md5(substr(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'),
                    1, 200)) AS pfp,
         md5(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS ffp
  FROM documents
)
SELECT pfp,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS canonical_doc,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(count(DISTINCT ffp) AS BIGINT) AS n_full_variants
FROM norm GROUP BY pfp HAVING count(*) >= 2
"""


@register("normalized_dedup_groups", _NORM_DEDUP_ORACLE)
def q_normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-fingerprint dedup after text normalization (casefold +
    collapse every non-alphanumeric run to one space, first 200 chars —
    the boilerplate/mirror-page pattern where copies diverge only in the
    tail). Each group also counts its FULL-normalized-text variants:
    n_full_variants = 1 means the whole docs are identical after
    normalization, > 1 means prefix-only duplication. Smallest doc_id
    canonical — the standard keep-one policy."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")
    return (
        docs.select(
            F.md5(F.substring(norm, 1, 200)).alias("pfp"),
            F.md5(norm).alias("ffp"),
            "doc_id",
            "source",
        )
        .groupBy("pfp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("canonical_doc"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
            F.countDistinct("ffp").cast("bigint").alias("n_full_variants"),
        )
        .filter(F.col("n_docs") >= 2)
    )


_DISORDER_ORACLE = """
WITH seq AS (
  SELECT user_id,
         date_diff('second', TIMESTAMP '1970-01-01', ts) AS sec,
         lag(date_diff('second', TIMESTAMP '1970-01-01', ts))
           OVER (PARTITION BY user_id ORDER BY event_id) AS prev_sec
  FROM events
), pairs AS (
  SELECT CASE WHEN sec < prev_sec THEN 1 ELSE 0 END AS inverted,
         CASE WHEN sec < prev_sec THEN prev_sec - sec ELSE 0 END AS lateness
  FROM seq WHERE prev_sec IS NOT NULL
)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(inverted) AS BIGINT) AS n_inverted,
       CAST(sum(inverted) * 1000000 // count(*) AS BIGINT)
         AS disorder_rate_micro,
       CAST(max(lateness) AS BIGINT) AS max_lateness_sec,
       CAST(coalesce(max(CASE WHEN inverted = 1 THEN lateness END), 0)
            AS BIGINT) AS p100_lateness_sec
FROM pairs
"""


@register("event_time_disorder_audit", _DISORDER_ORACLE)
def q_disorder_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-sizing audit: treating event_id as per-user arrival
    order, how often does event time run BACKWARDS between consecutive
    arrivals, and by how much — max lateness bounds the
    withWatermark/delayThreshold a streaming twin needs for zero drops
    (the T7 late-data policy, measured from data instead of guessed)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("long")
    w = Window.partitionBy("user_id").orderBy("event_id")
    seq = ev.select(
        sec.alias("sec"), F.lag(sec).over(w).alias("prev_sec")
    ).filter(F.col("prev_sec").isNotNull())
    inv = F.when(F.col("sec") < F.col("prev_sec"), 1).otherwise(0)
    late = F.when(
        F.col("sec") < F.col("prev_sec"), F.col("prev_sec") - F.col("sec")
    ).otherwise(F.lit(0))
    return seq.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(inv).cast("bigint").alias("n_inverted"),
        F.max(late).cast("bigint").alias("max_lateness_sec"),
        F.coalesce(F.max(F.when(inv == 1, late)), F.lit(0))
        .cast("bigint")
        .alias("p100_lateness_sec"),
    ).select(
        "n_pairs",
        "n_inverted",
        # Integer DIV mirrors the oracle's '//' (ext90/ext103 rule).
        F.expr(
            "CAST((n_inverted * 1000000) DIV n_pairs AS BIGINT)"
        ).alias("disorder_rate_micro"),
        "max_lateness_sec",
        "p100_lateness_sec",
    )


_N_BUCKETS = 64

_SKEW_ORACLE = f"""
WITH bucketed AS (
  SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) % {_N_BUCKETS} AS b,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
), packed AS (
  SELECT CAST(count(*) AS BIGINT) AS n_buckets,
         CAST(max(c) AS BIGINT) AS max_count,
         CAST(min(c) AS BIGINT) AS min_count,
         CAST(sum(c) AS BIGINT) AS total,
         list(c ORDER BY c) AS cs
  FROM bucketed
)
SELECT n_buckets, max_count, min_count, total,
       CAST(cs[(n_buckets + 1) // 2] AS BIGINT) AS median_count,
       CAST(max_count * 1000000 // cs[(n_buckets + 1) // 2] AS BIGINT)
         AS skew_ratio_micro
FROM packed
"""


@register("partition_skew_audit", _SKEW_ORACLE)
def q_partition_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew audit for the hash contract's 64-bucket
    user partitioning: per-bucket row counts, the lower-median (exact,
    picked from a bounded sorted array — no percentile_approx), and
    max/median as the salting decision ratio. The bucket frame is
    O(n_buckets), so the median comes from one packed array, not a
    global sort."""
    from shortvideohybridanalyticslakehouse_spark.functions.dedupfns import hash60

    ev = load_table(spark, sf_dir, "events")
    bucketed = ev.groupBy(
        (hash60(F.col("user_id").cast("string")) % _N_BUCKETS).alias("b")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    packed = bucketed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.max("c").cast("bigint").alias("max_count"),
        F.min("c").cast("bigint").alias("min_count"),
        F.sum("c").cast("bigint").alias("total"),
        F.array_sort(F.collect_list("c")).alias("cs"),
    )
    med = F.element_at(
        F.col("cs"), ((F.col("n_buckets") + 1) / 2).cast("int")
    )
    return packed.select(
        "n_buckets",
        "max_count",
        "min_count",
        "total",
        med.cast("bigint").alias("median_count"),
        F.expr(
            "CAST((max_count * 1000000)"
            " DIV element_at(cs, CAST((n_buckets + 1) / 2 AS INT))"
            " AS BIGINT)"
        ).alias("skew_ratio_micro"),
    )
