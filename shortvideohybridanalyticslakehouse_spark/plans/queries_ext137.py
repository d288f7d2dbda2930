"""Extension queries, round 137: three sampling/strata lanes.

1. neyman_sample_allocation — optimal (Neyman) stratified-sample
   allocation of a 1000-doc budget across sources: n_h proportional to
   N_h * S_h where S_h is the stratum's doc-length stddev. The sampling
   design every corpus-curation pipeline computes before drawing; exact
   integer sums, one sqrt (IEEE correctly-rounded) per stratum,
   milli-floored weights, integer DIV allocation.
2. simpson_trend_inversion — Simpson's-paradox tripwire: the
   Cochran-Armitage-style purchase-trend numerator over 6-hour dose
   buckets, pooled AND within each day-of-week stratum; flags strata
   whose trend sign differs from the pooled sign. Exact integers until
   one micro-floored slope per stratum.
3. exact_dup_provenance_matrix — EXACT-duplicate mass across sources
   (sha256 groups; the byte-identical complement of ext41's MinHash
   near-dup cross_source_dup_matrix): for
   each unordered source pair, how many duplicate doc pairs share their
   normalized text hash (the provenance question behind cross-corpus
   dedup: which feeds copy from each other). Hash-group sizes per
   (text-hash, source), integer pair counts, no text re-comparison.

Plan shapes at 100 TB: Neyman/Simpson are single-scan integer rollups
to O(strata) rows; the dup matrix groups by sha2 then aggregates the
per-(hash, source) count vector — shuffle ∝ distinct texts, and the
per-hash source matrix is K^2-bounded with K = |sources|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_BUDGET = 1000

_NEYMAN_ORACLE = f"""
WITH docs AS (
  SELECT source,
         CAST(len(string_split(trim(lower(coalesce(text, ''))), ' '))
              AS BIGINT) AS w
  FROM documents WHERE length(trim(lower(coalesce(text, '')))) > 0
), strata AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_h,
         CAST(sum(w) AS BIGINT) AS s1,
         CAST(sum(w * w) AS BIGINT) AS s2
  FROM docs GROUP BY 1
), weighted AS (
  SELECT source, n_h,
         CAST(floor(n_h * sqrt(
           (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_h)
           / n_h) * 1000.0) AS BIGINT) AS w_milli
  FROM strata
), tot AS (
  SELECT CAST(sum(w_milli) AS BIGINT) AS w_tot FROM weighted
)
SELECT w.source, w.n_h, w.w_milli,
       CAST(w.w_milli * {_BUDGET} // t.w_tot AS BIGINT) AS n_alloc
FROM weighted w CROSS JOIN tot t
"""


@register("neyman_sample_allocation", _NEYMAN_ORACLE)
def q_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman allocation of a 1000-doc budget across sources by
    N_h * stddev(doc length); milli-floored weights, integer DIV."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.trim(F.lower(F.coalesce(F.col("text"), F.lit(""))))
    w = F.size(F.split(text, " ", -1)).cast("bigint")
    strata = (
        docs.filter(F.length(text) > 0)
        .select("source", w.alias("w"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_h"),
            F.sum("w").cast("bigint").alias("s1"),
            F.sum(F.col("w") * F.col("w")).cast("bigint").alias("s2"),
        )
    )
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1") / F.col("n_h")
    ) / F.col("n_h")
    weighted = strata.select(
        "source",
        "n_h",
        F.floor(F.col("n_h") * F.sqrt(var) * 1000.0)
        .cast("bigint")
        .alias("w_milli"),
    )
    tot = F.broadcast(
        weighted.agg(F.sum("w_milli").cast("bigint").alias("w_tot"))
    )
    return weighted.crossJoin(tot).select(
        "source",
        "n_h",
        "w_milli",
        F.expr(
            f"CAST(w_milli * {_BUDGET} DIV w_tot AS BIGINT)"
        ).alias("n_alloc"),
    )


_SIMPSON_ORACLE = """
WITH ev AS (
  SELECT CAST(strftime(ts, '%w') AS BIGINT) + 1 AS dow,
         CAST(extract(hour FROM ts) // 6 AS BIGINT) AS dose,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
  FROM events
), seg AS (
  SELECT dow, dose, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(conv) AS BIGINT) AS k
  FROM ev GROUP BY 1, 2
), strat AS (
  SELECT dow,
         CAST(sum(n) AS BIGINT) AS big_n, CAST(sum(k) AS BIGINT) AS big_k,
         CAST(sum(dose * k) AS BIGINT) AS sk,
         CAST(sum(dose * n) AS BIGINT) AS sn
  FROM seg GROUP BY 1
), per_stratum AS (
  SELECT dow, big_n, big_k,
         CAST(floor((CAST(sk AS DOUBLE)
                     - CAST(sn AS DOUBLE) * big_k / big_n)
                    / big_n * 1000000.0) AS BIGINT) AS trend_micro
  FROM strat
), pooled AS (
  SELECT CAST(floor((CAST(sum(dose * k) AS DOUBLE)
                     - CAST(sum(dose * n) AS DOUBLE)
                       * sum(k) / sum(n))
                    / sum(n) * 1000000.0) AS BIGINT) AS pooled_micro
  FROM seg
)
SELECT s.dow, s.big_n AS n_events, s.big_k AS n_purchases,
       s.trend_micro, p.pooled_micro,
       (CASE WHEN s.trend_micro >= 0 THEN 1 ELSE -1 END)
         <> (CASE WHEN p.pooled_micro >= 0 THEN 1 ELSE -1 END) AS inverted
FROM per_stratum s CROSS JOIN pooled p
"""


@register("simpson_trend_inversion", _SIMPSON_ORACLE)
def q_simpson_inversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day-of-week purchase-rate trend over dose buckets vs the
    pooled trend; flags sign inversions (Simpson's paradox)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.dayofweek("ts").cast("bigint").alias("dow"),
        (F.hour("ts") / 6).cast("bigint").alias("dose"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("conv"),
    )
    seg = ev.groupBy("dow", "dose").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("conv").cast("bigint").alias("k"),
    )
    strat = seg.groupBy("dow").agg(
        F.sum("n").cast("bigint").alias("big_n"),
        F.sum("k").cast("bigint").alias("big_k"),
        F.sum(F.col("dose") * F.col("k")).cast("bigint").alias("sk"),
        F.sum(F.col("dose") * F.col("n")).cast("bigint").alias("sn"),
    )
    trend = F.floor(
        (
            F.col("sk").cast("double")
            - F.col("sn").cast("double") * F.col("big_k") / F.col("big_n")
        )
        / F.col("big_n")
        * 1_000_000.0
    ).cast("bigint")
    pooled = F.broadcast(
        seg.agg(
            F.floor(
                (
                    F.sum(F.col("dose") * F.col("k")).cast("double")
                    - F.sum(F.col("dose") * F.col("n")).cast("double")
                    * F.sum("k")
                    / F.sum("n")
                )
                / F.sum("n")
                * 1_000_000.0
            )
            .cast("bigint")
            .alias("pooled_micro")
        )
    )
    sign = lambda c: F.when(c >= 0, 1).otherwise(-1)  # noqa: E731
    return (
        strat.select(
            "dow",
            F.col("big_n").alias("n_events"),
            F.col("big_k").alias("n_purchases"),
            trend.alias("trend_micro"),
        )
        .crossJoin(pooled)
        .withColumn(
            "inverted",
            sign(F.col("trend_micro")) != sign(F.col("pooled_micro")),
        )
    )


_DUP_MATRIX_ORACLE = """
WITH hashed AS (
  SELECT source, sha256(trim(lower(coalesce(text, '')))) AS h
  FROM documents WHERE length(trim(lower(coalesce(text, '')))) > 0
), per AS (
  SELECT h, source, CAST(count(*) AS BIGINT) AS c
  FROM hashed GROUP BY 1, 2
), pairs AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(sum(a.c * b.c) AS BIGINT) AS dup_pairs
  FROM per a JOIN per b ON a.h = b.h AND a.source < b.source
  GROUP BY 1, 2
), selfpairs AS (
  SELECT source AS source_a, source AS source_b,
         CAST(sum(c * (c - 1) / 2) AS BIGINT) AS dup_pairs
  FROM per GROUP BY 1
  HAVING sum(c * (c - 1) / 2) > 0
)
SELECT * FROM pairs
UNION ALL
SELECT * FROM selfpairs
"""


@register("exact_dup_provenance_matrix", _DUP_MATRIX_ORACLE)
def q_cross_source_dup_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact-duplicate pair counts between (and within) sources from
    the normalized-text sha256 groups — provenance matrix for
    cross-corpus dedup."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.trim(F.lower(F.coalesce(F.col("text"), F.lit(""))))
    hashed = docs.filter(F.length(text) > 0).select(
        "source", F.sha2(text, 256).alias("h")
    )
    per = hashed.groupBy("h", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    a = per.select(
        "h", F.col("source").alias("source_a"), F.col("c").alias("ca")
    )
    b = per.select(
        "h", F.col("source").alias("source_b"), F.col("c").alias("cb")
    )
    # per-hash source vectors grow with distinct texts: shuffle_hash
    cross = (
        a.join(b.hint("shuffle_hash"), "h")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("bigint").alias(
            "dup_pairs"
        ))
    )
    selfp = (
        per.groupBy(F.col("source").alias("source_a"))
        .agg(
            F.sum(F.col("c") * (F.col("c") - 1) / 2)
            .cast("bigint")
            .alias("dup_pairs")
        )
        .filter(F.col("dup_pairs") > 0)
        .select(
            "source_a", F.col("source_a").alias("source_b"), "dup_pairs"
        )
    )
    return cross.unionByName(selfp)
