"""Extension queries, round 53: KMV (k-minimum-values) audience-overlap
estimation — the distinct-INTERSECTION sketch HLL cannot provide.

A KMV sketch keeps the k smallest hash values of a set; because the
sketch IS a uniform sample of the distinct elements, two sketches
support set algebra: the union sketch is the k smallest of the merged
min-sets, Jaccard is estimated by the fraction of the union sketch
present in BOTH input sketches, and the intersection estimate is
jaccard * union_estimate (Beyer et al., "On Synopses for Distinct-Value
Estimation Under Multiset Operations", SIGMOD'07). Cardinality:
(k-1) * H / kth_min for sets larger than k, exact count below k.

Cross-engine determinism: the sketch content is pure integer top-k on
the md5 hash contract; the only float steps are single divisions of
exact integers (63 * 2^60 has 6 significant bits — exactly
representable; BIGINT->DOUBLE casts round-to-nearest identically in
both engines), rounded to 6 decimals.

Scale shape (100 TB): distinct (type, user) is one shuffle with
map-side combine; per-type top-k plans as WindowGroupLimit (partial
top-k BEFORE the per-type shuffle, so k rows per type per partition is
the shuffle volume, not the audience); everything after operates on
O(types * k) rows. The pair grid is O(types^2) broadcast rows. The
exact intersection (emitted for calibration) is the only
audience-sized join — a real deployment drops it and keeps only the
sketch path; it is oracle-shared here precisely to SHOW the estimator's
error against truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions.dedupfns import hash60
from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_K = 64
_H = 1 << 60  # hash60 range
_NUM = float((_K - 1) * _H)  # 63 * 2^60: 6 significant bits, float-exact

_KMV_ORACLE = rf"""
WITH du AS (
  SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS u FROM events
), h AS (
  SELECT event_type,
         CAST(('0x' || substr(md5(u), 1, 15)) AS BIGINT) AS h
  FROM du
), sk AS (
  SELECT event_type, h
  FROM (
    SELECT event_type, h,
           row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM h
  ) WHERE rn <= {_K}
), card AS (
  SELECT event_type, count(*) AS k_hit, max(h) AS kth
  FROM sk GROUP BY 1
), est AS (
  SELECT event_type,
         CASE WHEN k_hit < {_K} THEN CAST(k_hit AS DOUBLE)
              ELSE {_NUM!r} / CAST(kth AS DOUBLE) END AS est
  FROM card
), pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM (SELECT DISTINCT event_type FROM du) a
  JOIN (SELECT DISTINCT event_type FROM du) b
    ON a.event_type < b.event_type
), members AS (
  SELECT p.type_a, p.type_b, s.h,
         max(CASE WHEN s.event_type = p.type_a THEN 1 ELSE 0 END) AS in_a,
         max(CASE WHEN s.event_type = p.type_b THEN 1 ELSE 0 END) AS in_b
  FROM pairs p
  JOIN sk s ON s.event_type IN (p.type_a, p.type_b)
  GROUP BY 1, 2, 3
), uni AS (
  SELECT type_a, type_b, h, in_a, in_b,
         row_number() OVER (PARTITION BY type_a, type_b ORDER BY h) AS rn
  FROM members
), topu AS (
  SELECT type_a, type_b,
         count(*) AS ku, max(h) AS kth_u,
         sum(in_a * in_b) AS n_both
  FROM uni WHERE rn <= {_K}
  GROUP BY 1, 2
), stats AS (
  SELECT type_a, type_b, ku, n_both,
         CASE WHEN ku < {_K} THEN CAST(ku AS DOUBLE)
              ELSE {_NUM!r} / CAST(kth_u AS DOUBLE) END AS union_est,
         CAST(n_both AS DOUBLE) / ku AS jaccard_est
  FROM topu
), exact AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(count(*) AS BIGINT) AS n_exact_intersection
  FROM du a JOIN du b ON a.u = b.u AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT s.type_a, s.type_b,
       round(ea.est, 6) AS card_a_est,
       round(eb.est, 6) AS card_b_est,
       round(s.union_est, 6) AS union_est,
       round(s.jaccard_est, 6) AS jaccard_est,
       round(s.jaccard_est * s.union_est, 6) AS intersection_est,
       coalesce(x.n_exact_intersection, 0) AS n_exact_intersection
FROM stats s
JOIN est ea ON ea.event_type = s.type_a
JOIN est eb ON eb.event_type = s.type_b
LEFT JOIN exact x ON x.type_a = s.type_a AND x.type_b = s.type_b
"""


@register("kmv_audience_overlap", _KMV_ORACLE)
def q_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience overlap between event types from KMV sketches:
    per-type k-smallest hash sets (WindowGroupLimit partial top-k),
    union-sketch merge, Jaccard from union-sketch membership, and
    intersection = jaccard * union_est — with the exact intersection
    joined alongside for calibration."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        "event_type", F.col("user_id").cast("string").alias("u")
    ).distinct()
    h = du.select("event_type", hash60(F.col("u")).alias("h"))
    rn = F.row_number().over(
        Window.partitionBy("event_type").orderBy("h")
    )
    sk = h.withColumn("rn", rn).where(F.col("rn") <= _K).drop("rn")
    card = sk.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k_hit"), F.max("h").alias("kth")
    )
    est = card.select(
        "event_type",
        F.when(F.col("k_hit") < _K, F.col("k_hit").cast("double"))
        .otherwise(F.lit(_NUM) / F.col("kth").cast("double"))
        .alias("est"),
    )
    types = du.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("type_a"))
        .join(
            types.select(F.col("event_type").alias("type_b")),
            F.col("type_a") < F.col("type_b"),
        )
    )
    # membership per pair via two equi-joins (no OR-join): tag each
    # sketch row with the pair it reaches through side a / side b
    ma = F.broadcast(pairs).join(
        sk, sk["event_type"] == F.col("type_a")
    ).select("type_a", "type_b", "h", F.lit(1).alias("a"), F.lit(0).alias("b"))
    mb = F.broadcast(pairs).join(
        sk, sk["event_type"] == F.col("type_b")
    ).select("type_a", "type_b", "h", F.lit(0).alias("a"), F.lit(1).alias("b"))
    members = (
        ma.unionByName(mb)
        .groupBy("type_a", "type_b", "h")
        .agg(F.max("a").alias("in_a"), F.max("b").alias("in_b"))
    )
    rnu = F.row_number().over(
        Window.partitionBy("type_a", "type_b").orderBy("h")
    )
    topu = (
        members.withColumn("rn", rnu)
        .where(F.col("rn") <= _K)
        .groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).alias("ku"),
            F.max("h").alias("kth_u"),
            F.sum(F.col("in_a") * F.col("in_b")).alias("n_both"),
        )
    )
    stats = topu.select(
        "type_a",
        "type_b",
        F.when(F.col("ku") < _K, F.col("ku").cast("double"))
        .otherwise(F.lit(_NUM) / F.col("kth_u").cast("double"))
        .alias("union_est"),
        (F.col("n_both").cast("double") / F.col("ku")).alias("jaccard_est"),
    )
    exact = (
        du.alias("a")
        .join(
            du.alias("b"),
            (F.col("a.u") == F.col("b.u"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_exact_intersection"))
    )
    ea = est.select(F.col("event_type").alias("type_a"), F.col("est").alias("ea"))
    eb = est.select(F.col("event_type").alias("type_b"), F.col("est").alias("eb"))
    return (
        stats.join(F.broadcast(ea), "type_a")
        .join(F.broadcast(eb), "type_b")
        # LEFT: a pair with a disjoint audience must report 0, not vanish
        .join(exact, ["type_a", "type_b"], "left")
        .withColumn(
            "n_exact_intersection",
            F.coalesce(F.col("n_exact_intersection"), F.lit(0)).cast("bigint"),
        )
        .select(
            "type_a",
            "type_b",
            F.round("ea", 6).alias("card_a_est"),
            F.round("eb", 6).alias("card_b_est"),
            F.round("union_est", 6).alias("union_est"),
            F.round("jaccard_est", 6).alias("jaccard_est"),
            F.round(F.col("jaccard_est") * F.col("union_est"), 6).alias(
                "intersection_est"
            ),
            "n_exact_intersection",
        )
    )
