"""Extension queries, round 52: cross-engine-replayable sketches —
from-scratch HyperLogLog and Count-Min over the repo's md5 hash
contract (functions/sketches.py).

Why this exists when `approx_count_distinct` is already registered
(weekly_hll_union_estimate, rows-only check): Spark's built-in HLL++ is
a JVM black box no oracle can replay, so its correctness gate is weak.
These sketches are built register-by-register from SQL-expressible
integers, so the ENTIRE sketch pipeline — hashing, register build,
cross-group merge, the estimator, even the small-range correction
branch — is verified hash-exact against DuckDB. That upgrades
"approximate distinct / approximate frequency" from rows-only to a
full-value correctness gate, and demonstrates the mergeability law
(HLL union == elementwise register max) that makes sketches shardable
at 100 TB.

Float determinism: register sums are INTEGER sums of powers of two
(never float accumulation, whose rounding is order-dependent); the
estimator then performs single IEEE ops on identical exact inputs and
rounds to 6 decimals. The correction-branch predicate compares doubles
derived from the same exact integers, so both engines take the same
branch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions import sketches
from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_SCALE = sketches.HLL_ALPHA * sketches.HLL_M * sketches.HLL_M * float(
    1 << (sketches.HLL_W + 1)
)

_HLL_ORACLE = rf"""
WITH e AS (
  SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week_label,
         CAST(user_id AS VARCHAR) AS u
  FROM events
), h AS (
  SELECT week_label, u,
         CAST(('0x' || substr(md5(u), 1, 15)) AS BIGINT) AS h
  FROM e
), rho AS (
  SELECT week_label,
         CAST(h % {sketches.HLL_M} AS INT) AS bucket,
         CASE WHEN (h >> {sketches.HLL_P}) = 0 THEN {sketches.HLL_W + 1}
              ELSE CAST(round(log2((h >> {sketches.HLL_P})
                                   & -(h >> {sketches.HLL_P}))) AS INT) + 1
         END AS rho
  FROM h
), regs_w AS (
  SELECT week_label, bucket, max(rho) AS rho FROM rho GROUP BY 1, 2
), regs AS (
  SELECT * FROM regs_w
  UNION ALL
  SELECT 'ALL' AS week_label, bucket, max(rho) AS rho
  FROM regs_w GROUP BY bucket
), agg AS (
  SELECT week_label,
         CAST(count(*) AS BIGINT) AS n_registers_hit,
         sum(CAST(1 AS BIGINT) << ({sketches.HLL_W + 1} - rho)) AS s_hit
  FROM regs GROUP BY 1
), est AS (
  SELECT week_label, n_registers_hit,
         {sketches.HLL_M} - n_registers_hit AS zeros,
         {_SCALE!r} / CAST(
           s_hit + ({sketches.HLL_M} - n_registers_hit)
                   * (CAST(1 AS BIGINT) << {sketches.HLL_W + 1})
           AS DOUBLE) AS raw
  FROM agg
), ex AS (
  SELECT week_label, CAST(count(DISTINCT u) AS BIGINT) AS n_exact
  FROM e GROUP BY 1
  UNION ALL
  SELECT 'ALL', CAST(count(DISTINCT u) AS BIGINT) FROM e
)
SELECT est.week_label, n_exact, n_registers_hit,
       round(CASE WHEN raw <= {2.5 * sketches.HLL_M!r} AND zeros > 0
                  THEN {float(sketches.HLL_M)!r}
                       * ln({float(sketches.HLL_M)!r} / zeros)
                  ELSE raw END, 6) AS hll_estimate
FROM est JOIN ex ON ex.week_label = est.week_label
"""


@register("hll_weekly_users_sketch", _HLL_ORACLE)
def q_hll_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly distinct-user HLL built register-by-register, merged into
    an 'ALL' row by elementwise register max (the sketch-union law), and
    estimated with the standard alpha_m / linear-counting estimator —
    every step hash-verified against the oracle, with the exact distinct
    count alongside for calibration."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        F.date_format(F.date_trunc("week", F.col("ts")), "yyyy-MM-dd").alias(
            "week_label"
        ),
        F.col("user_id").cast("string").alias("u"),
    )
    regs_w = sketches.hll_registers(e, ["week_label"], F.col("u"))
    regs_all = (
        regs_w.groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
        .select(F.lit("ALL").alias("week_label"), "bucket", "rho")
    )
    est = sketches.hll_estimate(
        regs_w.unionByName(regs_all), ["week_label"]
    )
    exact = e.groupBy("week_label").agg(
        F.countDistinct("u").alias("n_exact")
    ).unionByName(
        e.agg(F.countDistinct("u").alias("n_exact")).select(
            F.lit("ALL").alias("week_label"), "n_exact"
        )
    )
    return est.join(exact, "week_label").select(
        "week_label", "n_exact", "n_registers_hit", "hll_estimate"
    )


_CMS_A_SQL = "[" + ", ".join(str(a) for a in sketches.CMS_A) + "]"
_CMS_B_SQL = "[" + ", ".join(str(b) for b in sketches.CMS_B) + "]"

_CMS_ORACLE = rf"""
WITH tok AS (
  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
  FROM documents
), cnt AS (
  SELECT term, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1
), top AS (
  SELECT term, c FROM cnt ORDER BY c DESC, term LIMIT 20
), th AS (
  SELECT term,
         CAST(('0x' || substr(md5(term), 1, 15)) AS BIGINT)
           % {sketches.CMS_P} AS hm
  FROM tok
), cells AS (
  SELECT CAST(u.i AS INT) AS row,
         CAST((({_CMS_A_SQL}[CAST(u.i AS INT) + 1] * hm
                + {_CMS_B_SQL}[CAST(u.i AS INT) + 1])
               % {sketches.CMS_P}) % {sketches.CMS_W} AS INT) AS bucket
  FROM th, unnest(range({sketches.CMS_D})) AS u(i)
), counters AS (
  SELECT row, bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM cells GROUP BY 1, 2
), probes AS (
  SELECT t.term, t.c, CAST(u.i AS INT) AS row,
         CAST((({_CMS_A_SQL}[CAST(u.i AS INT) + 1]
                * (CAST(('0x' || substr(md5(t.term), 1, 15)) AS BIGINT)
                   % {sketches.CMS_P})
                + {_CMS_B_SQL}[CAST(u.i AS INT) + 1])
               % {sketches.CMS_P}) % {sketches.CMS_W} AS INT) AS bucket
  FROM top t, unnest(range({sketches.CMS_D})) AS u(i)
)
SELECT p.term AS term, p.c AS true_count,
       min(co.cnt) AS cms_estimate,
       min(co.cnt) - p.c AS overestimate
FROM probes p JOIN counters co USING (row, bucket)
GROUP BY 1, 2
"""


@register("cms_term_frequency_audit", _CMS_ORACLE)
def q_cms_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency audit: one pass builds the d x w integer
    counter matrix (map-side transform+explode, single partial-agg
    shuffle to 2048 cells); the true top-20 terms are then point-queried
    against the broadcast counters. `overestimate >= 0` is the CMS
    guarantee, visible in the output and asserted in tests."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        ).alias("term")
    )
    counters = sketches.cms_counters(tok, "term")
    top = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("term"))
        .limit(20)
    )
    est = sketches.cms_point_estimates(top, counters, "term")
    return top.join(est, "term").select(
        "term",
        F.col("c").alias("true_count"),
        "cms_estimate",
        (F.col("cms_estimate") - F.col("c")).alias("overestimate"),
    )
