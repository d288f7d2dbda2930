"""Extension queries, round 55: hash-sampled quantile estimation — the
SQL-replayable counterpart of the quantile sketch, same upgrade the
round-5 HLL/CMS/KMV work gave approximate distinct/frequency counting.

Spark's percentile_approx (KLL-ish) is registered rows-only
(value_percentiles_approx) because its sketch internals are not
reproducible outside the JVM. This query takes the other classic route
to sublinear quantiles: a DETERMINISTIC Bernoulli row sample by 60-bit
key hash (hash60(event_id) % 20 == 0 -> a fixed, reproducible 5%
sample), exact interpolated percentiles over the sample, and the
absolute error against the full-data exact percentiles emitted
alongside. Every step is replayable, so the whole estimator sits under
the full value-hash gate — and the emitted errors make the
accuracy/cost trade-off inspectable instead of asserted.

Scale shape (100 TB): the sample predicate is a map-side filter pushed
against the scan (no shuffle added); the exact percentile over the 5%
sample sorts 1/20th of the data. The full-data exact percentiles are
emitted for calibration only — a production deployment drops that
branch and keeps the sample path (or Spark's percentile_approx where
cross-engine replay is not required).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions.dedupfns import hash60
from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_RATE = 20  # 1-in-20 deterministic sample

_QSAMPLE_ORACLE = rf"""
WITH s AS (
  SELECT value,
         CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))
              AS BIGINT) % {_RATE} = 0 AS sampled
  FROM events
), est AS (
  SELECT round(quantile_cont(value, 0.50), 6) AS p50_est,
         round(quantile_cont(value, 0.90), 6) AS p90_est,
         round(quantile_cont(value, 0.95), 6) AS p95_est,
         CAST(count(*) AS BIGINT) AS sample_rows
  FROM s WHERE sampled
), ex AS (
  SELECT round(quantile_cont(value, 0.50), 6) AS p50_exact,
         round(quantile_cont(value, 0.90), 6) AS p90_exact,
         round(quantile_cont(value, 0.95), 6) AS p95_exact,
         CAST(count(*) AS BIGINT) AS total_rows
  FROM s
)
SELECT sample_rows, total_rows,
       p50_est, p50_exact, round(abs(p50_est - p50_exact), 6) AS p50_abs_err,
       p90_est, p90_exact, round(abs(p90_est - p90_exact), 6) AS p90_abs_err,
       p95_est, p95_exact, round(abs(p95_est - p95_exact), 6) AS p95_abs_err
FROM est CROSS JOIN ex
"""


@register("quantile_hash_sample_estimate", _QSAMPLE_ORACLE)
def q_quantile_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5% hash sample -> exact interpolated percentiles on
    the sample, calibrated against the full-data exact percentiles. The
    sample predicate is a narrow map-side filter; both aggregates are
    single-row, crossJoined as broadcast scalar anchors."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.select(
        "value",
        (hash60(F.col("event_id").cast("string")) % _RATE == 0).alias(
            "sampled"
        ),
    )
    est = s.where("sampled").agg(
        F.round(F.expr("percentile(value, 0.50D)"), 6).alias("p50_est"),
        F.round(F.expr("percentile(value, 0.90D)"), 6).alias("p90_est"),
        F.round(F.expr("percentile(value, 0.95D)"), 6).alias("p95_est"),
        F.count(F.lit(1)).alias("sample_rows"),
    )
    ex = s.agg(
        F.round(F.expr("percentile(value, 0.50D)"), 6).alias("p50_exact"),
        F.round(F.expr("percentile(value, 0.90D)"), 6).alias("p90_exact"),
        F.round(F.expr("percentile(value, 0.95D)"), 6).alias("p95_exact"),
        F.count(F.lit(1)).alias("total_rows"),
    )
    out = est.crossJoin(F.broadcast(ex))
    return out.select(
        "sample_rows",
        "total_rows",
        "p50_est",
        "p50_exact",
        F.round(F.abs(F.col("p50_est") - F.col("p50_exact")), 6).alias(
            "p50_abs_err"
        ),
        "p90_est",
        "p90_exact",
        F.round(F.abs(F.col("p90_est") - F.col("p90_exact")), 6).alias(
            "p90_abs_err"
        ),
        "p95_est",
        "p95_exact",
        F.round(F.abs(F.col("p95_est") - F.col("p95_exact")), 6).alias(
            "p95_abs_err"
        ),
    )
