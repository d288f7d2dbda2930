"""Extension queries, round 29: winsorized / trimmed group statistics —
the robust-mean family every metrics pipeline needs when a few extreme
values (bot bursts, price glitches) poison plain averages.

Determinism discipline: the p5/p95 clamp bounds are exact percentiles
rounded to 6 decimals on BOTH engines before any comparison, and the
clamped values are summed as DECIMAL(18,6) (order-independent exact sum)
before one double division — the same cross-engine rules the flagship
thresholds use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_ORACLE = """
WITH b AS (
  SELECT event_type,
    round(quantile_cont(value, 0.05), 6) AS lo,
    round(quantile_cont(value, 0.95), 6) AS hi
  FROM events WHERE value IS NOT NULL GROUP BY event_type
), clamped AS (
  SELECT e.event_type,
    CAST(CASE WHEN e.value < b.lo THEN b.lo
              WHEN e.value > b.hi THEN b.hi
              ELSE e.value END AS DECIMAL(18,6)) AS wv,
    CASE WHEN e.value >= b.lo AND e.value <= b.hi
         THEN CAST(e.value AS DECIMAL(18,6)) END AS tv,
    CASE WHEN e.value < b.lo OR e.value > b.hi THEN 1 ELSE 0 END AS is_out
  FROM events e JOIN b USING (event_type)
  WHERE e.value IS NOT NULL
)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n,
  round(CAST(sum(wv) AS DOUBLE) / count(*), 6) AS winsorized_mean,
  round(CAST(sum(tv) AS DOUBLE) / count(tv), 6) AS trimmed_mean,
  CAST(sum(is_out) AS BIGINT) AS n_outliers
FROM clamped
GROUP BY event_type
"""


@register("event_value_trimmed_stats", _ORACLE)
def q_event_value_trimmed_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: 5% winsorized mean (outliers clamped to the rounded
    p5/p95 bounds), 90% trimmed mean (outliers dropped), and the outlier
    count. Bounds come from one tiny per-group aggregate broadcast back
    onto the fact — the group-stats side is ALWAYS broadcastable
    (O(groups) rows), so the fact streams once.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    bounds = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.05D)"), 6).alias("lo"),
        F.round(F.expr("percentile(value, 0.95D)"), 6).alias("hi"),
    )
    j = ev.join(F.broadcast(bounds), "event_type")
    wv = (
        F.when(F.col("value") < F.col("lo"), F.col("lo"))
        .when(F.col("value") > F.col("hi"), F.col("hi"))
        .otherwise(F.col("value"))
        .cast("decimal(18,6)")
    )
    tv = F.when(
        (F.col("value") >= F.col("lo")) & (F.col("value") <= F.col("hi")),
        F.col("value").cast("decimal(18,6)"),
    )
    is_out = F.when(
        (F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")), 1
    ).otherwise(0)
    return (
        j.select("event_type", wv.alias("wv"), tv.alias("tv"), is_out.alias("is_out"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum("wv").cast("double") / F.count(F.lit(1)), 6
            ).alias("winsorized_mean"),
            F.round(F.sum("tv").cast("double") / F.count("tv"), 6).alias(
                "trimmed_mean"
            ),
            F.sum("is_out").cast("bigint").alias("n_outliers"),
        )
    )
