"""Extension queries, round 70: lagged cross-correlation between event
streams — "does click activity follow view activity, and at what
delay?" — the time-series diagnostic behind cadence tuning and
incident forensics.

Exactness: for each lag L in 0..5 minutes, Pearson correlation between
the per-minute count series x (views) and the L-shifted series y
(clicks) reduces to integer sums over the joined minutes:
    num   = n*sum(xy) - sum(x)*sum(y)
    den^2 = (n*sum(x^2) - sum(x)^2) * (n*sum(y^2) - sum(y)^2)
corr_micro = floor(1e6 * num / sqrt(den^2)): every operand is an exact
BIGINT; sqrt and divide are single correctly-rounded IEEE ops, so the
hash gate holds. The join aligning x_t with y_{t+L} is an equi-join on
the shifted minute — minutes explode per lag (6 rows each), shuffles
stay O(minutes * lags).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_MAX_LAG = 5

_LAGCORR_ORACLE = f"""
WITH x AS (
  SELECT date_trunc('minute', ts) AS minute, CAST(count(*) AS BIGINT) AS x
  FROM events WHERE event_type = 'view' GROUP BY 1
), y AS (
  SELECT date_trunc('minute', ts) AS minute, CAST(count(*) AS BIGINT) AS y
  FROM events WHERE event_type = 'click' GROUP BY 1
), lagged AS (
  SELECT CAST(l.lag AS INT) AS lag_minutes, x.x, y.y
  FROM unnest(range({_MAX_LAG + 1})) AS l(lag)
  JOIN x ON TRUE
  JOIN y ON y.minute = x.minute + to_minutes(CAST(l.lag AS BIGINT))
), sums AS (
  SELECT lag_minutes,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(y*y) AS BIGINT) AS syy,
         CAST(sum(x*y) AS BIGINT) AS sxy
  FROM lagged GROUP BY 1
)
SELECT lag_minutes, n,
  CASE WHEN (n*sxx - sx*sx) = 0 OR (n*syy - sy*sy) = 0 THEN NULL
       ELSE CAST(floor(CAST(n*sxy - sx*sy AS DOUBLE) * 1000000
            / sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
                   * CAST(n*syy - sy*sy AS DOUBLE))) AS BIGINT) END
    AS corr_micro
FROM sums
"""


@register("event_type_lag_correlation", _LAGCORR_ORACLE)
def q_event_type_lag_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of per-minute view counts against click
    counts shifted by 0..5 minutes — exact integer sums, one sqrt+divide
    per lag row."""
    ev = load_table(spark, sf_dir, "events")
    x = (
        ev.filter(F.col("event_type") == "view")
        .groupBy(F.date_trunc("minute", F.col("ts")).alias("minute"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    y = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(F.date_trunc("minute", F.col("ts")).alias("minute"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    lags = spark.range(_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag_minutes")
    )
    lagged = (
        x.crossJoin(F.broadcast(lags))
        .withColumn(
            "y_minute",
            F.col("minute")
            + F.make_interval(mins=F.col("lag_minutes")),
        )
        .join(y.withColumnRenamed("minute", "y_minute"), "y_minute")
    )
    sums = lagged.groupBy("lag_minutes").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return sums.select(
        "lag_minutes",
        "n",
        F.when((vx == 0) | (vy == 0), F.lit(None))
        .otherwise(
            F.floor(
                num.cast("double")
                * 1000000
                / F.sqrt(vx.cast("double") * vy.cast("double"))
            ).cast("bigint")
        )
        .alias("corr_micro"),
    )
