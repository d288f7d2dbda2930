"""Extension queries, round 67: forecast backtesting and distribution
drift — the model-evaluation analytics that close the loop on the
anomaly/monitoring family (queries_ext45). Both keep every statistic in
exact integer cross-products; the only floats are single IEEE divisions
on exact operands.

- hourly_forecast_backtest: a seasonal-naive forecast (per event_type x
  hour-of-day mean count over the training span = everything before the
  final day) backtested against the held-out last day. Forecast means
  are exact rationals carried as (sum, n) pairs; the absolute error
  |forecast - actual| cross-multiplies to |sum - actual*n| / n, summed
  in micro units. One combinable groupBy each for train and test; the
  backtest joins O(types x 24) frames.

- value_distribution_drift_tv: total-variation distance between the
  first-half and second-half event-value distributions over 10
  equi-width bins: TV = sum |c_a*N_b - c_b*N_a| / (2*N_a*N_b) — the
  ln-free drift statistic (PSI needs a log, which is not bit-stable
  across engines; TV is, and it bounds every f-divergence-derived
  detector's decision). Bin edges from the GLOBAL min/max so both
  halves share the grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_BACKTEST_ORACLE = """
WITH bounds AS (
  SELECT date_trunc('day', max(ts)) AS test_day FROM events
), train AS (
  SELECT event_type,
         CAST(strftime(ts, '%H') AS INT) AS hod,
         date_trunc('hour', ts) AS hr,
         count(*) AS c
  FROM events, bounds WHERE ts < test_day
  GROUP BY 1, 2, 3
), model AS (
  SELECT event_type, hod,
         CAST(sum(c) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n_hours
  FROM train GROUP BY 1, 2
), actual AS (
  SELECT event_type,
         CAST(strftime(ts, '%H') AS INT) AS hod,
         CAST(count(*) AS BIGINT) AS y
  FROM events, bounds WHERE ts >= test_day
  GROUP BY 1, 2
), joined AS (
  SELECT a.event_type, a.hod, a.y, m.s, m.n_hours,
         abs(m.s - a.y * m.n_hours) AS err_num
  FROM actual a JOIN model m
    ON m.event_type = a.event_type AND m.hod = a.hod
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_hours_scored,
       CAST(sum(y) AS BIGINT) AS actual_events,
       CAST(sum(CAST(floor(CAST(err_num AS DOUBLE) * 1000000
                / CAST(n_hours AS DOUBLE)) AS BIGINT)) AS BIGINT)
         AS mae_micro_sum
FROM joined GROUP BY 1
"""


@register("hourly_forecast_backtest", _BACKTEST_ORACLE)
def q_hourly_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive backtest: per (type, hour-of-day) training-mean
    count vs the held-out final day; per-hour absolute errors in exact
    micro units (floor of one IEEE division per scored hour, summed as
    integers)."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(F.date_trunc("day", F.max("ts")).alias("test_day"))
    with_day = ev.crossJoin(F.broadcast(bounds))
    train = (
        with_day.filter(F.col("ts") < F.col("test_day"))
        .groupBy(
            "event_type",
            F.hour("ts").alias("hod"),
            F.date_trunc("hour", F.col("ts")).alias("hr"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    model = train.groupBy("event_type", "hod").agg(
        F.sum("c").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
    )
    actual = (
        with_day.filter(F.col("ts") >= F.col("test_day"))
        .groupBy("event_type", F.hour("ts").alias("hod"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    joined = actual.join(model, ["event_type", "hod"]).withColumn(
        "err_num", F.abs(F.col("s") - F.col("y") * F.col("n_hours"))
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours_scored"),
        F.sum("y").cast("bigint").alias("actual_events"),
        F.sum(
            F.floor(
                F.col("err_num").cast("double")
                * 1000000
                / F.col("n_hours").cast("double")
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("mae_micro_sum"),
    )


_DRIFT_ORACLE = """
WITH span AS (
  SELECT min(CAST(floor(epoch(ts)) AS BIGINT)) AS e0,
         max(CAST(floor(epoch(ts)) AS BIGINT)) AS e1,
         min(value) AS v0, max(value) AS v1
  FROM events WHERE value IS NOT NULL
), tagged AS (
  SELECT CASE WHEN 2 * CAST(floor(epoch(ts)) AS BIGINT) < e0 + e1
              THEN 0 ELSE 1 END AS half,
         least(CAST(floor((value - v0) * 10 / nullif(v1 - v0, 0)) AS INT), 9)
           AS bin
  FROM events, span WHERE value IS NOT NULL
), cells AS (
  SELECT bin,
    CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
    CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_b
  FROM tagged GROUP BY 1
), halves AS (
  SELECT CAST(sum(c_a) AS BIGINT) AS n_a, CAST(sum(c_b) AS BIGINT) AS n_b
  FROM cells
), tot AS (
  SELECT h.n_a, h.n_b,
         CAST(sum(abs(c.c_a * h.n_b - c.c_b * h.n_a)) AS DECIMAL(38,0)) AS num
  FROM cells c CROSS JOIN halves h
  GROUP BY h.n_a, h.n_b
)
SELECT n_a, n_b,
       CAST(floor(CAST(num AS DOUBLE) * 1000000
            / CAST(CAST(n_a AS DECIMAL(38,0)) * n_b * 2 AS DOUBLE)) AS BIGINT)
         AS tv_micro
FROM tot
"""


@register("value_distribution_drift_tv", _DRIFT_ORACLE)
def q_value_drift_tv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-variation drift between first-half and second-half event
    values over a shared 10-bin equi-width grid (exact integer
    cross-products; one IEEE division)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    span = ev.agg(
        F.min(F.col("ts").cast("long")).alias("e0"),
        F.max(F.col("ts").cast("long")).alias("e1"),
        F.min("value").alias("v0"),
        F.max("value").alias("v1"),
    )
    tagged = ev.crossJoin(F.broadcast(span)).select(
        F.when(
            2 * F.col("ts").cast("long") < F.col("e0") + F.col("e1"), F.lit(0)
        )
        .otherwise(F.lit(1))
        .alias("half"),
        F.least(
            F.floor(
                (F.col("value") - F.col("v0"))
                * 10
                / F.nullif(F.col("v1") - F.col("v0"), F.lit(0))
            ).cast("int"),
            F.lit(9),
        ).alias("bin"),
    )
    cells = tagged.groupBy("bin").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("c_a"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("c_b"),
    )
    halves = cells.agg(
        F.sum("c_a").cast("bigint").alias("n_a"),
        F.sum("c_b").cast("bigint").alias("n_b"),
    )
    dec = "decimal(38,0)"
    tot = (
        cells.crossJoin(F.broadcast(halves))
        .groupBy("n_a", "n_b")
        .agg(
            F.sum(
                F.abs(F.col("c_a") * F.col("n_b") - F.col("c_b") * F.col("n_a"))
            )
            .cast(dec)
            .alias("num")
        )
    )
    return tot.select(
        "n_a",
        "n_b",
        F.floor(
            F.col("num").cast("double")
            * 1000000
            / (F.col("n_a").cast(dec) * F.col("n_b").cast(dec) * 2).cast("double")
        )
        .cast("bigint")
        .alias("tv_micro"),
    )
