"""Extension queries, round 86: TIME-DECAY multi-touch attribution — the
recency-weighted companion to ext65's U-shaped model, completing the
standard attribution pair (position-based + time-decay) every marketing
warehouse ships.

Weight model chosen for EXACT integer replay (no pow(), whose libm
rounding differs across engines): a click h whole hours before the
purchase earns weight w = floor(1e6 / (1 + h)) — reciprocal-hours decay.
Each purchase then distributes exactly 1,000,000 micro-credits over its
prior-3-day clicks proportionally: credit_i = floor(1e6 * w_i / W), with
the remainder pinned to the MOST RECENT click (latest ts, then highest
click id — a total order), the ext65 deterministic-remainder rule. All
arithmetic is int64 (products <= 1e6 * 72e6 < 2^63); floor(1e6/(1+h)) is
safe in float because quotients of ints this small are never within an
ulp of a wrong integer.

Scale: one shuffle on user_id for the purchase x prior-clicks interval
join (equi key + time-range residual — never a cross product), windows
per conversion, then a map-side-combinable rollup by click day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_WINDOW_H = 72
_MICRO = 1_000_000

_DECAY_ORACLE = f"""
WITH purchases AS (
  SELECT user_id, event_id AS conv_id, ts AS conv_ts
  FROM events WHERE event_type = 'purchase'
), clicks AS (
  SELECT user_id, event_id AS click_id, ts AS click_ts
  FROM events WHERE event_type = 'click'
), touches AS (
  SELECT p.conv_id, c.click_id, c.click_ts,
         CAST(FLOOR({_MICRO}.0 / (1 + CAST(date_diff('second', c.click_ts,
              p.conv_ts) AS BIGINT) // 3600)) AS BIGINT) AS w
  FROM purchases p JOIN clicks c
    ON c.user_id = p.user_id
   AND c.click_ts < p.conv_ts
   AND c.click_ts >= p.conv_ts - INTERVAL {_WINDOW_H} HOUR
), tot AS (
  SELECT conv_id, CAST(SUM(w) AS BIGINT) AS tw,
         CAST(count(*) AS BIGINT) AS n_touch
  FROM touches GROUP BY 1
), credited AS (
  SELECT t.conv_id, t.click_id, t.click_ts, o.n_touch,
         CAST({_MICRO} * t.w // o.tw AS BIGINT)
         + CASE WHEN row_number() OVER (PARTITION BY t.conv_id
                       ORDER BY t.click_ts DESC, t.click_id DESC) = 1
                THEN {_MICRO} - CAST(SUM(CAST({_MICRO} * t.w // o.tw
                       AS BIGINT)) OVER (PARTITION BY t.conv_id) AS BIGINT)
                ELSE 0 END AS credit
  FROM touches t JOIN tot o USING (conv_id)
)
SELECT strftime(date_trunc('day', click_ts), '%Y-%m-%d') AS click_day,
       CAST(count(*) AS BIGINT) AS n_credited_touches,
       CAST(sum(credit) AS BIGINT) AS micro_credit
FROM credited
GROUP BY 1
"""


@register("time_decay_attribution", _DECAY_ORACLE)
def q_time_decay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-hours time-decay attribution: exactly 1e6 micro-credits
    per purchase over its prior-72h clicks, floor-split by integer
    weights with the remainder pinned to the most recent touch; rolled
    up per click day."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("conv_id"),
        F.col("ts").alias("conv_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    hours = (
        (
            F.col("conv_ts").cast("long") - F.col("click_ts").cast("long")
        ) / F.lit(3600)
    ).cast("bigint")
    touches = purchases.join(clicks, "user_id").filter(
        (F.col("click_ts") < F.col("conv_ts"))
        & (
            F.col("click_ts")
            >= F.col("conv_ts") - F.expr(f"INTERVAL {_WINDOW_H} HOURS")
        )
    ).select(
        "conv_id",
        "click_id",
        "click_ts",
        F.floor(F.lit(float(_MICRO)) / (F.lit(1) + hours))
        .cast("bigint")
        .alias("w"),
    )
    tot = touches.groupBy("conv_id").agg(
        F.sum("w").alias("tw"), F.count(F.lit(1)).alias("n_touch")
    )
    t = touches.join(tot, "conv_id")
    # exact INTEGER division (SQL DIV), not float floor: with numerators
    # ~1e12 and denominators ~1e13 a correctly-rounded double quotient can
    # land on the wrong side of an integer (1/b < ulp(q)), which would
    # silently mis-split one micro-credit
    base = F.expr(f"CAST({_MICRO} AS BIGINT) * w DIV tw")
    w_conv = Window.partitionBy("conv_id")
    w_rank = Window.partitionBy("conv_id").orderBy(
        F.col("click_ts").desc(), F.col("click_id").desc()
    )
    credited = t.select(
        "conv_id",
        "click_id",
        "click_ts",
        (
            base
            + F.when(
                F.row_number().over(w_rank) == 1,
                F.lit(_MICRO) - F.sum(base).over(w_conv),
            ).otherwise(F.lit(0))
        ).alias("credit"),
    )
    # day as STRING (repo cross-engine idiom, ext44): DuckDB hands DATE
    # back as datetime64 while Spark yields datetime.date — same day,
    # different canon strings
    return credited.groupBy(
        F.date_format(F.col("click_ts"), "yyyy-MM-dd").alias("click_day")
    ).agg(
        F.count(F.lit(1)).alias("n_credited_touches"),
        F.sum("credit").alias("micro_credit"),
    )
