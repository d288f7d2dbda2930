"""Extension queries, round 81: Holt double-exponential smoothing (level
+ trend) over the hourly event series — the forecasting step up from the
round-59 single EWMA, and the state another streaming-fold twin could
carry.

Recurrence (Holt 1957), alpha = 1/2, beta = 1/4 (dyadic, so the
multiplications are exact in binary):

    l_t = round(alpha*x_t + (1-alpha)*(l_{t-1} + b_{t-1}), 12)
    b_t = round(beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}, 12)

with l_1 = x_1, b_1 = 0, and the one-step-ahead error
|x_t - (l_{t-1} + b_{t-1})| accumulated inside the same fold. Both
engines replay the identical left fold over the identically-ordered
hourly series — the EWMA/survival determinism recipe (per-step round-12
quantization + same op order) extended to a MULTI-FIELD accumulator.

Cross-engine pitfall found building this (pinned by the tiny-series
test): DuckDB 1.0's list_reduce with a STRUCT accumulator evaluates the
result fields against a partially-updated accumulator (err_sum computed
after l/b already replaced acc's values — wrong by construction), while
Spark's F.aggregate struct merge is sound. The oracle therefore carries
the state as a 5-element DOUBLE LIST ([x, l, b, err_sum, n]), which
DuckDB folds correctly; the Spark side keeps the readable named struct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_HOLT_ORACLE = """
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), s AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_hours,
         list(CAST(x AS DOUBLE) ORDER BY hour) AS xs
  FROM h GROUP BY 1
), folded AS (
  SELECT event_type, n_hours,
    -- state list: [x, l, b, err_sum, n] (struct accumulators are
    -- miscompiled by DuckDB 1.0 list_reduce — see module docstring)
    list_reduce(
      list_concat(
        [[xs[1], xs[1], CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
          CAST(0.0 AS DOUBLE)]],
        list_transform(xs[2:], v -> [v, 0.0, 0.0, 0.0, 0.0])
      ),
      (acc, e) -> [
        e[1],
        round(0.5 * e[1] + 0.5 * (acc[2] + acc[3]), 12),
        round(0.25 * (round(0.5 * e[1] + 0.5 * (acc[2] + acc[3]), 12)
                      - acc[2]) + 0.75 * acc[3], 12),
        acc[4] + abs(e[1] - (acc[2] + acc[3])),
        acc[5] + 1.0
      ]
    ) AS st
  FROM s
)
SELECT event_type, n_hours,
       round(st[2], 6) AS level_final,
       round(st[3], 6) AS trend_final,
       round(st[2] + st[3], 6) AS forecast_next,
       CASE WHEN st[5] > 0
            THEN round(st[4] / st[5], 6) END AS mae_one_step
FROM folded
"""


@register("event_type_holt_forecast", _HOLT_ORACLE)
def q_event_type_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final Holt level/trend, next-hour forecast, and in-sample one-step
    MAE per event type — a single struct-state left fold both engines
    replay operation-for-operation (see module docstring)."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("x"))
    s = h.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.array_sort(F.collect_list(F.struct("hour", "x"))).alias("arr"),
    )
    xs = F.transform(F.col("arr"), lambda e: e["x"].cast("double"))

    def lift(v):
        return F.struct(
            v.alias("x"),
            F.lit(0.0).alias("l"),
            F.lit(0.0).alias("b"),
            F.lit(0.0).alias("err_sum"),
            F.lit(0).cast("bigint").alias("n"),
        )

    init = F.struct(
        F.element_at(xs, 1).alias("x"),
        F.element_at(xs, 1).alias("l"),
        F.lit(0.0).alias("b"),
        F.lit(0.0).alias("err_sum"),
        F.lit(0).cast("bigint").alias("n"),
    )

    def step(acc, e):
        new_l = F.round(
            F.lit(0.5) * e["x"] + F.lit(0.5) * (acc["l"] + acc["b"]), 12
        )
        return F.struct(
            e["x"].alias("x"),
            new_l.alias("l"),
            F.round(
                F.lit(0.25) * (new_l - acc["l"]) + F.lit(0.75) * acc["b"], 12
            ).alias("b"),
            (acc["err_sum"] + F.abs(e["x"] - (acc["l"] + acc["b"]))).alias(
                "err_sum"
            ),
            (acc["n"] + F.lit(1)).cast("bigint").alias("n"),
        )

    st = F.aggregate(
        F.transform(
            F.slice(xs, F.lit(2), F.greatest(F.size(xs) - 1, F.lit(0))),
            lift,
        ),
        init,
        step,
    )
    return s.select(
        "event_type",
        "n_hours",
        F.round(st["l"], 6).alias("level_final"),
        F.round(st["b"], 6).alias("trend_final"),
        F.round(st["l"] + st["b"], 6).alias("forecast_next"),
        F.when(st["n"] > 0, F.round(st["err_sum"] / st["n"], 6)).alias(
            "mae_one_step"
        ),
    )
