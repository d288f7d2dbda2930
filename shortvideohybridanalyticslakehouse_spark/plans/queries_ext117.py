"""Extension queries, round 117: Holt-Winters additive SEASONAL
smoothing (Winters 1960) over the hourly event series — the seasonal
step up from ext81's Holt level+trend, closing the classical
exponential-smoothing ladder (EWMA -> Holt -> Holt-Winters).

Recurrence with period m=24 (hour of day), dyadic coefficients
alpha=1/2, beta=1/4, gamma=1/4 so every multiplication is exact in
binary; each state write is round(.,12)-quantized (the ext81 contract):

    idx  = hour-of-day of x_t (1..24)
    l_t  = round(alpha*(x_t - s_idx) + (1-alpha)*(l + b), 12)
    b_t  = round(beta*(l_t - l) + (1-beta)*b, 12)
    s'   = round(gamma*(x_t - l_t) + (1-gamma)*s_idx, 12)

with l_1 = x_1, b_1 = 0, s_j = 0 (deterministic cold-start — the
textbook first-season initialization needs a second pass; the zero
start keeps the fold single-pass and both engines replay it exactly),
and the one-step error |x_t - (l + b + s_idx)| accumulated in-state.

Both engines fold the identically-ordered hourly series. DuckDB 1.0
list_reduce miscompiles STRUCT accumulators (ext81 finding), so the
oracle carries a flat 28-double list [l, b, err_sum, n, s1..s24]; the
seasonal slot write is a range(1,25) rebuild with one CASE — the
element-update idiom shared with the ext113 ADPCM fold. Spark keeps the
named struct with an array field (F.aggregate struct merge is sound).

Plan shape for 100 TB: per-key hourly pre-aggregation is map-side
combinable; the fold runs over the REDUCED per-type series (~720
elements/month), so series length — not event count — bounds the array
work, the same contract as ext81/ext59.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_M = 24


def _duck_fold() -> str:
    # acc: [l, b, err_sum, n, s1..s24]; e: [x, hod] (hod 0..23)
    idx = "CAST(e[2] AS INT) + 1"
    s_cur = f"acc[({idx}) + 4]"
    new_l = f"round(0.5 * (e[1] - {s_cur}) + 0.5 * (acc[1] + acc[2]), 12)"
    new_b = f"round(0.25 * ({new_l} - acc[1]) + 0.75 * acc[2], 12)"
    new_s = f"round(0.25 * (e[1] - {new_l}) + 0.75 * {s_cur}, 12)"
    err = f"abs(e[1] - (acc[1] + acc[2] + {s_cur}))"
    return f"""
    list_reduce(
      list_concat(
        [list_concat([xs[1], 0.0, 0.0, 0.0],
                     list_transform(range(1, {_M} + 1), j -> 0.0))],
        list_transform(range(2, len(xs) + 1), i -> [xs[i], hods[i]])
      ),
      (acc, e) -> list_concat(
        [{new_l}, {new_b}, acc[3] + {err}, acc[4] + 1.0],
        list_transform(range(1, {_M} + 1),
          j -> CASE WHEN j = {idx} THEN {new_s} ELSE acc[j + 4] END)
      )
    )"""


_HW_ORACLE = f"""
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), s AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_hours,
         list(CAST(x AS DOUBLE) ORDER BY hour) AS xs,
         list(CAST(EXTRACT(hour FROM hour) AS DOUBLE) ORDER BY hour)
           AS hods
  FROM h GROUP BY 1
), folded AS (
  SELECT event_type, n_hours, hods,
    {_duck_fold()} AS st
  FROM s
)
SELECT event_type, n_hours,
       round(st[1], 6) AS level_final,
       round(st[2], 6) AS trend_final,
       round(st[CAST((hods[len(hods)] + 1) AS INT) % {_M} + 5], 6)
         AS season_next,
       round(st[1] + st[2]
             + st[CAST((hods[len(hods)] + 1) AS INT) % {_M} + 5], 6)
         AS forecast_next,
       CASE WHEN st[4] > 0 THEN round(st[3] / st[4], 6) END
         AS mae_one_step
FROM folded
"""


@register("event_type_holt_winters", _HW_ORACLE)
def q_event_type_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final Holt-Winters level/trend, the next hour's seasonal
    component and forecast, and in-sample one-step MAE per event type —
    the 24-season fold replayed element-for-element by the oracle."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("x"))
    s = h.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.array_sort(
            F.collect_list(
                F.struct(
                    "hour",
                    F.col("x").cast("double").alias("x"),
                    F.hour("hour").cast("double").alias("hod"),
                )
            )
        ).alias("arr"),
    )

    zeros = F.transform(F.sequence(F.lit(1), F.lit(_M)), lambda j: F.lit(0.0))
    init = F.struct(
        F.element_at(F.col("arr"), 1)["x"].alias("l"),
        F.lit(0.0).alias("b"),
        F.lit(0.0).alias("err_sum"),
        F.lit(0.0).alias("n"),
        zeros.alias("s"),
    )

    def step(acc, e):
        idx = e["hod"].cast("int") + F.lit(1)
        s_cur = F.element_at(acc["s"], idx)
        new_l = F.round(
            F.lit(0.5) * (e["x"] - s_cur)
            + F.lit(0.5) * (acc["l"] + acc["b"]),
            12,
        )
        new_b = F.round(
            F.lit(0.25) * (new_l - acc["l"]) + F.lit(0.75) * acc["b"], 12
        )
        new_s = F.round(
            F.lit(0.25) * (e["x"] - new_l) + F.lit(0.75) * s_cur, 12
        )
        err = F.abs(e["x"] - (acc["l"] + acc["b"] + s_cur))
        return F.struct(
            new_l.alias("l"),
            new_b.alias("b"),
            (acc["err_sum"] + err).alias("err_sum"),
            (acc["n"] + F.lit(1.0)).alias("n"),
            F.transform(
                F.sequence(F.lit(1), F.lit(_M)),
                lambda j: F.when(j == idx, new_s).otherwise(
                    F.element_at(acc["s"], j)
                ),
            ).alias("s"),
        )

    tail = F.slice(
        F.col("arr"), F.lit(2), F.greatest(F.size("arr") - 1, F.lit(0))
    )
    st = F.aggregate(tail, init, step)
    hod_next = (
        F.element_at(F.col("arr"), -1)["hod"].cast("int") + F.lit(1)
    ) % F.lit(_M)
    season_next = F.element_at(st["s"], hod_next + F.lit(1))
    return s.select(
        "event_type",
        F.col("n_hours").cast("bigint").alias("n_hours"),
        F.round(st["l"], 6).alias("level_final"),
        F.round(st["b"], 6).alias("trend_final"),
        F.round(season_next, 6).alias("season_next"),
        F.round(st["l"] + st["b"] + season_next, 6).alias("forecast_next"),
        F.when(st["n"] > 0, F.round(st["err_sum"] / st["n"], 6)).alias(
            "mae_one_step"
        ),
    )
