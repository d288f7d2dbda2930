"""Extension queries, round 124: split conformal prediction (Vovk et
al. 2005; Lei et al. 2018) — distribution-free prediction intervals
with finite-sample coverage, the calibration step a model-serving
pipeline runs before shipping point predictions.

Protocol (exactly replayed by the oracle):
  - three disjoint day windows over the corpus span (integer epoch-day
    arithmetic, the ext96 anchor discipline): train d <= D/2,
    calibration D/2 < d <= 3D/4, evaluation d > 3D/4,
  - predictor: per (event_type, hour-of-day) TRAIN mean value in cents,
    floor-quantized (s DIV n — exact integer, the contract),
  - nonconformity score: absolute cent residual |v - pred| (integer),
  - q_hat: the ceil((n_cal + 1) * 0.9)-th smallest calibration residual
    — the EXACT order statistic, found as the least residual whose
    cumulative calibration count reaches k (capped at n_cal),
  - report: empirical coverage of pred +- q_hat on the held-out eval
    window in micro units (integer DIV). Split conformal guarantees
    coverage >= 90% in expectation over exchangeable splits.

All residuals/counts/thresholds are exact integers; the only
quantizations are the floor predictor and the final DIV — identical on
both engines by construction.

Plan shape for 100 TB: two map-side-combinable aggregations (train
means; per-(type, residual) calibration counts), one broadcast of the
O(types x 24) predictor, and a cumulative count over the per-type
DISTINCT-residual frame (bounded by the cent range, never by row
count; partitioned by event_type, so no single-partition window). The
eval pass is one join + conditional count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_ALPHA_NUM = 9  # coverage level 0.9 == 9/10

_CONFORMAL_ORACLE = f"""
WITH base AS (
  SELECT event_type,
         CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
         date_diff('day', (SELECT min(date_trunc('day', ts)) FROM events),
                   date_trunc('day', ts)) AS d
  FROM events
), span AS (
  SELECT max(d) AS dmax FROM base
), splits AS (
  SELECT b.*,
         CASE WHEN d <= dmax // 2 THEN 'train'
              WHEN d <= (3 * dmax) // 4 THEN 'cal'
              ELSE 'eval' END AS part
  FROM base b, span
), pred AS (
  SELECT event_type, hod,
         CAST(sum(v) // count(*) AS BIGINT) AS pred_c
  FROM splits WHERE part = 'train' GROUP BY 1, 2
), scored AS (
  SELECT s.event_type, s.part, abs(s.v - p.pred_c) AS r
  FROM splits s JOIN pred p USING (event_type, hod)
  WHERE s.part <> 'train'
), cal_n AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_cal
  FROM scored WHERE part = 'cal' GROUP BY 1
), cal_cum AS (
  SELECT event_type, r,
         CAST(sum(count(*)) OVER (PARTITION BY event_type ORDER BY r)
              AS BIGINT) AS cum
  FROM scored WHERE part = 'cal' GROUP BY event_type, r
), k AS (
  SELECT event_type, n_cal,
         least(({_ALPHA_NUM} * (n_cal + 1) + 9) // 10, n_cal) AS kth
  FROM cal_n
), qhat AS (
  SELECT c.event_type, k.n_cal, min(c.r) AS q_hat_cents
  FROM cal_cum c JOIN k USING (event_type)
  WHERE c.cum >= k.kth
  GROUP BY 1, 2
), eval_cov AS (
  SELECT s.event_type,
         CAST(count(*) AS BIGINT) AS n_eval,
         CAST(count(*) FILTER (WHERE s.r <= q.q_hat_cents) AS BIGINT)
           AS n_covered
  FROM scored s JOIN qhat q USING (event_type)
  WHERE s.part = 'eval'
  GROUP BY 1
), n_train AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_train
  FROM splits WHERE part = 'train' GROUP BY 1
)
SELECT q.event_type, t.n_train, q.n_cal, e.n_eval, q.q_hat_cents,
       CAST((e.n_covered * 1000000) // e.n_eval AS BIGINT)
         AS coverage_micro
FROM qhat q
JOIN eval_cov e USING (event_type)
JOIN n_train t USING (event_type)
"""


@register("conformal_interval_coverage", _CONFORMAL_ORACLE)
def q_conformal_interval_coverage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per event type: split-conformal interval half-width (the exact
    order-statistic q_hat over calibration residuals) and its measured
    coverage on the held-out eval window."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    anchor = ev.agg(F.min(day).alias("d0"))
    base = ev.crossJoin(F.broadcast(anchor)).select(
        "event_type",
        F.hour("ts").cast("bigint").alias("hod"),
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("v"),
        F.datediff(day, F.col("d0")).cast("bigint").alias("d"),
    )
    span = base.agg(F.max("d").alias("dmax"))
    splits = base.crossJoin(F.broadcast(span)).withColumn(
        "part",
        F.when(F.col("d") <= F.expr("dmax DIV 2"), "train")
        .when(F.col("d") <= F.expr("(3 * dmax) DIV 4"), "cal")
        .otherwise("eval"),
    )
    pred = (
        splits.filter(F.col("part") == "train")
        .groupBy("event_type", "hod")
        .agg(F.expr("CAST(sum(v) DIV count(1) AS BIGINT)").alias("pred_c"))
    )
    scored = (
        splits.filter(F.col("part") != "train")
        .join(F.broadcast(pred), ["event_type", "hod"])
        .select(
            "event_type",
            "part",
            F.abs(F.col("v") - F.col("pred_c")).alias("r"),
        )
    )
    cal = scored.filter(F.col("part") == "cal")
    cal_n = cal.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cal")
    )
    # cumulative count over the per-type DISTINCT-residual frame —
    # bounded by the cent range; partitioned window (one per type)
    w = Window.partitionBy("event_type").orderBy("r")
    cal_cum = (
        cal.groupBy("event_type", "r")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("cum", F.sum("c").over(w).cast("bigint"))
    )
    k = cal_n.select(
        "event_type",
        "n_cal",
        F.least(
            F.expr(f"({_ALPHA_NUM} * (n_cal + 1) + 9) DIV 10"),
            F.col("n_cal"),
        ).alias("kth"),
    )
    qhat = (
        cal_cum.join(F.broadcast(k), "event_type")
        .filter(F.col("cum") >= F.col("kth"))
        .groupBy("event_type", "n_cal")
        .agg(F.min("r").alias("q_hat_cents"))
    )
    eval_cov = (
        scored.filter(F.col("part") == "eval")
        .join(F.broadcast(qhat), "event_type")
        .groupBy("event_type", "n_cal", "q_hat_cents")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_eval"),
            F.count(F.when(F.col("r") <= F.col("q_hat_cents"), 1))
            .cast("bigint")
            .alias("n_covered"),
        )
    )
    n_train = (
        splits.filter(F.col("part") == "train")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_train"))
    )
    return (
        eval_cov.join(F.broadcast(n_train), "event_type")
        .select(
            "event_type",
            "n_train",
            "n_cal",
            "n_eval",
            "q_hat_cents",
            F.expr(
                "CAST((n_covered * 1000000) DIV n_eval AS BIGINT)"
            ).alias("coverage_micro"),
        )
    )
