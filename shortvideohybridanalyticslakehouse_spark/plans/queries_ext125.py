"""Extension queries, round 125: production-monitoring closers —
Page-Hinkley sequential drift detection (Page 1954; Hinkley 1971, the
streaming changepoint test CUSUM generalizes from) and the Kish design
effect (Kish 1965), the survey-sampling diagnostic that prices how much
a WEIGHTED sample is worth in unweighted-sample units.

Page-Hinkley over each event type's daily count series:

    term_t = x_t - mean(x_1..x_t) - delta       (drift allowance)
    m_t    = m_{t-1} + term_t ;  M_t = min(M_t-1, m_t)
    alarm at the first t with m_t - M_t > lambda

Exactness: x_t and running sums are integers; the running mean enters
as one integer DIV to micro units per step (floor semantics on both
engines), so m/M are exact integers and the alarm day is unambiguous.
The fold is ordered by day — the ext81/ext114 ordered-fold contract.

Kish design effect per source, weighting documents by token count:

    deff = n * sum(w^2) / (sum w)^2,   ESS = n / deff = (sum w)^2 / sum(w^2)

pure integer sums with final DIVs — a training-data pipeline reads ESS
as "how many effective documents the temperature/importance weights
left us" (the DSIR/mixture lanes' sanity metric).

Plan shape for 100 TB: both queries reduce at the source (daily counts;
per-source weight moments) with map-side combine; the PH fold runs over
the bounded per-type day series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

PH_DELTA_MICRO = 2_000_000  # drift allowance: 2 events/day
PH_LAMBDA_MICRO = 30_000_000  # alarm threshold: cumulative 30 events

# acc: [n, sum, m_micro, M_micro, alarm_idx]; element: [x]. The mean
# term divides a NON-NEGATIVE quantity, so DuckDB's floor-// and
# Spark's truncating DIV agree by construction.
def _duck_ph_fold() -> str:
    term = (
        "(e[1] * 1000000"
        " - ((acc[2] + e[1]) * 1000000) // (acc[1] + 1)"
        f" - {PH_DELTA_MICRO})"
    )
    new_m = f"acc[3] + {term}"
    new_mn = f"least(acc[4], {new_m})"
    alarm = (
        f"CASE WHEN acc[5] >= 0 THEN acc[5] "
        f"WHEN ({new_m}) - ({new_mn}) > {PH_LAMBDA_MICRO} "
        f"THEN acc[1] + 1 ELSE -1 END"
    )
    return f"""
    list_reduce(
      list_concat([[CAST(0 AS BIGINT), 0, 0, 0, -1]],
                  list_transform(xs, v -> [v])),
      (acc, e) -> [acc[1] + 1, acc[2] + e[1], {new_m}, {new_mn}, {alarm}]
    )"""


_PH_ORACLE = f"""
WITH d AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), s AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
         list(x ORDER BY day) AS xs
  FROM d GROUP BY 1
), folded AS (
  SELECT event_type, n_days, {_duck_ph_fold()} AS st FROM s
)
SELECT event_type, n_days,
       st[3] AS ph_m_micro,
       st[4] AS ph_min_micro,
       st[3] - st[4] AS ph_stat_micro,
       CASE WHEN st[5] >= 0 THEN st[5] END AS alarm_day_idx,
       st[5] >= 0 AS drift_detected
FROM folded
"""


@register("page_hinkley_daily_drift", _PH_ORACLE)
def q_page_hinkley_daily_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Page-Hinkley drift test over each event type's daily counts:
    exact integer m/M accumulators, the first alarm day index (1-based)
    if the statistic ever clears lambda."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    s = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.expr(
            "transform(array_sort(collect_list(struct(day, x))), p -> p.x)"
        ).alias("xs"),
    )
    term = (
        "(e * 1000000"
        " - ((acc[1] + e) * 1000000) DIV (acc[0] + 1)"
        f" - {PH_DELTA_MICRO})"
    )
    new_m = f"acc[2] + {term}"
    new_mn = f"least(acc[3], {new_m})"
    alarm = (
        f"CASE WHEN acc[4] >= 0 THEN acc[4] "
        f"WHEN ({new_m}) - ({new_mn}) > {PH_LAMBDA_MICRO} "
        f"THEN acc[0] + 1 ELSE -1 END"
    )
    st = F.expr(
        "aggregate(xs, "
        "array(CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), "
        "CAST(0 AS BIGINT), CAST(-1 AS BIGINT)), "
        f"(acc, e) -> array(acc[0] + 1, acc[1] + e, {new_m}, {new_mn}, "
        f"{alarm}))"
    )
    return s.select(
        "event_type",
        "n_days",
        st[2].alias("ph_m_micro"),
        st[3].alias("ph_min_micro"),
        (st[2] - st[3]).alias("ph_stat_micro"),
        F.when(st[4] >= 0, st[4]).alias("alarm_day_idx"),
        (st[4] >= 0).alias("drift_detected"),
    )


_KISH_ORACLE = """
WITH w AS (
  SELECT source,
         CAST(len(string_split_regex(lower(trim(text)), '\\s+'))
              AS BIGINT) AS w
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(w) AS BIGINT) AS sum_w,
       CAST((count(*) * sum(w * w) * 1000000)
            // (CAST(sum(w) AS HUGEINT) * sum(w)) AS BIGINT)
         AS deff_micro,
       CAST((CAST(sum(w) AS HUGEINT) * sum(w)) // sum(w * w) AS BIGINT)
         AS effective_sample_size
FROM w GROUP BY 1
"""


@register("kish_design_effect", _KISH_ORACLE)
def q_kish_design_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kish design effect and effective sample size per source, with
    token counts as document weights — how much weighting shrinks the
    corpus in unweighted-document units."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(
        "source",
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
        .cast("bigint")
        .alias("w"),
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    return (
        w.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("w").cast("bigint").alias("sum_w"),
            F.sum(d38(F.col("w") * F.col("w"))).alias("sww"),
        )
        .select(
            "source",
            "n_docs",
            "sum_w",
            F.expr(
                "CAST((n_docs * sww * 1000000)"
                " DIV (CAST(sum_w AS DECIMAL(38,0)) * sum_w) AS BIGINT)"
            ).alias("deff_micro"),
            F.expr(
                "CAST((CAST(sum_w AS DECIMAL(38,0)) * sum_w) DIV sww"
                " AS BIGINT)"
            ).alias("effective_sample_size"),
        )
    )
