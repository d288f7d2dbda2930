"""Extension queries, round 121: the log-rank test (Mantel 1966; Peto &
Peto 1972) — the standard two-sample comparison of survival curves,
closing the survival family (Kaplan-Meier ext63, Nelson-Aalen ext96)
with its hypothesis test.

Cohorts: users who ever logged an 'error' event (exposed) vs the rest,
over the ext63 signup->purchase clock (whole days since first signup,
right-censored at the user's last event). Exposure is a fixed baseline
label by construction here — the docstring caveat: a production study
would define exposure at t0 to avoid immortal-time bias; the QUERY
contract is the arithmetic, which the oracle replays exactly.

At each event day t (risk sets n1, n0, events d1, d0; n = n1+n0,
d = d1+d0, only days with d > 0 and n > 1 contribute):

    O1       += d1
    E1_micro += (d * n1 * 1e6)  // n
    V_micro  += (d * n1 * n0 * (n - d) * 1e6) // (n^2 * (n - 1))

and the chi-square statistic is (O1 - E1)^2 / V — computed from the
micro integers with one final double division (identical IEEE on both
engines). Per-day terms are integer-DIV-quantized BEFORE summation so
the rollup is exact-integer and order-free; products ride DECIMAL(38,0)
(Spark) / HUGEINT (DuckDB) so no SF overflows them (n^4-scale terms
pass 2^63 around 40k subjects).

Plan shape for 100 TB: the per-user reduction is one map-side
combinable groupBy over events; the day table is bounded by the
calendar, so risk sets come from the broadcast O(days^2) suffix-sum
self-join (the ext63/ranks.py idiom — no single-partition WindowExec)
and the test statistic is a 1-row fold."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_LOGRANK_ORACLE = """
WITH firsts AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts END) AS t0,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp,
         max(ts) AS t_last,
         max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS grp
  FROM events GROUP BY user_id
), cohort AS (
  SELECT grp,
         CASE WHEN tp IS NOT NULL AND tp >= t0
              THEN CAST(date_diff('day', t0, tp) AS BIGINT) END AS event_day,
         CAST(date_diff('day', t0, t_last) AS BIGINT) AS censor_day
  FROM firsts WHERE t0 IS NOT NULL
), horizons AS (
  SELECT grp,
         CASE WHEN event_day IS NOT NULL THEN event_day
              ELSE censor_day END AS horizon,
         CASE WHEN event_day IS NOT NULL THEN 1 ELSE 0 END AS is_event
  FROM cohort
), days AS (
  SELECT horizon AS t,
         CAST(sum(CASE WHEN grp = 1 THEN is_event ELSE 0 END) AS BIGINT)
           AS d1,
         CAST(sum(CASE WHEN grp = 0 THEN is_event ELSE 0 END) AS BIGINT)
           AS d0,
         CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS l1,
         CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS l0
  FROM horizons GROUP BY 1
), risk AS (
  SELECT a.t, a.d1, a.d0,
         CAST(sum(b.l1) AS BIGINT) AS n1,
         CAST(sum(b.l0) AS BIGINT) AS n0
  FROM days a JOIN days b ON b.t >= a.t
  GROUP BY 1, 2, 3
), terms AS (
  SELECT d1,
         ((d1 + d0) * CAST(n1 AS HUGEINT) * 1000000)
           // (n1 + n0) AS e1_micro,
         ((d1 + d0) * CAST(n1 AS HUGEINT) * n0
          * ((n1 + n0) - (d1 + d0)) * 1000000)
           // (CAST(n1 + n0 AS HUGEINT) * (n1 + n0) * ((n1 + n0) - 1))
           AS v_micro
  FROM risk WHERE d1 + d0 > 0 AND n1 + n0 > 1
), sums AS (
  SELECT CAST(sum(d1) AS BIGINT) AS o1,
         CAST(sum(e1_micro) AS BIGINT) AS e1_micro,
         CAST(sum(v_micro) AS BIGINT) AS v_micro
  FROM terms
), subj AS (
  SELECT CAST(count(*) FILTER (WHERE grp = 1) AS BIGINT) AS n_exposed,
         CAST(count(*) FILTER (WHERE grp = 0) AS BIGINT) AS n_control
  FROM cohort
)
SELECT n_exposed, n_control, o1, e1_micro, v_micro,
       round(CAST((o1 * 1000000 - e1_micro) AS DOUBLE)
             * CAST((o1 * 1000000 - e1_micro) AS DOUBLE)
             / (1000000.0 * CAST(v_micro AS DOUBLE)), 6) AS chi2
FROM sums CROSS JOIN subj
"""


@register("logrank_error_exposure", _LOGRANK_ORACLE)
def q_logrank_error_exposure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test of signup->purchase survival between error-exposed
    and unexposed users: observed/expected exposed events (micro),
    variance (micro), and the chi-square statistic."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "t0"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "tp"
        ),
        F.max("ts").alias("t_last"),
        F.max(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("grp"),
    )
    cohort = firsts.filter(F.col("t0").isNotNull()).select(
        "grp",
        F.when(
            F.col("tp").isNotNull() & (F.col("tp") >= F.col("t0")),
            F.datediff(F.col("tp"), F.col("t0")).cast("bigint"),
        ).alias("event_day"),
        F.datediff(F.col("t_last"), F.col("t0"))
        .cast("bigint")
        .alias("censor_day"),
    )
    horizons = cohort.select(
        "grp",
        F.coalesce(F.col("event_day"), F.col("censor_day")).alias("horizon"),
        F.when(F.col("event_day").isNotNull(), 1).otherwise(0).alias(
            "is_event"
        ),
    )
    g1 = F.col("grp") == 1
    days = horizons.groupBy(F.col("horizon").alias("t")).agg(
        F.sum(F.when(g1, F.col("is_event")).otherwise(0))
        .cast("bigint")
        .alias("d1"),
        F.sum(F.when(~g1, F.col("is_event")).otherwise(0))
        .cast("bigint")
        .alias("d0"),
        F.sum(F.when(g1, 1).otherwise(0)).cast("bigint").alias("l1"),
        F.sum(F.when(~g1, 1).otherwise(0)).cast("bigint").alias("l0"),
    )
    later = days.select(
        F.col("t").alias("_lt"),
        F.col("l1").alias("_l1"),
        F.col("l0").alias("_l0"),
    )
    risk = (
        days.join(F.broadcast(later), F.col("_lt") >= F.col("t"))
        .groupBy("t", "d1", "d0")
        .agg(
            F.sum("_l1").cast("bigint").alias("n1"),
            F.sum("_l0").cast("bigint").alias("n0"),
        )
    )
    n = F.col("n1") + F.col("n0")
    d = F.col("d1") + F.col("d0")
    terms = risk.filter((d > 0) & (n > 1)).select(
        "d1",
        F.expr(
            "CAST(((d1 + d0) * CAST(n1 AS DECIMAL(38,0)) * 1000000)"
            " DIV (n1 + n0) AS DECIMAL(38,0))"
        ).alias("e1_micro"),
        F.expr(
            "CAST(((d1 + d0) * CAST(n1 AS DECIMAL(38,0)) * n0"
            " * ((n1 + n0) - (d1 + d0)) * 1000000)"
            " DIV (CAST(n1 + n0 AS DECIMAL(38,0)) * (n1 + n0)"
            " * ((n1 + n0) - 1)) AS DECIMAL(38,0))"
        ).alias("v_micro"),
    )
    sums = terms.agg(
        F.sum("d1").cast("bigint").alias("o1"),
        F.sum("e1_micro").cast("bigint").alias("e1_micro"),
        F.sum("v_micro").cast("bigint").alias("v_micro"),
    )
    subj = cohort.agg(
        F.count(F.when(g1, 1)).cast("bigint").alias("n_exposed"),
        F.count(F.when(~g1, 1)).cast("bigint").alias("n_control"),
    )
    num = F.col("o1") * F.lit(1000000) - F.col("e1_micro")
    return (
        sums.crossJoin(F.broadcast(subj))
        .withColumn(
            "chi2",
            F.round(
                num.cast("double")
                * num.cast("double")
                / (F.lit(1000000.0) * F.col("v_micro").cast("double")),
                6,
            ),
        )
        .select(
            "n_exposed", "n_control", "o1", "e1_micro", "v_micro", "chi2"
        )
    )
