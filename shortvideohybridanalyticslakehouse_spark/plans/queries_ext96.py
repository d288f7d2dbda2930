"""Extension queries, round 96: experimentation / causal-inference
estimators over the event stream — CUPED variance-reduced lift,
difference-in-differences, and the Nelson-Aalen cumulative hazard (the
Kaplan-Meier companion, queries_ext63).

Cross-engine determinism contract shared by all three:
  - money through the DECIMAL(18,2) cents hop (plans/money.py),
  - every second-moment sum accumulates INTEGERS (cents, cents^2 —
    DECIMAL(38,0) in Spark, HUGEINT in DuckDB, both exact), so
    covariance/variance numerators are identical integers in both
    engines; floats appear only in a final cast-then-divide-then-round
    step performed with the same IEEE operations on both sides,
  - the pre/post cut is (min+max)//2 of integer epoch seconds — derived
    from the data, no wall-clock, broadcast as a 1-row anchor (J7 idiom),
  - the hazard curve's cumulative sum uses the ext63 per-step round-12
    quantized fold over a bounded day array (no single-partition window).

CUPED (Deng et al., WSDM'13): Y_adj = Y - theta (X - E[X]) with
theta = cov(X,Y)/var(X) pooled across variants; removes rho^2 of the
outcome variance. X = pre-period purchase cents, Y = post-period.
Assignment replays the repo hash contract (hash60(user) % 100 < 50).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions.dedupfns import hash60
from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_CENTS = "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"

_PER_USER_CTE = f"""
WITH bounds AS (
  SELECT (min(date_diff('second', TIMESTAMP '1970-01-01', ts))
          + max(date_diff('second', TIMESTAMP '1970-01-01', ts))) // 2 AS mid
  FROM events
), per_user AS (
  SELECT e.user_id,
         CASE WHEN CAST(('0x' || substr(md5(CAST(e.user_id AS VARCHAR)), 1, 15))
                   AS BIGINT) % 100 < 50
              THEN 'control' ELSE 'treatment' END AS variant,
         CAST(coalesce(sum(CASE WHEN e.event_type = 'purchase'
                AND date_diff('second', TIMESTAMP '1970-01-01', e.ts) <= b.mid
                THEN {_CENTS} END), 0) AS BIGINT) AS x_c,
         CAST(coalesce(sum(CASE WHEN e.event_type = 'purchase'
                AND date_diff('second', TIMESTAMP '1970-01-01', e.ts) > b.mid
                THEN {_CENTS} END), 0) AS BIGINT) AS y_c
  FROM events e, bounds b
  GROUP BY 1, 2
)
"""

_CUPED_ORACLE = (
    _PER_USER_CTE
    + """
, mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(x_c) AS sx, sum(y_c) AS sy,
         sum(x_c * x_c) AS sxx, sum(x_c * y_c) AS sxy,
         sum(y_c * y_c) AS syy,
         CAST(sum(CASE WHEN variant = 'treatment' THEN 1 ELSE 0 END)
              AS BIGINT) AS nt,
         sum(CASE WHEN variant = 'treatment' THEN x_c ELSE 0 END) AS stx,
         sum(CASE WHEN variant = 'treatment' THEN y_c ELSE 0 END) AS sty,
         CAST(sum(CASE WHEN variant = 'control' THEN 1 ELSE 0 END)
              AS BIGINT) AS nc,
         sum(CASE WHEN variant = 'control' THEN x_c ELSE 0 END) AS scx,
         sum(CASE WHEN variant = 'control' THEN y_c ELSE 0 END) AS scy
  FROM per_user
)
SELECT n AS n_users, nt AS n_treatment, nc AS n_control,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(NULLIF(n * sxx - sx * sx, 0) AS DOUBLE), 6) AS theta,
       round(CAST(sty AS DOUBLE) / nt - CAST(scy AS DOUBLE) / nc, 6)
         AS raw_lift_cents,
       round((CAST(sty AS DOUBLE) / nt
              - (CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(NULLIF(n * sxx - sx * sx, 0) AS DOUBLE))
                * (CAST(stx AS DOUBLE) / nt - CAST(sx AS DOUBLE) / n))
             - (CAST(scy AS DOUBLE) / nc
              - (CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(NULLIF(n * sxx - sx * sx, 0) AS DOUBLE))
                * (CAST(scx AS DOUBLE) / nc - CAST(sx AS DOUBLE) / n)),
             6) AS cuped_lift_cents,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             * CAST(n * sxy - sx * sy AS DOUBLE)
             / (CAST(NULLIF(n * sxx - sx * sx, 0) AS DOUBLE)
                * CAST(NULLIF(n * syy - sy * sy, 0) AS DOUBLE)), 6)
         AS variance_reduction
FROM mom
"""
)


def _per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("long")
    anchor = F.broadcast(
        ev.agg(
            ((F.min(sec) + F.max(sec)) / 2).cast("bigint").alias("mid")
        )
    )
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    is_p = F.col("event_type") == "purchase"
    return (
        ev.crossJoin(anchor)
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(F.when(is_p & (sec <= F.col("mid")), cents)), F.lit(0)
            )
            .cast("bigint")
            .alias("x_c"),
            F.coalesce(
                F.sum(F.when(is_p & (sec > F.col("mid")), cents)), F.lit(0)
            )
            .cast("bigint")
            .alias("y_c"),
        )
        .select(
            "user_id",
            "x_c",
            "y_c",
            F.when(
                hash60(F.col("user_id").cast("string")) % 100 < 50,
                F.lit("control"),
            )
            .otherwise(F.lit("treatment"))
            .alias("variant"),
        )
    )


@register("ab_cuped_adjusted_lift", _CUPED_ORACLE)
def q_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted treatment lift on post-period purchase cents with
    pre-period spend as the covariate: pooled theta = cov/var from exact
    integer moments, adjusted means per variant, rho^2 as the variance
    reduction — one map-side-combinable aggregation over per-user
    totals, one row out."""
    pu = _per_user(spark, sf_dir)
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    is_t = F.col("variant") == "treatment"
    mom = pu.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(d38(F.col("x_c"))).alias("sx"),
        F.sum(d38(F.col("y_c"))).alias("sy"),
        F.sum(d38(F.col("x_c") * F.col("x_c"))).alias("sxx"),
        F.sum(d38(F.col("x_c") * F.col("y_c"))).alias("sxy"),
        F.sum(d38(F.col("y_c") * F.col("y_c"))).alias("syy"),
        F.sum(F.when(is_t, 1).otherwise(0)).cast("bigint").alias("nt"),
        F.sum(F.when(is_t, d38(F.col("x_c"))).otherwise(F.lit(0))).alias("stx"),
        F.sum(F.when(is_t, d38(F.col("y_c"))).otherwise(F.lit(0))).alias("sty"),
        F.sum(F.when(~is_t, 1).otherwise(0)).cast("bigint").alias("nc"),
        F.sum(F.when(~is_t, d38(F.col("x_c"))).otherwise(F.lit(0))).alias("scx"),
        F.sum(F.when(~is_t, d38(F.col("y_c"))).otherwise(F.lit(0))).alias("scy"),
    )
    dd = lambda c: c.cast("double")  # noqa: E731
    cov_n = dd(F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
    varx_n = dd(
        F.nullif(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0))
    )
    vary_n = dd(
        F.nullif(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"), F.lit(0))
    )
    theta = cov_n / varx_n
    mean_x = dd(F.col("sx")) / F.col("n")
    adj_t = dd(F.col("sty")) / F.col("nt") - theta * (
        dd(F.col("stx")) / F.col("nt") - mean_x
    )
    adj_c = dd(F.col("scy")) / F.col("nc") - theta * (
        dd(F.col("scx")) / F.col("nc") - mean_x
    )
    return mom.select(
        F.col("n").alias("n_users"),
        F.col("nt").alias("n_treatment"),
        F.col("nc").alias("n_control"),
        F.round(theta, 6).alias("theta"),
        F.round(
            dd(F.col("sty")) / F.col("nt") - dd(F.col("scy")) / F.col("nc"), 6
        ).alias("raw_lift_cents"),
        F.round(adj_t - adj_c, 6).alias("cuped_lift_cents"),
        F.round(cov_n * cov_n / (varx_n * vary_n), 6).alias(
            "variance_reduction"
        ),
    )


_DID_ORACLE = (
    _PER_USER_CTE
    + """
, cell AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN variant = 'treatment' THEN 1 ELSE 0 END)
              AS BIGINT) AS nt,
         CAST(sum(CASE WHEN variant = 'control' THEN 1 ELSE 0 END)
              AS BIGINT) AS nc,
         sum(CASE WHEN variant = 'treatment' THEN x_c ELSE 0 END) AS stx,
         sum(CASE WHEN variant = 'treatment' THEN y_c ELSE 0 END) AS sty,
         sum(CASE WHEN variant = 'control' THEN x_c ELSE 0 END) AS scx,
         sum(CASE WHEN variant = 'control' THEN y_c ELSE 0 END) AS scy
  FROM per_user
)
SELECT nt AS n_treatment, nc AS n_control,
       round(CAST(stx AS DOUBLE) / nt, 6) AS mean_pre_treatment,
       round(CAST(sty AS DOUBLE) / nt, 6) AS mean_post_treatment,
       round(CAST(scx AS DOUBLE) / nc, 6) AS mean_pre_control,
       round(CAST(scy AS DOUBLE) / nc, 6) AS mean_post_control,
       round((CAST(sty AS DOUBLE) / nt - CAST(stx AS DOUBLE) / nt)
             - (CAST(scy AS DOUBLE) / nc - CAST(scx AS DOUBLE) / nc), 6)
         AS did_cents
FROM cell
"""
)


@register("did_estimator", _DID_ORACLE)
def q_did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences on per-user purchase cents across the
    data-midpoint pre/post cut under the hash-contract assignment: the
    2x2 cell means and the DiD estimate, one exact-integer aggregation
    pass."""
    pu = _per_user(spark, sf_dir)
    is_t = F.col("variant") == "treatment"
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    cell = pu.agg(
        F.sum(F.when(is_t, 1).otherwise(0)).cast("bigint").alias("nt"),
        F.sum(F.when(~is_t, 1).otherwise(0)).cast("bigint").alias("nc"),
        F.sum(F.when(is_t, d38(F.col("x_c"))).otherwise(F.lit(0))).alias("stx"),
        F.sum(F.when(is_t, d38(F.col("y_c"))).otherwise(F.lit(0))).alias("sty"),
        F.sum(F.when(~is_t, d38(F.col("x_c"))).otherwise(F.lit(0))).alias("scx"),
        F.sum(F.when(~is_t, d38(F.col("y_c"))).otherwise(F.lit(0))).alias("scy"),
    )
    dd = lambda c: c.cast("double")  # noqa: E731
    m = lambda s, n: dd(F.col(s)) / F.col(n)  # noqa: E731
    return cell.select(
        F.col("nt").alias("n_treatment"),
        F.col("nc").alias("n_control"),
        F.round(m("stx", "nt"), 6).alias("mean_pre_treatment"),
        F.round(m("sty", "nt"), 6).alias("mean_post_treatment"),
        F.round(m("scx", "nc"), 6).alias("mean_pre_control"),
        F.round(m("scy", "nc"), 6).alias("mean_post_control"),
        F.round(
            (m("sty", "nt") - m("stx", "nt")) - (m("scy", "nc") - m("scx", "nc")),
            6,
        ).alias("did_cents"),
    )


_NA_ORACLE = """
WITH firsts AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts END) AS t0,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp,
         max(ts) AS t_last
  FROM events GROUP BY user_id
), cohort AS (
  SELECT user_id,
         CASE WHEN tp IS NOT NULL AND tp >= t0
              THEN CAST(date_diff('day', t0, tp) AS BIGINT) END AS event_day,
         CAST(date_diff('day', t0, t_last) AS BIGINT) AS censor_day
  FROM firsts WHERE t0 IS NOT NULL
), horizons AS (
  SELECT CASE WHEN event_day IS NOT NULL THEN event_day
              ELSE censor_day END AS horizon,
         CASE WHEN event_day IS NOT NULL THEN 1 ELSE 0 END AS is_event
  FROM cohort
), days AS (
  SELECT horizon AS t,
         CAST(sum(is_event) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS leaving
  FROM horizons GROUP BY 1
), ordered AS (
  SELECT t, d, leaving,
         CAST(sum(leaving) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS n_risk
  FROM days
), packed AS (
  SELECT list(CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) ORDER BY t) AS hs,
         list(t ORDER BY t) AS ts,
         list(d ORDER BY t) AS ds,
         list(n_risk ORDER BY t) AS ns
  FROM ordered
), curve AS (
  SELECT unnest(ts) AS t, unnest(ds) AS d, unnest(ns) AS n_risk,
         unnest(list_transform(range(1, len(hs) + 1),
           i -> list_reduce(
                list_concat([CAST(0.0 AS DOUBLE)], list_slice(hs, 1, i)),
                (a, b) -> round(a + b, 12)))) AS cum_hazard
  FROM packed
)
SELECT t, d, n_risk, cum_hazard FROM curve WHERE d > 0
"""


@register("nelson_aalen_hazard", _NA_ORACLE)
def q_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard of signup->first-purchase by whole
    days, right-censored at each user's last event — the additive
    companion to the ext63 Kaplan-Meier product, same bounded-day
    broadcast risk-set frame, per-step round-12 quantized fold (the
    cross-engine float determinism hinge)."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("tp"),
        F.max("ts").alias("t_last"),
    )
    cohort = firsts.filter(F.col("t0").isNotNull()).select(
        F.when(
            F.col("tp").isNotNull() & (F.col("tp") >= F.col("t0")),
            F.datediff(F.col("tp"), F.col("t0")).cast("bigint"),
        ).alias("event_day"),
        F.datediff(F.col("t_last"), F.col("t0")).cast("bigint").alias("censor_day"),
    )
    horizons = cohort.select(
        F.coalesce(F.col("event_day"), F.col("censor_day")).alias("horizon"),
        F.when(F.col("event_day").isNotNull(), F.lit(1)).otherwise(F.lit(0)).alias(
            "is_event"
        ),
    )
    days = horizons.groupBy(F.col("horizon").alias("t")).agg(
        F.sum("is_event").cast("bigint").alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("leaving"),
    )
    later = days.select(F.col("t").alias("_lt"), F.col("leaving").alias("_ll"))
    ordered = (
        days.join(F.broadcast(later), F.col("_lt") >= F.col("t"), "left")
        .groupBy("t", "d", "leaving")
        .agg(F.sum("_ll").cast("bigint").alias("n_risk"))
    )
    packed = ordered.agg(
        F.array_sort(F.collect_list(F.struct("t", "d", "n_risk"))).alias("arr")
    ).select(
        F.col("arr"),
        F.transform(
            F.col("arr"),
            lambda s: s["d"].cast("double") / s["n_risk"].cast("double"),
        ).alias("hs"),
    )
    curve = packed.select(
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("hs")),
                lambda i: F.struct(
                    F.element_at(F.col("arr"), i)["t"].alias("t"),
                    F.element_at(F.col("arr"), i)["d"].alias("d"),
                    F.element_at(F.col("arr"), i)["n_risk"].alias("n_risk"),
                    F.aggregate(
                        F.slice(F.col("hs"), F.lit(1), i),
                        F.lit(0.0),
                        lambda a, b: F.round(a + b, 12),
                    ).alias("cum_hazard"),
                ),
            )
        ).alias("pos", "s")
    ).select("s.t", "s.d", "s.n_risk", "s.cum_hazard")
    return curve.filter(F.col("d") > 0)
