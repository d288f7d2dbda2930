"""Extension queries, round 63: probabilistic record linkage (entity
resolution) and Kaplan-Meier survival — two analytics families a
warehouse team reaches for constantly, absent from the reference's SQL
surface (its scope stops at exact-key MERGE upserts,
src/spark/rt_video_cdc_upsert_sql.py).

- customer_supplier_linkage: Fellegi-Sunter-shaped linkage between the
  customer and supplier registries. BLOCK on nationkey (the classic
  blocking key: candidate pairs shrink from |C|x|S| to sum over blocks),
  then score each candidate with integer evidence weights — name-suffix
  agreement, account-balance proximity, a name-key residue — and
  keep each customer's best match above threshold via one window. All
  evidence is integer arithmetic; ties break deterministically. Scale:
  the block join shuffles on the blocking key only; skewed blocks would
  salt exactly like any skewed equi-join (operators/skew.py); scoring is
  scan-side codegen; best-match is a per-customer window over its
  in-block candidates.

- signup_purchase_survival: the Kaplan-Meier estimator over
  days-to-first-purchase after first signup (right-censored at each
  user's last observed event). Risk sets and event counts are exact
  integers per day; the survival curve is the per-step product
  S_t = round(S_{t-1} * (1 - d_t/n_t), 12) — quantized at every step
  (the PageRank determinism trick), so both engines replay identical
  doubles. The day frame is O(distinct horizons) — tiny — so the
  quadratic prefix-fold both engines use (fold over slice(i)) is free;
  the heavy events relation reduces to per-user firsts in one
  map-side-combinable aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_W_SUFFIX = 3  # same trailing-2 name digits (string evidence)
_W_BAL = 2  # account balances within 500.00 of each other
_W_NAME = 2  # name-key residue agreement (id % 97)
_THRESHOLD = 4

_LINKAGE_ORACLE = f"""
WITH cand AS (
  SELECT c.c_custkey, s.s_suppkey,
         CASE WHEN substr(c.c_name, length(c.c_name) - 1, 2)
                 = substr(s.s_name, length(s.s_name) - 1, 2)
              THEN {_W_SUFFIX} ELSE 0 END
       + CASE WHEN abs(CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                    - CAST(CAST(s.s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) <= 50000
              THEN {_W_BAL} ELSE 0 END
       + CASE WHEN c.c_custkey % 97 = s.s_suppkey % 97
              THEN {_W_NAME} ELSE 0 END AS score
  FROM customer c JOIN supplier s ON c.c_nationkey = s.s_nationkey
), best AS (
  SELECT c_custkey, s_suppkey, score,
         row_number() OVER (PARTITION BY c_custkey
                            ORDER BY score DESC, s_suppkey ASC) AS rn
  FROM cand WHERE score >= {_THRESHOLD}
)
SELECT c_custkey, s_suppkey AS linked_suppkey, score
FROM best WHERE rn = 1
"""


@register("customer_supplier_linkage", _LINKAGE_ORACLE)
def q_customer_supplier_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked, weighted record linkage: nationkey blocking join, integer
    evidence scores (name-suffix / balance proximity / name-key residue),
    threshold, best-match-per-customer window."""
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    cand = cust.join(
        supp, cust["c_nationkey"] == supp["s_nationkey"]
    ).select(
        "c_custkey",
        "s_suppkey",
        (
            F.when(
                F.substring(F.col("c_name"), -2, 2)
                == F.substring(F.col("s_name"), -2, 2),
                F.lit(_W_SUFFIX),
            ).otherwise(F.lit(0))
            + F.when(
                # cents via DECIMAL(18,2) in BOTH engines: double->bigint
                # casts truncate in Spark but round in DuckDB, which can
                # flip the evidence at the 50000-cent boundary
                F.abs(
                    (F.col("c_acctbal").cast("decimal(18,2)") * 100).cast("bigint")
                    - (F.col("s_acctbal").cast("decimal(18,2)") * 100).cast("bigint")
                )
                <= 50000,
                F.lit(_W_BAL),
            ).otherwise(F.lit(0))
            + F.when(
                F.col("c_custkey") % 97 == F.col("s_suppkey") % 97,
                F.lit(_W_NAME),
            ).otherwise(F.lit(0))
        ).alias("score"),
    )
    best = cand.filter(F.col("score") >= _THRESHOLD).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("c_custkey").orderBy(
                F.col("score").desc(), F.col("s_suppkey").asc()
            )
        ),
    )
    return best.filter(F.col("rn") == 1).select(
        "c_custkey", F.col("s_suppkey").alias("linked_suppkey"), "score"
    )


_SURVIVAL_ORACLE = """
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
              AS BIGINT) AS n_risk,
         row_number() OVER (ORDER BY t) AS rn
  FROM days
), packed AS (
  SELECT list(CAST(1.0 AS DOUBLE)
              - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)
              ORDER BY t) AS rs,
         list(t ORDER BY t) AS ts,
         list(d ORDER BY t) AS ds,
         list(n_risk ORDER BY t) AS ns
  FROM ordered
), curve AS (
  SELECT unnest(ts) AS t, unnest(ds) AS d, unnest(ns) AS n_risk,
         unnest(list_transform(range(1, len(rs) + 1),
           i -> list_reduce(
                list_concat([CAST(1.0 AS DOUBLE)], list_slice(rs, 1, i)),
                (a, b) -> round(a * b, 12)))) AS surv
  FROM packed
)
SELECT t, d, n_risk, surv FROM curve WHERE d > 0
"""


@register("signup_purchase_survival", _SURVIVAL_ORACLE)
def q_signup_purchase_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival of "not yet purchased" by whole days since
    first signup, right-censored at each user's last event. Rows: event
    days only, with the exact risk set, event count, and the per-step
    round-12 quantized survival product."""
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
    # risk set = everyone leaving at this horizon or later. The day frame
    # is O(distinct horizons) — bounded by the calendar, never the data —
    # so the suffix sum comes from a broadcast O(days^2) range self-join
    # (the ranks.py global-case idiom): no window, no single-partition
    # WindowExec (Spark 4 folds literal partition keys away, so the
    # lit-partition trick no longer silences the warning).
    later = days.select(F.col("t").alias("_lt"), F.col("leaving").alias("_ll"))
    ordered = (
        days.join(F.broadcast(later), F.col("_lt") >= F.col("t"), "left")
        .groupBy("t", "d", "leaving")
        .agg(F.sum("_ll").cast("bigint").alias("n_risk"))
    )
    packed = ordered.agg(
        F.array_sort(
            F.collect_list(F.struct("t", "d", "n_risk"))
        ).alias("arr")
    ).select(
        F.col("arr"),
        F.transform(
            F.col("arr"),
            lambda s: F.lit(1.0) - s["d"].cast("double") / s["n_risk"].cast("double"),
        ).alias("rs"),
    )
    curve = packed.select(
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("rs")),
                lambda i: F.struct(
                    F.element_at(F.col("arr"), i)["t"].alias("t"),
                    F.element_at(F.col("arr"), i)["d"].alias("d"),
                    F.element_at(F.col("arr"), i)["n_risk"].alias("n_risk"),
                    F.aggregate(
                        F.slice(F.col("rs"), F.lit(1), i),
                        F.lit(1.0),
                        lambda a, b: F.round(a * b, 12),
                    ).alias("surv"),
                ),
            )
        ).alias("pos", "s")
    ).select("s.t", "s.d", "s.n_risk", "s.surv")
    return curve.filter(F.col("d") > 0)
