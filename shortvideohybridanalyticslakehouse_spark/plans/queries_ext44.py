"""Product-analytics composites over the events stream (round-4): ordered
conversion funnel and daily retention cohorts — the two classic
user-journey queries every analytics engine ships, expressed as pure
aggregate/join plans (no window-over-everything, no per-user collect).

Scale notes: both queries reduce events to per-user scalars with map-side-
combinable min/first aggregations before any join, so shuffle volume is
O(users), not O(events); the funnel's step joins are user-key equi-joins of
monotonically SHRINKING relations (step N+1's input is step N's survivors).

Reference analog: the reference's BI pack reports distribution snapshots
(bi_summary_*.py) but has no journey/funnel analysis — beyond-parity
capability on the same tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_FUNNEL_ORACLE = """
WITH v AS (
  SELECT user_id, min(ts) AS v_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.ts) AS c_ts
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.v_ts
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS p_ts
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
  GROUP BY e.user_id
)
SELECT 1 AS step_no, 'view' AS step,
       (SELECT count(*) FROM v) AS n_users,
       CAST(NULL AS DOUBLE) AS avg_secs_from_prev
UNION ALL
SELECT 2, 'click', (SELECT count(*) FROM c),
       (SELECT ROUND(AVG(CAST(date_diff('second', v.v_ts, c.c_ts) AS BIGINT)), 6)
        FROM c JOIN v ON c.user_id = v.user_id)
UNION ALL
SELECT 3, 'purchase', (SELECT count(*) FROM p),
       (SELECT ROUND(AVG(CAST(date_diff('second', c.c_ts, p.p_ts) AS BIGINT)), 6)
        FROM p JOIN c ON p.user_id = c.user_id)
"""


@register("conversion_funnel_ordered", _FUNNEL_ORACLE)
def q_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRICTLY-ORDERED funnel view -> click -> purchase: a user advances a
    step only with an event strictly after their previous step's first
    event (the semantics ad-hoc `countDistinct(event_type)` funnels get
    wrong). Latencies are exact integer-second averages."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"), F.first("v_ts").alias("v_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c.select("user_id", "c_ts"), "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"), F.first("c_ts").alias("c_ts"))
    )
    secs = lambda a, b: (F.col(b).cast("long") - F.col(a).cast("long"))  # noqa: E731
    step1 = v.agg(
        F.lit(1).alias("step_no"),
        F.lit("view").alias("step"),
        F.count(F.lit(1)).alias("n_users"),
        F.lit(None).cast("double").alias("avg_secs_from_prev"),
    )
    step2 = c.agg(
        F.lit(2).alias("step_no"),
        F.lit("click").alias("step"),
        F.count(F.lit(1)).alias("n_users"),
        F.round(F.avg(secs("v_ts", "c_ts")), 6).alias("avg_secs_from_prev"),
    )
    step3 = p.agg(
        F.lit(3).alias("step_no"),
        F.lit("purchase").alias("step"),
        F.count(F.lit(1)).alias("n_users"),
        F.round(F.avg(secs("c_ts", "p_ts")), 6).alias("avg_secs_from_prev"),
    )
    return step1.unionByName(step2).unionByName(step3).orderBy("step_no")


_RETENTION_ORACLE = """
WITH firsts AS (
  SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id
), act AS (
  SELECT DISTINCT e.user_id,
    strftime(date_trunc('day', f.first_ts), '%Y-%m-%d') AS cohort_day,
    CAST(FLOOR(date_diff('second', f.first_ts, e.ts) / 86400.0) AS BIGINT) AS day_no
  FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT cohort_day, day_no, count(*) AS n_active
FROM act
GROUP BY cohort_day, day_no
"""


@register("retention_cohorts_daily", _RETENTION_ORACLE)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily retention matrix: users grouped by first-seen day (cohort),
    counted once per 24h offset they return in. Offsets are computed from
    each user's own first event (not calendar midnight), so the matrix is
    timezone-invariant."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    act = (
        ev.select("user_id", "ts")
        .join(firsts, "user_id")
        .select(
            "user_id",
            F.date_format(F.col("first_ts"), "yyyy-MM-dd").alias("cohort_day"),
            F.floor(
                (F.col("ts").cast("long") - F.col("first_ts").cast("long"))
                / 86400.0
            )
            .cast("bigint")
            .alias("day_no"),
        )
        .distinct()
    )
    return act.groupBy("cohort_day", "day_no").agg(
        F.count(F.lit(1)).alias("n_active")
    )
