"""Extension queries, round 75: operational latency analytics — order
fulfillment SLA and funnel step latency. Both need grouped EXACT
percentiles of integer durations; instead of a float interpolation both
engines might round differently, the percentile is the classic
cumulative-threshold order statistic (smallest value whose cumulative
count covers ceil(p*n) — the same integer machinery as the weighted
median in queries_ext59), so every output cell is an exact integer.

- order_fulfillment_sla: days from o_orderdate to the order's LAST ship
  date (the customer-visible completion), per order priority: exact
  p50/p90, mean in floored micro-days, and the share of orders breaching
  a 30-day SLA in floored micro units. Shapes: one join orders x
  per-order max-shipdate (both sides pre-aggregated), per-priority
  windows over O(orders per priority) duration frames.

- funnel_step_latency: per user, first view -> first click -> first
  purchase; exact quartiles of each step's transition seconds over the
  users that completed it. The heavy relation reduces to per-user firsts
  in one combinable aggregation; the quartile frames are O(users).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_SLA_DAYS = 30

_SLA_ORACLE = f"""
WITH done AS (
  SELECT l_orderkey AS okey, max(l_shipdate) AS last_ship
  FROM lineitem GROUP BY 1
), durs AS (
  SELECT o.o_orderpriority AS priority,
         CAST(date_diff('day', o.o_orderdate, d.last_ship) AS BIGINT) AS days
  FROM orders o JOIN done d ON d.okey = o.o_orderkey
), ranked AS (
  SELECT priority, days,
         row_number() OVER (PARTITION BY priority ORDER BY days) AS rn,
         count(*) OVER (PARTITION BY priority) AS n
  FROM durs
)
SELECT priority,
       CAST(max(n) AS BIGINT) AS n_orders,
       CAST(min(CASE WHEN 2 * rn >= n THEN days END) AS BIGINT) AS p50_days,
       CAST(min(CASE WHEN 10 * rn >= 9 * n THEN days END) AS BIGINT) AS p90_days,
       CAST(floor(CAST(sum(days) AS DOUBLE) * 1000000 / max(n)) AS BIGINT)
         AS mean_days_micro,
       CAST(floor(CAST(sum(CASE WHEN days > {_SLA_DAYS} THEN 1 ELSE 0 END)
            AS DOUBLE) * 1000000 / max(n)) AS BIGINT) AS breach_share_micro
FROM ranked GROUP BY priority
"""


@register("order_fulfillment_sla", _SLA_ORACLE)
def q_order_fulfillment_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order priority: exact p50/p90 days to last shipment, mean in
    micro-days, and the 30-day SLA breach share."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    done = li.groupBy(F.col("l_orderkey").alias("okey")).agg(
        F.max("l_shipdate").alias("last_ship")
    )
    durs = orders.join(done, orders["o_orderkey"] == done["okey"]).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(F.col("last_ship"), F.col("o_orderdate"))
        .cast("bigint")
        .alias("days"),
    )
    w = Window.partitionBy("priority").orderBy("days")
    ranked = durs.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("priority"))
    )
    return ranked.groupBy("priority").agg(
        F.max("n").cast("bigint").alias("n_orders"),
        F.min(F.when(2 * F.col("rn") >= F.col("n"), F.col("days")))
        .cast("bigint")
        .alias("p50_days"),
        F.min(F.when(10 * F.col("rn") >= 9 * F.col("n"), F.col("days")))
        .cast("bigint")
        .alias("p90_days"),
        F.floor(
            F.sum("days").cast("double") * 1000000 / F.max("n").cast("double")
        )
        .cast("bigint")
        .alias("mean_days_micro"),
        F.floor(
            F.sum(F.when(F.col("days") > _SLA_DAYS, 1).otherwise(0)).cast(
                "double"
            )
            * 1000000
            / F.max("n").cast("double")
        )
        .cast("bigint")
        .alias("breach_share_micro"),
    )


_FUNNEL_LAT_ORACLE = """
WITH firsts AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
), steps AS (
  SELECT 'view_to_click' AS step,
         CAST(floor(epoch(t_click)) - floor(epoch(t_view)) AS BIGINT) AS gap_s
  FROM firsts WHERE t_view IS NOT NULL AND t_click IS NOT NULL
    AND t_click >= t_view
  UNION ALL
  SELECT 'click_to_purchase',
         CAST(floor(epoch(t_purchase)) - floor(epoch(t_click)) AS BIGINT)
  FROM firsts WHERE t_click IS NOT NULL AND t_purchase IS NOT NULL
    AND t_purchase >= t_click
), ranked AS (
  SELECT step, gap_s,
         row_number() OVER (PARTITION BY step ORDER BY gap_s) AS rn,
         count(*) OVER (PARTITION BY step) AS n
  FROM steps
)
SELECT step,
       CAST(max(n) AS BIGINT) AS n_users,
       CAST(min(CASE WHEN 4 * rn >= n THEN gap_s END) AS BIGINT) AS q1_s,
       CAST(min(CASE WHEN 2 * rn >= n THEN gap_s END) AS BIGINT) AS median_s,
       CAST(min(CASE WHEN 4 * rn >= 3 * n THEN gap_s END) AS BIGINT) AS q3_s
FROM ranked GROUP BY step
"""


@register("funnel_step_latency", _FUNNEL_LAT_ORACLE)
def q_funnel_step_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quartiles of seconds between funnel-step firsts (view ->
    click -> purchase) over the users that completed each step in
    order."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
            "t_click"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    s1 = firsts.filter(
        F.col("t_view").isNotNull()
        & F.col("t_click").isNotNull()
        & (F.col("t_click") >= F.col("t_view"))
    ).select(
        F.lit("view_to_click").alias("step"),
        (F.col("t_click").cast("long") - F.col("t_view").cast("long"))
        .cast("bigint")
        .alias("gap_s"),
    )
    s2 = firsts.filter(
        F.col("t_click").isNotNull()
        & F.col("t_purchase").isNotNull()
        & (F.col("t_purchase") >= F.col("t_click"))
    ).select(
        F.lit("click_to_purchase").alias("step"),
        (F.col("t_purchase").cast("long") - F.col("t_click").cast("long"))
        .cast("bigint")
        .alias("gap_s"),
    )
    steps = s1.unionByName(s2)
    w = Window.partitionBy("step").orderBy("gap_s")
    ranked = steps.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("step"))
    )
    return ranked.groupBy("step").agg(
        F.max("n").cast("bigint").alias("n_users"),
        F.min(F.when(4 * F.col("rn") >= F.col("n"), F.col("gap_s")))
        .cast("bigint")
        .alias("q1_s"),
        F.min(F.when(2 * F.col("rn") >= F.col("n"), F.col("gap_s")))
        .cast("bigint")
        .alias("median_s"),
        F.min(F.when(4 * F.col("rn") >= 3 * F.col("n"), F.col("gap_s")))
        .cast("bigint")
        .alias("q3_s"),
    )
