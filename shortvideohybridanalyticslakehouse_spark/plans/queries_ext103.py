"""Extension queries, round 103: order-fulfillment operations — open
order aging, the ordered-vs-shipped backlog burn-down, and
order-to-ship latency by priority. All money through the DECIMAL(18,2)
cents hop; ages and latencies in whole days via datediff (identical
truncation both engines); the only window-free cumulative (backlog) uses
the bounded-month broadcast suffix/prefix idiom."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_CENTS_O = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
_CENTS_L = (
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
)

_AGING_ORACLE = f"""
WITH anchor AS (
  SELECT max(o_orderdate) AS now FROM orders
), aged AS (
  SELECT o.o_orderkey, o.o_orderstatus,
         date_diff('day', o.o_orderdate, a.now) AS age_days,
         {_CENTS_O} AS cents
  FROM orders o, anchor a
  WHERE o.o_orderstatus <> 'F'
), bucketed AS (
  SELECT CASE WHEN age_days < 30 THEN '00-29'
              WHEN age_days < 90 THEN '30-89'
              WHEN age_days < 180 THEN '90-179'
              ELSE '180+' END AS age_bucket,
         o_orderstatus, cents
  FROM aged
)
SELECT age_bucket, o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS open_cents
FROM bucketed GROUP BY 1, 2 ORDER BY 1, 2
"""


@register("open_order_aging_buckets", _AGING_ORACLE)
def q_open_order_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aging report for non-finalized orders: day-age buckets (vs the
    data's own latest order date — no wall clock) by status, with exact
    open value in cents."""
    o = load_table(spark, sf_dir, "orders")
    anchor = F.broadcast(o.agg(F.max("o_orderdate").alias("now")))
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    aged = (
        o.filter(F.col("o_orderstatus") != "F")
        .crossJoin(anchor)
        .select(
            "o_orderstatus",
            F.datediff(F.col("now"), F.col("o_orderdate")).alias("age_days"),
            cents.alias("cents"),
        )
    )
    bucket = (
        F.when(F.col("age_days") < 30, "00-29")
        .when(F.col("age_days") < 90, "30-89")
        .when(F.col("age_days") < 180, "90-179")
        .otherwise("180+")
    )
    return (
        aged.groupBy(bucket.alias("age_bucket"), "o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("open_cents"),
        )
        .orderBy("age_bucket", "o_orderstatus")
    )


_BURNDOWN_ORACLE = f"""
WITH ordered AS (
  SELECT date_trunc('month', o_orderdate) AS m,
         CAST(sum({_CENTS_O}) AS BIGINT) AS ordered_cents
  FROM orders GROUP BY 1
), shipped AS (
  SELECT date_trunc('month', l_shipdate) AS m,
         CAST(sum({_CENTS_L}) AS BIGINT) AS shipped_cents
  FROM lineitem GROUP BY 1
), months AS (
  SELECT m, coalesce(o.ordered_cents, 0) AS ordered_cents,
         coalesce(s.shipped_cents, 0) AS shipped_cents
  FROM ordered o FULL OUTER JOIN shipped s USING (m)
)
SELECT a.m,
       CAST(a.ordered_cents AS BIGINT) AS ordered_cents,
       CAST(a.shipped_cents AS BIGINT) AS shipped_cents,
       CAST(sum(b.ordered_cents) AS BIGINT) AS cum_ordered_cents,
       CAST(sum(b.shipped_cents) AS BIGINT) AS cum_shipped_cents,
       CAST(sum(b.ordered_cents) - sum(b.shipped_cents) AS BIGINT)
         AS backlog_cents
FROM months a JOIN months b ON b.m <= a.m
GROUP BY 1, 2, 3 ORDER BY 1
"""


@register("order_ship_backlog_burndown", _BURNDOWN_ORACLE)
def q_backlog_burndown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly ordered-value vs shipped-value burn-down with the running
    backlog (cumulative ordered minus cumulative shipped, exact cents).
    The month frame is calendar-bounded, so the cumulative comes from the
    broadcast O(months^2) range self-join — no single-partition window."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    oc = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    lc = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("bigint")
    ordered = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("m")
    ).agg(F.sum(oc).cast("bigint").alias("ordered_cents"))
    shipped = li.groupBy(
        F.date_trunc("month", F.col("l_shipdate")).alias("m")
    ).agg(F.sum(lc).cast("bigint").alias("shipped_cents"))
    months = (
        ordered.join(shipped, "m", "full_outer")
        .select(
            "m",
            F.coalesce("ordered_cents", F.lit(0)).alias("ordered_cents"),
            F.coalesce("shipped_cents", F.lit(0)).alias("shipped_cents"),
        )
    )
    other = months.select(
        F.col("m").alias("_m2"),
        F.col("ordered_cents").alias("_oc"),
        F.col("shipped_cents").alias("_sc"),
    )
    return (
        months.join(F.broadcast(other), F.col("_m2") <= F.col("m"))
        .groupBy("m", "ordered_cents", "shipped_cents")
        .agg(
            F.sum("_oc").cast("bigint").alias("cum_ordered_cents"),
            F.sum("_sc").cast("bigint").alias("cum_shipped_cents"),
            (F.sum("_oc") - F.sum("_sc")).cast("bigint").alias("backlog_cents"),
        )
        .orderBy("m")
    )


_LATENCY_ORACLE = """
WITH per_order AS (
  SELECT o.o_orderkey, o.o_orderpriority,
         date_diff('day', o.o_orderdate, min(l.l_shipdate)) AS first_ship_days,
         date_diff('day', o.o_orderdate, max(l.l_shipdate)) AS last_ship_days,
         CAST(count(*) AS BIGINT) AS n_lines
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2, o.o_orderdate
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(first_ship_days) AS BIGINT) AS sum_first_ship_days,
       CAST(max(last_ship_days) AS BIGINT) AS max_last_ship_days,
       CAST(sum(first_ship_days) * 1000 // count(*) AS BIGINT)
         AS mean_first_ship_millidays,
       CAST(sum(CASE WHEN first_ship_days < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_ship_before_order
FROM per_order GROUP BY 1 ORDER BY 1
"""


@register("order_ship_latency_by_priority", _LATENCY_ORACLE)
def q_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-first-ship latency by priority (whole days, exact
    integer mean in millidays) plus a data-quality tripwire counting
    lines shipped before their order date."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    per_order = (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(
            F.datediff(F.min("l_shipdate"), F.col("o_orderdate")).alias(
                "first_ship_days"
            ),
            F.datediff(F.max("l_shipdate"), F.col("o_orderdate")).alias(
                "last_ship_days"
            ),
        )
    )
    agg = per_order.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("first_ship_days").cast("bigint").alias("sum_first_ship_days"),
        F.max("last_ship_days").cast("bigint").alias("max_last_ship_days"),
        F.sum(F.when(F.col("first_ship_days") < 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_ship_before_order"),
    )
    # sums can be NEGATIVE here (the fixture ships lines independently of
    # the order date), and DuckDB's // TRUNCATES while floor() floors —
    # Spark's DIV is the truncating twin, so the mean uses DIV on both
    # sides (the ext90 half-up-DIV family rule)
    return agg.select(
        "o_orderpriority",
        "n_orders",
        "sum_first_ship_days",
        "max_last_ship_days",
        F.expr("CAST((sum_first_ship_days * 1000) DIV n_orders AS BIGINT)").alias(
            "mean_first_ship_millidays"
        ),
        "n_ship_before_order",
    ).orderBy("o_orderpriority")
