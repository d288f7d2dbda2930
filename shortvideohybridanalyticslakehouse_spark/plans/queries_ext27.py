"""Extension queries, round 27: forward as-of (time-to-next-event) and
the percent_rank/cume_dist analytic family.

The backward as-of (`asof_join_last_purchase`, queries_ext4) answers
"state at event time"; the forward variant answers "time to conversion" —
the other half of attribution. Both are the sort-based as-of shape: ONE
exchange on the key, no theta-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

# ---------------------------------------------------------------------------
# Forward as-of: time from each event to the user's NEXT purchase
# ---------------------------------------------------------------------------

_NEXT_ORACLE = """
WITH seq AS (
  SELECT user_id, ts, event_id, event_type,
    min(CASE WHEN event_type = 'purchase' THEN ts END) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
    ) AS next_p_ts
  FROM events WHERE ts IS NOT NULL
), gaps AS (
  SELECT event_type,
    CASE WHEN next_p_ts IS NOT NULL
         THEN date_diff('second', ts, next_p_ts) END AS gap_s
  FROM seq WHERE event_type <> 'purchase'
)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(count(gap_s) AS BIGINT) AS n_converted,
  CAST(coalesce(sum(gap_s), 0) AS BIGINT) AS sum_gap_s
FROM gaps
GROUP BY event_type
"""


@register("time_to_next_purchase", _NEXT_ORACLE)
def q_time_to_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: per event, the user's next purchase at-or-after it
    (frame `CURRENT ROW .. UNBOUNDED FOLLOWING` over one user_id sort —
    the mirror of the backward running-max as-of). Grouped to
    time-to-conversion totals per event type; sum of exact integer
    seconds so both engines agree bit-for-bit.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    p_ts = F.when(F.col("event_type") == "purchase", F.col("ts"))
    seq = ev.select(
        "event_type",
        "ts",
        F.min(p_ts).over(w).alias("next_p_ts"),
    ).filter(F.col("event_type") != "purchase")
    gap_s = F.when(
        F.col("next_p_ts").isNotNull(),
        F.col("next_p_ts").cast("long") - F.col("ts").cast("long"),
    )
    return (
        seq.select("event_type", gap_s.alias("gap_s"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("gap_s").alias("n_converted"),
            F.coalesce(F.sum("gap_s"), F.lit(0)).cast("bigint").alias("sum_gap_s"),
        )
    )


# ---------------------------------------------------------------------------
# percent_rank / cume_dist decile profile
# ---------------------------------------------------------------------------

# Tie semantics are the point: cume_dist gives every tied value the SAME
# fraction (rows <= value / n), percent_rank the same (rank-1)/(n-1) —
# identical definitions in Spark and DuckDB, so decile membership is
# engine-invariant even on duplicated prices.
_RANK_ORACLE = """
WITH ranked AS (
  SELECT o_orderpriority,
    CAST(o_totalprice AS DECIMAL(18,2)) AS price,
    percent_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS pr,
    cume_dist() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS cd
  FROM orders
)
SELECT o_orderpriority,
  CAST(count(*) AS BIGINT) AS n_orders,
  CAST(sum(CASE WHEN cd <= 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bottom_decile,
  CAST(sum(CASE WHEN pr >= 0.9 THEN 1 ELSE 0 END) AS BIGINT) AS n_top_decile,
  round(CAST(sum(CASE WHEN pr >= 0.9 THEN price END) AS DOUBLE)
        / CAST(sum(price) AS DOUBLE), 6) AS top_decile_revenue_share
FROM ranked
GROUP BY o_orderpriority
"""


@register("order_priority_decile_profile", _RANK_ORACLE)
def q_order_priority_decile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist per priority: bottom-decile population
    (cume_dist ties include the whole tied value) and top-decile revenue
    concentration. One shuffle on o_orderpriority; both window functions
    share the single sort.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice"))
    ranked = orders.select(
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    return ranked.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("cd") <= 0.1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_bottom_decile"),
        F.sum(F.when(F.col("pr") >= 0.9, 1).otherwise(0))
        .cast("bigint")
        .alias("n_top_decile"),
        F.round(
            F.sum(F.when(F.col("pr") >= 0.9, F.col("price")))
            .cast("double")
            / F.sum("price").cast("double"),
            6,
        ).alias("top_decile_revenue_share"),
    )
