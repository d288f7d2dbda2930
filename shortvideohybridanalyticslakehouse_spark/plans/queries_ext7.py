"""Extension queries, round 7: the ranking-window surface the reference
never grew (SURVEY.md §2.5 — "No ranking beyond row_number"): ntile /
percent_rank / cume_dist quartiles, last-observation-carried-forward
imputation via IGNORE NULLS windows, and frame-bounded moving averages.

Determinism notes:
- ntile splits ties by ROW position, so the window ORDER BY must be a
  TOTAL order (spend, custkey) or engines disagree on bucket edges.
- percent_rank/cume_dist are (rank-1)/(n-1)-style divisions — identical
  operands on both engines → bit-identical doubles; they are aggregated
  with order-independent min/max, never averaged (float-sum order).
- moving average = decimal frame-sum / frame-count, divided once at the
  end — not avg() over doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.operators import ranks
from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

# ---------------------------------------------------------------------------
# ntile / percent_rank / cume_dist: customer spend quartiles per segment
# ---------------------------------------------------------------------------

_QUARTILES_ORACLE = """
WITH spend AS (
  SELECT c_custkey, c_mktsegment,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total_spend
  FROM customer JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey, c_mktsegment
), ranked AS (
  SELECT c_mktsegment, total_spend,
         ntile(4) OVER (PARTITION BY c_mktsegment
                        ORDER BY total_spend, c_custkey) AS quartile,
         percent_rank() OVER (PARTITION BY c_mktsegment
                              ORDER BY total_spend) AS pr,
         cume_dist() OVER (PARTITION BY c_mktsegment
                           ORDER BY total_spend) AS cd
  FROM spend
)
SELECT
  c_mktsegment,
  CAST(quartile AS BIGINT) AS quartile,
  CAST(count(*) AS BIGINT) AS n_cust,
  CAST(sum(total_spend) AS DOUBLE) AS quartile_spend,
  round(min(pr), 6) AS min_pr,
  round(max(cd), 6) AS max_cd
FROM ranked
GROUP BY c_mktsegment, quartile
"""


@register("customer_spend_quartiles", _QUARTILES_ORACLE)
def q_customer_spend_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifetime-spend quartiles within each market segment:
    ntile(4) over a TOTAL order (spend, custkey — ties must not let the
    engines bucket differently), percent_rank/cume_dist summarized with
    order-independent min/max.

    Round-3 rework: per-segment ntile/percent_rank windows sorted each
    segment on ONE core (5 segments = 5-way parallelism, skew-bound at
    100x). Exact per-segment row numbers now come from operators/ranks.py
    (bucketed distributed ranking); quartile is ntile arithmetic, and
    percent_rank/cume_dist derive from tie-group min/max of the exact rank
    — (rank_min-1)/(n-1) and rank_max/n, the engines' own formulas — so
    results stay bit-identical to the window form and the oracle is
    unchanged.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    spend = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total_spend")
        )
    )
    ranked = ranks.with_distributed_row_number(
        spend.select("c_mktsegment", "c_custkey", "total_spend"),
        part_cols=["c_mktsegment"],
        order_cols=["total_spend", "c_custkey"],
        single_pass=True,
    )
    # tie groups share percent_rank (RANK = min rn) and cume_dist (max rn)
    w_ties = Window.partitionBy("c_mktsegment", "total_spend")
    annotated = ranked.select(
        "c_mktsegment",
        "total_spend",
        ranks.ntile_from_rank(F.col("_rn"), F.col("_n"), 4).alias("quartile"),
        F.when(
            F.col("_n") > 1,
            (F.min("_rn").over(w_ties) - F.lit(1))
            / (F.col("_n") - F.lit(1)).cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("pr"),
        (F.max("_rn").over(w_ties) / F.col("_n").cast("double")).alias("cd"),
    )
    return annotated.groupBy(
        "c_mktsegment", F.col("quartile").cast("bigint").alias("quartile")
    ).agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.sum("total_spend").cast("double").alias("quartile_spend"),
        F.round(F.min("pr"), 6).alias("min_pr"),
        F.round(F.max("cd"), 6).alias("max_cd"),
    )


# ---------------------------------------------------------------------------
# LOCF forward-fill (IGNORE NULLS window) — feature imputation
# ---------------------------------------------------------------------------

# One shuffle on user_id + one in-partition sort; the carried value is
# last(ignorenulls) over an unbounded-preceding ROWS frame — Spark keeps
# one running value per partition, no per-row rescans.
_LOCF_ORACLE = """
WITH marked AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN event_type = 'purchase' THEN value END AS pv
  FROM events
), filled AS (
  SELECT event_type,
         last_value(pv IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS carried
  FROM marked
)
SELECT
  event_type,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(count(carried) AS BIGINT) AS n_filled,
  CAST(sum(CAST(carried AS DECIMAL(18,6))) AS DOUBLE) AS sum_carried
FROM filled
GROUP BY event_type
"""


@register("locf_purchase_value_fill", _LOCF_ORACLE)
def q_locf_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward: every event annotated with the
    user's most recent purchase value at-or-before it (NULL until the
    first purchase). The standard sparse-feature imputation for training
    rows — same sort-based shape as the as-of join, zero extra joins.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.col("event_type") == "purchase", F.col("value")).alias("pv"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = ev.select(
        "event_type", F.last("pv", ignorenulls=True).over(w).alias("carried")
    )
    return filled.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("carried").alias("n_filled"),
        F.sum(F.col("carried").cast("decimal(18,6)")).cast("double").alias(
            "sum_carried"
        ),
    )


# ---------------------------------------------------------------------------
# Frame-bounded moving average over the daily revenue series
# ---------------------------------------------------------------------------

_MOVAVG_ORACLE = """
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders
  GROUP BY 1
)
SELECT
  CAST(day AS TIMESTAMP) AS day,
  n_orders,
  CAST(rev AS DOUBLE) AS rev,
  round(
    CAST(sum(rev) OVER w AS DOUBLE)
      / CAST(count(*) OVER w AS DOUBLE),
    4
  ) AS rev_ma7
FROM daily
WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


@register("daily_revenue_moving_avg", _MOVAVG_ORACLE)
def q_daily_revenue_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day moving average of daily order revenue. The mean is
    decimal-frame-sum / frame-count with ONE final division — avg() over
    doubles would make the result depend on intra-frame add order.

    Single unpartitioned day-grain series: the window runs on the ~2.4k
    aggregated rows, not the fact table — at 100 TB the heavy lifting is
    still the map-side-combined daily rollup.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("day"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    # O(days)-row frame: single partition is the design; non-foldable
    # constant key silences the WindowExec warning.
    w = (
        Window.partitionBy(F.year("day") * 0)
        .orderBy("day")
        .rowsBetween(-6, 0)
    )
    return daily.select(
        "day",
        "n_orders",
        F.col("rev").cast("double").alias("rev"),
        F.round(
            F.sum("rev").over(w).cast("double")
            / F.count(F.lit(1)).over(w).cast("double"),
            4,
        ).alias("rev_ma7"),
    )
