"""Extension queries, round 15: relational-surface closers — UNPIVOT
(wide→long melt), GROUPING SETS with grouping_id provenance, equi-depth
feature binning (ntile), and a decorrelated per-group-average filter
(the classic correlated subquery, window-rewritten).

Reference analog: the serving layer pivots thresholds wide
(SURVEY.md §3.3 J2) and the BI pack pivots decision counts; these add
the inverse direction and the grouping-provenance variants Spark SQL
supports natively. All hash-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.operators import ranks
from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

# ---------------------------------------------------------------------------
# UNPIVOT: wide per-type counts melted to (user_id, event_type, n) long form
# ---------------------------------------------------------------------------

# Melt after aggregation: the wide table is one row per user, so unpivot
# multiplies the AGGREGATED grain (5 rows/user), never raw events. Zero
# counts are kept — the consumer decides whether absence means 0.
_UNPIVOT_ORACLE = """
WITH wide AS (
  SELECT user_id,
    CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view,
    CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
    CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase
  FROM events GROUP BY user_id
)
SELECT user_id, metric, n FROM wide
UNPIVOT (n FOR metric IN (view, click, purchase))
ORDER BY user_id, metric
"""


@register("unpivot_user_metrics", _UNPIVOT_ORACLE)
def q_unpivot_user_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt of per-user event-type counts via native UNPIVOT
    (Spark `unpivot`/stack — the inverse of pivot_event_type_counts).
    DuckDB's UNPIVOT drops nothing here because counts are never NULL.
    """
    ev = load_table(spark, sf_dir, "events")
    wide = ev.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "view", 1)).alias("view"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("click"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("purchase"),
    )
    return wide.unpivot(
        ids=["user_id"],
        values=["view", "click", "purchase"],
        variableColumnName="metric",
        valueColumnName="n",
    )


# ---------------------------------------------------------------------------
# GROUPING SETS with grouping_id provenance
# ---------------------------------------------------------------------------

# Disjoint sets (by-status, by-priority, grand total) in ONE pass —
# Spark expands the sets inside a single partial-aggregated shuffle,
# same as ROLLUP but with an explicit, non-hierarchical set list.
# grouping_id disambiguates "NULL because aggregated away" from a NULL
# grouping value — the provenance column COALESCE alone can't provide.
_GROUPING_SETS_ORACLE = """
SELECT
  coalesce(o_orderstatus, '__all__') AS orderstatus,
  coalesce(o_orderpriority, '__all__') AS orderpriority,
  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT)
    AS gid,
  CAST(count(*) AS BIGINT) AS n_orders,
  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
    AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@register("grouping_sets_order_totals", _GROUPING_SETS_ORACLE)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order totals by status, by priority, and overall — three reports
    from one scan via GROUPING SETS, with grouping_id provenance so a
    NULL grouping value could never masquerade as a subtotal row.
    """
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT
          coalesce(o_orderstatus, '__all__') AS orderstatus,
          coalesce(o_orderpriority, '__all__') AS orderpriority,
          CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
          count(*) AS n_orders,
          round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
            AS total_price
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# ---------------------------------------------------------------------------
# Equi-depth feature binning (ntile deciles with bin edges)
# ---------------------------------------------------------------------------

# The feature-preprocessing primitive: decile bins with observed edges
# and occupancy. ntile needs a TOTAL order — (value, event_id) — or rows
# tied on value would land in different bins per engine. The window sorts
# once; the per-bin rollup is 10 rows.
_BINS_ORACLE = """
WITH ranked AS (
  SELECT value, ntile(10) OVER (ORDER BY value, event_id) AS bin
  FROM events WHERE value IS NOT NULL
)
SELECT
  CAST(bin AS BIGINT) AS bin,
  CAST(count(*) AS BIGINT) AS n,
  round(CAST(min(value) AS DOUBLE), 6) AS lo,
  round(CAST(max(value) AS DOUBLE), 6) AS hi
FROM ranked GROUP BY bin
"""


@register("equi_depth_value_bins", _BINS_ORACLE)
def q_equi_depth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (decile) binning of event values with per-bin edges —
    the quantile-bucketing step of feature preprocessing. Total-order
    tie-break on event_id makes bin membership engine-independent.

    Round-3 rework: ntile's window forced a SINGLE-PARTITION global sort
    (PLANS.md flagged it as the 100x killer). Now the exact row number
    comes from operators/ranks.py — broadcast approx-quantile cut points
    bucket the scan, per-bucket counts give prefix offsets, row_number
    runs per bucket — and the decile is ntile arithmetic over that rank.
    Output is bit-identical to the window form, so the exact-ntile oracle
    stays the check.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("value", "event_id")
    )
    ranked = ranks.with_distributed_row_number(
        ev, part_cols=[], order_cols=["value", "event_id"]
    )
    binned = ranked.withColumn(
        "bin", ranks.ntile_from_rank(F.col("_rn"), F.col("_n"), 10)
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("value").cast("double"), 6).alias("lo"),
        F.round(F.max("value").cast("double"), 6).alias("hi"),
    ).select(F.col("bin").cast("bigint").alias("bin"), "n", "lo", "hi")


# ---------------------------------------------------------------------------
# Decorrelated per-group-average filter (correlated subquery, window form)
# ---------------------------------------------------------------------------

# `WHERE o_totalprice > (SELECT avg(...) FROM orders o2 WHERE
# o2.o_custkey = o.o_custkey)` decorrelates to ONE window pass — no
# second scan, no join. The comparison cross-multiplies exact decimal
# sums (price * n > total) so the boundary never depends on float
# division order.
_ABOVE_AVG_ORACLE = """
WITH w AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
              OVER (PARTITION BY o_custkey) AS DECIMAL(38,2)) AS cust_total,
         CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS cust_n
  FROM orders
)
SELECT
  CAST(o_custkey AS BIGINT) AS o_custkey,
  CAST(count(*) AS BIGINT) AS n_above,
  CAST(max(cust_n) AS BIGINT) AS n_orders
FROM w
WHERE CAST(o_totalprice AS DECIMAL(18,2)) * cust_n > cust_total
GROUP BY o_custkey
"""


@register("orders_above_customer_avg", _ABOVE_AVG_ORACLE)
def q_orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer count of orders priced above that customer's own
    average — the correlated-subquery classic, decorrelated into one
    window pass over a single orders scan (one shuffle on custkey,
    reused by the final per-customer rollup).
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    w = Window.partitionBy("o_custkey")
    annotated = orders.select(
        "o_custkey",
        "price",
        F.sum("price").over(w).cast("decimal(38,2)").alias("cust_total"),
        F.count(F.lit(1)).over(w).alias("cust_n"),
    )
    return (
        annotated.filter(F.col("price") * F.col("cust_n") > F.col("cust_total"))
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_above"),
            F.max("cust_n").alias("n_orders"),
        )
        .select(
            F.col("o_custkey").cast("bigint").alias("o_custkey"),
            "n_above",
            "n_orders",
        )
    )
