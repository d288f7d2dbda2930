"""Extension queries, round 18: recursive CTE calendar gap-fill (Spark 4
WITH RECURSIVE), bag-semantics set ops (EXCEPT ALL / INTERSECT ALL),
and the percentile_approx scale path as a first-class query.

Recursion notes: Spark 4.1 supports WITH RECURSIVE with UNION ALL only
(UNION — cycle-safe dedup — raises UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE,
so graph closure over cyclic edges stays on the iterative
connected-components operator in queries_ext6). Bounded acyclic
recursion like a calendar series is the supported shape; the month
series here is ~80 levels, well under spark.sql.cteRecursionLevelLimit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

# ---------------------------------------------------------------------------
# Recursive CTE: monthly calendar spine with zero-filled revenue
# ---------------------------------------------------------------------------

# The recursive seed/step is IDENTICAL SQL in both engines; the spine is
# O(months) rows however big orders is, and the revenue rollup joins
# onto it broadcast-side. Zero-fill distinguishes "no orders that
# month" from "month outside the data span" — the spine defines truth.
#
# The Spark side inlines the min/max bounds as literals (one tiny
# agg-collect of 2 values): a scalar subquery inside the recursive
# step's WHERE is re-planned and re-run at EVERY recursion level (~80
# full orders scans — measured 12.8s at sf0.1, vs <1s inlined). The
# oracle keeps the subquery form — DuckDB evaluates it once — proving
# the two forms agree.
_CAL_SQL = """
WITH RECURSIVE spine(month_start) AS (
  SELECT CAST(date_trunc('month', {min_ts}) AS TIMESTAMP)
  UNION ALL
  SELECT month_start + INTERVAL '1' MONTH FROM spine
  WHERE month_start < CAST(date_trunc('month', {max_ts}) AS TIMESTAMP)
)
SELECT
  s.month_start,
  CAST(coalesce(r.n_orders, 0) AS BIGINT) AS n_orders,
  round(CAST(coalesce(r.revenue, CAST(0.00 AS DECIMAL(38,2))) AS DOUBLE), 2)
    AS revenue
FROM spine s
LEFT JOIN (
  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS m,
         count(*) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
           AS revenue
  FROM {orders} GROUP BY 1
) r ON s.month_start = r.m
"""

_CAL_ORACLE = _CAL_SQL.format(
    orders="orders",
    min_ts="(SELECT min(o_orderdate) FROM orders)",
    max_ts="(SELECT max(o_orderdate) FROM orders)",
)


@register("monthly_calendar_gapfill_recursive", _CAL_ORACLE)
def q_monthly_calendar_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-grain revenue over a recursively generated calendar spine
    (WITH RECURSIVE … UNION ALL) — months with zero orders appear as
    explicit 0 rows. The daily variant of the same need is served by
    `daily_activity_gapfill` (sequence+explode); this is the recursion
    form for spines whose step logic doesn't fit `sequence()` (fiscal
    calendars, business-day steps).

    Bounds are fetched with one 2-value agg-collect and inlined as
    literals — at any scale that's a single column-pruned min/max scan;
    leaving them as scalar subqueries re-runs the scan per recursion
    level (see _CAL_SQL comment).
    """
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_cal_orders")
    lo, hi = orders.agg(
        F.min("o_orderdate"), F.max("o_orderdate")
    ).first()
    if lo is None:  # empty orders: no spine, degrade to an empty result
        return spark.createDataFrame(
            [], "month_start timestamp, n_orders bigint, revenue double"
        )
    # second-precision truncation below is safe: both spine bounds are
    # month-truncated before use, so sub-second loss can't move a month
    fmt = "TIMESTAMP '{:%Y-%m-%d %H:%M:%S}'"
    return spark.sql(
        _CAL_SQL.format(
            orders="_cal_orders",
            min_ts=fmt.format(lo),
            max_ts=fmt.format(hi),
        )
    )


# ---------------------------------------------------------------------------
# Bag-semantics set ops: EXCEPT ALL / INTERSECT ALL on daily user multisets
# ---------------------------------------------------------------------------

# DISTINCT set ops are ledgered (customer_cohort_set_ops); the ALL
# variants preserve MULTIPLICITY — "how many of Monday's events would
# remain after cancelling Tuesday's, one-for-one per user". Both
# engines define them identically (max(m−n,0) / min(m,n) copies).
_MULTISET_ORACLE = """
WITH d1 AS (
  SELECT user_id FROM events
  WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-06'
), d2 AS (
  SELECT user_id FROM events
  WHERE ts >= TIMESTAMP '2024-01-06' AND ts < TIMESTAMP '2024-01-07'
), surplus AS (
  SELECT user_id FROM d1 EXCEPT ALL SELECT user_id FROM d2
), common AS (
  SELECT user_id FROM d1 INTERSECT ALL SELECT user_id FROM d2
)
SELECT
  CAST((SELECT count(*) FROM surplus) AS BIGINT) AS surplus_events,
  CAST((SELECT count(DISTINCT user_id) FROM surplus) AS BIGINT)
    AS surplus_users,
  CAST((SELECT count(*) FROM common) AS BIGINT) AS common_events
"""


@register("user_multiset_except_all", _MULTISET_ORACLE)
def q_user_multiset_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiplicity-preserving day-over-day comparison of per-user event
    bags: EXCEPT ALL keeps max(m−n, 0) copies per user (Monday's surplus
    over Tuesday), INTERSECT ALL keeps min(m, n) (the matched volume).
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    d1 = ev.filter(
        (F.col("ts") >= F.lit("2024-01-05").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-06").cast("timestamp"))
    ).select("user_id")
    d2 = ev.filter(
        (F.col("ts") >= F.lit("2024-01-06").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-07").cast("timestamp"))
    ).select("user_id")
    surplus = d1.exceptAll(d2)
    common = d1.intersectAll(d2)
    stats = surplus.agg(
        F.count(F.lit(1)).alias("surplus_events"),
        F.countDistinct("user_id").alias("surplus_users"),
    )
    return stats.crossJoin(
        common.agg(F.count(F.lit(1)).alias("common_events"))
    )


# ---------------------------------------------------------------------------
# percentile_approx: the documented 100 TB swap, as a runnable query
# ---------------------------------------------------------------------------

# No DuckDB oracle: the t-digest/KLL-style sketch is engine-specific.
# PLANS.md names this the scale path for every exact-percentile query;
# tests pin it against exact percentiles within the accuracy bound its
# parameter guarantees (rank error <= 1/accuracy of the row count).
@register("value_percentiles_approx", None)
def q_value_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p90/p99 of event value per event type via
    `percentile_approx(…, accuracy=10000)` — mergeable, map-side
    partial-aggregated, O(accuracy) memory per group; the plan that
    replaces single-reduce exact percentiles at 100 TB.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    pa = F.percentile_approx(
        F.col("value"), F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), F.lit(10000)
    )
    return ev.groupBy("event_type").agg(
        F.round(pa[0].cast("double"), 6).alias("p50_approx"),
        F.round(pa[1].cast("double"), 6).alias("p90_approx"),
        F.round(pa[2].cast("double"), 6).alias("p99_approx"),
    )
