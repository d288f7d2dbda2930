"""Extension queries, round 17: LATERAL correlated subquery (top-1 per
row), grouped median / percentile_cont / percentile_disc, a
uniform-band equi-rewrite of the numeric range join, and
gaps-and-islands streak detection.

Each fills a distinct relational-surface slot the registry lacked:
correlated LATERAL (decorrelates to a window top-1 — asserting both
engines agree proves the rewrite), the interpolating percentile family
(exact `percentile()` and ntile are already ledgered), non-equi banding
(rewritten to equi so it scales), and consecutive-run analysis (the
row_number-difference island trick).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

# ---------------------------------------------------------------------------
# LATERAL correlated top-1 subquery
# ---------------------------------------------------------------------------

# Spark decorrelates the LATERAL LIMIT 1 into a per-key window top-1 (no
# per-row re-execution); DuckDB runs the same SQL text natively — the
# hash match proves the decorrelation preserves semantics, ties
# included (price DESC, orderkey ASC).
_LATERAL_ORACLE = """
SELECT c_custkey, t.o_orderkey AS top_orderkey,
       round(CAST(t.o_totalprice AS DOUBLE), 2) AS top_price
FROM customer, LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_custkey = c_custkey
  ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 1
) t
"""


@register("lateral_top_order_per_customer", _LATERAL_ORACLE)
def q_lateral_top_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each customer's single most expensive order via a correlated
    LATERAL subquery — the per-row top-k idiom SQL users reach for;
    Catalyst rewrites it to one windowed top-1 pass instead of
    re-running the subquery per customer row.
    """
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_lat_c")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_lat_o")
    return spark.sql(
        """
        SELECT c_custkey, t.o_orderkey AS top_orderkey,
               round(CAST(t.o_totalprice AS DOUBLE), 2) AS top_price
        FROM _lat_c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM _lat_o
          WHERE o_custkey = c_custkey
          ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 1
        ) t
        """
    )


# ---------------------------------------------------------------------------
# Interpolating percentile family (median / cont / disc) per group
# ---------------------------------------------------------------------------

# percentile_cont interpolates linearly between adjacent order stats,
# percentile_disc returns an actual element — both engines share the
# definitions; round(…,6) guards the interpolation arithmetic.
_MEDIAN_ORACLE = """
SELECT
  o_orderpriority,
  round(CAST(median(o_totalprice) AS DOUBLE), 6) AS price_median,
  round(CAST(percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice)
             AS DOUBLE), 6) AS price_p90_cont,
  round(CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)
             AS DOUBLE), 6) AS price_p90_disc
FROM orders GROUP BY o_orderpriority
"""


@register("grouped_price_median_percentiles", _MEDIAN_ORACLE)
def q_grouped_price_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median, interpolated p90, and discrete p90 of order price per
    priority class — the full percentile-definition family (the exact
    rank-based `percentile()` is ledgered separately). Single-reduce
    exact order statistics; at 100 TB swap for percentile_approx as
    documented in PLANS.md.
    """
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_med_orders")
    return spark.sql(
        """
        SELECT
          o_orderpriority,
          round(CAST(median(o_totalprice) AS DOUBLE), 6) AS price_median,
          round(CAST(percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice)
                     AS DOUBLE), 6) AS price_p90_cont,
          round(CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)
                     AS DOUBLE), 6) AS price_p90_disc
        FROM _med_orders GROUP BY o_orderpriority
        """
    )


# ---------------------------------------------------------------------------
# Uniform-band equi-rewrite of the numeric range join
# ---------------------------------------------------------------------------

_BAND_WIDTH = 100_000

# A band-lookup range join (value BETWEEN lo AND hi) compiles to a
# BroadcastNestedLoopJoin — O(rows × bands) comparisons. With UNIFORM
# bands the band id is floor(value / width): pure scan-stage arithmetic,
# no join at all. This query IS the rewrite; the oracle computes the
# same bands arithmetically, proving equivalence to the lookup table.
_BAND_ORACLE = f"""
SELECT
  CAST(floor(CAST(o_totalprice AS DOUBLE) / {_BAND_WIDTH}) AS BIGINT)
    AS price_band,
  CAST(count(*) AS BIGINT) AS n_orders,
  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
    AS band_revenue
FROM orders
GROUP BY 1
"""


@register("order_price_band_rollup", _BAND_ORACLE)
def q_order_price_band_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts/revenue per uniform 100k price band — the scalable
    rewrite of `value BETWEEN band.lo AND band.hi`: floor-division band
    ids replace a nested-loop range join entirely (non-uniform bands
    keep the BNLJ but broadcast the tiny band table; see
    lineitem_price_histogram for the fixed-grid variant on lineitem).
    """
    orders = load_table(spark, sf_dir, "orders")
    # floor on DOUBLE division in BOTH engines — DuckDB's `//` on DECIMAL
    # divides without flooring (then BIGINT cast rounds half-up), so the
    # decimal-DIV spelling silently shifts band boundaries by width/2
    band = F.floor(F.col("o_totalprice").cast("double") / F.lit(_BAND_WIDTH))
    return (
        orders.groupBy(band.cast("bigint").alias("price_band"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"),
                2,
            ).alias("band_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Gaps-and-islands: longest same-type streak per user
# ---------------------------------------------------------------------------

# The row_number-difference trick: within a user's time-ordered events,
# rn(all) - rn(per-type) is constant across a consecutive run of one
# type, so grouping on (user, type, diff) isolates islands in ONE
# partitioned sort — no self-join, no iteration. Ties on ts are broken
# by event_id so both engines see identical sequences.
_STREAK_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id)
       - row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS grp
  FROM events
), islands AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS streak
  FROM seq GROUP BY user_id, event_type, grp
)
SELECT user_id,
       CAST(max(streak) AS BIGINT) AS longest_streak,
       CAST(count(*) AS BIGINT) AS n_islands
FROM islands GROUP BY user_id
"""


@register("longest_event_streak", _STREAK_ORACLE)
def q_longest_event_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest run of consecutive same-type events per user plus island
    count (gaps-and-islands) — streak/burst analysis in one user-
    partitioned sort via the row_number-difference trick.
    """
    ev = load_table(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias("grp"),
    )
    islands = seq.groupBy("user_id", "event_type", "grp").agg(
        F.count(F.lit(1)).alias("streak")
    )
    return islands.groupBy("user_id").agg(
        F.max("streak").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_islands"),
    )
