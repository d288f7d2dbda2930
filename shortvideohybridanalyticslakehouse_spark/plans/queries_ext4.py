"""Extension queries, round 3: as-of join, semi-join / correlated-subquery
TPC-H shapes, deterministic sampling, histogram binning, and funnel
analysis — each with a DuckDB oracle.

The reference has no as-of/range joins (SURVEY.md §2.3 "No
sort-merge/range/as-of/theta/semi joins exist"); these are the
training-data-pipeline extensions the brief asks for beyond parity.

Determinism rules shared with plans/queries.py: decimal casts before
sums (float addition order is partition-dependent), integer-exact gap
arithmetic via unix_micros/epoch_us, md5-based hashing only (the one
hash both engines share), explicit aliases matching the oracle exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions.dedupfns import hash60
from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

# ---------------------------------------------------------------------------
# As-of join (events -> most recent purchase at-or-before, per user)
# ---------------------------------------------------------------------------

# Sort-based as-of join: ONE shuffle on the key + ONE sort per partition —
# no point-in-time cross product. The "right side" (purchases) rides along
# as a nullable column and a running max() propagates the latest
# at-or-before match. At 100 TB this is the only join shape that works:
# a naive e.ts >= p.ts theta-join is O(n^2) per key.
#
# Tie semantics (= DuckDB ASOF JOIN): at equal ts the purchase is visible
# (>= inclusive), enforced by sorting purchase rows first within a ts via
# is_p DESC; event_id breaks any remaining tie deterministically.
_ASOF_ORACLE = """
WITH p AS (
  SELECT user_id, ts AS p_ts FROM events WHERE event_type = 'purchase'
), j AS (
  SELECT e.event_type, e.ts, p.p_ts
  FROM events e ASOF LEFT JOIN p
    ON e.user_id = p.user_id AND e.ts >= p.p_ts
), g AS (
  SELECT event_type,
         (epoch_us(ts) - epoch_us(p_ts)) // 1000000 AS gap_s,
         p_ts
  FROM j
)
SELECT
  event_type,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(count(p_ts) AS BIGINT) AS n_matched,
  CAST(coalesce(sum(gap_s), 0) AS BIGINT) AS sum_gap_s,
  round(CAST(sum(gap_s) AS DOUBLE) / nullif(count(gap_s), 0), 4) AS avg_gap_s
FROM g
GROUP BY event_type
"""


@register("asof_join_last_purchase", _ASOF_ORACLE)
def q_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every event, the same user's most recent purchase at-or-before
    its timestamp (as-of join), aggregated per event type.

    Reference parity: none (as-of joins absent there); this is the
    point-in-time-correct feature-join primitive for training pipelines.
    """
    ev = load_table(spark, sf_dir, "events")
    annotated = ev.select(
        "user_id",
        "ts",
        "event_type",
        "event_id",
        F.when(F.col("event_type") == "purchase", F.col("ts")).alias("p_ts_raw"),
        (F.col("event_type") == "purchase").cast("int").alias("is_p"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_p").desc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = annotated.select(
        "event_type",
        "ts",
        F.max("p_ts_raw").over(w).alias("p_ts"),
    )
    gap_s = (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("p_ts"))) / F.lit(
        1000000
    )
    gap_s = F.floor(gap_s).cast("bigint")
    return joined.select("event_type", "p_ts", gap_s.alias("gap_s")).groupBy(
        "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("p_ts").alias("n_matched"),
        F.coalesce(F.sum("gap_s"), F.lit(0)).cast("bigint").alias("sum_gap_s"),
        F.round(
            F.sum("gap_s").cast("double") / F.nullif(F.count("gap_s"), F.lit(0)),
            4,
        ).alias("avg_gap_s"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q4 shape: EXISTS -> left-semi join
# ---------------------------------------------------------------------------

_Q4_ORACLE = """
SELECT
  o_orderpriority,
  CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
"""


@register("tpch_q4_order_priority", _Q4_ORACLE)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking (TPC-H Q4 shape): EXISTS correlated
    subquery compiled to a LEFT SEMI hash join — lineitem is never
    widened, only probed; the quarter filter prunes orders before the
    shuffle (our fixture lacks commit/receipt dates, so the "late line
    item" predicate is l_shipdate > o_orderdate + 60 days).
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    sel = orders.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return sel.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


# ---------------------------------------------------------------------------
# TPC-H Q17 shape: correlated AVG subquery -> pre-agg + join
# ---------------------------------------------------------------------------

# Threshold determinism: avg(l_quantity) sums integer-valued doubles —
# exact in IEEE double regardless of partition order (all < 2^53), so
# 0.2*avg is bit-identical across engines and the < comparison cannot
# flip. Revenue is decimal-cast before summing.
_Q17_ORACLE = """
WITH thr AS (
  SELECT l_partkey AS pk, 0.2 * avg(l_quantity) AS qty_thr
  FROM lineitem GROUP BY l_partkey
)
SELECT
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 2)
    AS avg_yearly
FROM lineitem JOIN thr ON l_partkey = pk
WHERE l_quantity < qty_thr
"""


@register("tpch_q17_small_qty_revenue", _Q17_ORACLE)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17 shape): the correlated
    per-part AVG subquery becomes a grouped pre-aggregation joined back
    onto the fact on l_partkey. Join strategy is left to AQE on purpose:
    at fixture scale the agg output is tiny and AQE broadcasts it; at
    100 TB |part| is 10^8+ and the only safe plan is the shuffle hash
    join on the shared l_partkey partitioning (both sides already
    shuffle on that key, so the exchange is reused).
    """
    li = load_table(spark, sf_dir, "lineitem")
    thr = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_thr")
    )
    return (
        li.join(thr, li.l_partkey == thr.pk)
        .filter(F.col("l_quantity") < F.col("qty_thr"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast(
                    "double"
                )
                / 7.0,
                2,
            ).alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q15 shape: top supplier(s) by quarter revenue (max-subquery join)
# ---------------------------------------------------------------------------

# Revenue is decimal-exact (price * (1-disc) both cast to DECIMAL before
# multiply/sum), so the revenue = MAX(revenue) equality join is safe —
# with float sums, ties at the max would be partition-order lottery.
_Q15_ORACLE = """
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * CAST(1 - l_discount AS DECIMAL(18,2))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT
  CAST(supplier_no AS BIGINT) AS supplier_no,
  round(CAST(total_rev AS DOUBLE), 2) AS total_revenue
FROM rev
WHERE total_rev = (SELECT max(total_rev) FROM rev)
"""


@register("tpch_q15_top_supplier", _Q15_ORACLE)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier (TPC-H Q15 shape): quarter revenue per supplier, keep
    the max. The scalar MAX subquery is a 1-row aggregate broadcast-cross-
    joined back (J7 anchor pattern) — no second scan of lineitem.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
        ).alias("total_rev")
    )
    max_rev = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .select(
            F.col("supplier_no").cast("bigint").alias("supplier_no"),
            F.round(F.col("total_rev").cast("double"), 2).alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic hash-threshold sampling
# ---------------------------------------------------------------------------

_SAMPLE_ORACLE = """
WITH s AS (
  SELECT * FROM events
  WHERE CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT)
        % 1000 < 100
)
SELECT
  event_type,
  CAST(count(*) AS BIGINT) AS n_sampled,
  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM s
GROUP BY event_type
"""


@register("deterministic_event_sample", _SAMPLE_ORACLE)
def q_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% Bernoulli sample by content hash of the row key — reproducible
    on any engine / partitioning / rerun (unlike df.sample, which is
    seed+partition-layout dependent), so train/eval samples stay stable
    across the fleet. The predicate is a scan-side filter: at 100 TB the
    sample never materializes the rejected 90%.
    """
    ev = load_table(spark, sf_dir, "events")
    sampled = ev.filter(hash60(F.col("event_id").cast("string")) % 1000 < 100)
    return sampled.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias(
            "sum_value"
        ),
    )


# ---------------------------------------------------------------------------
# Fixed-width histogram binning
# ---------------------------------------------------------------------------

_HISTOGRAM_ORACLE = """
SELECT
  CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS price_bucket,
  CAST(count(*) AS BIGINT) AS n_items,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS bucket_total
FROM lineitem
GROUP BY 1
"""


@register("lineitem_price_histogram", _HISTOGRAM_ORACLE)
def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width price histogram (map-side combinable: ~20 buckets mean
    the shuffle carries one row per bucket per task regardless of input
    size — the right histogram shape at 100 TB; equal-depth variants
    should use approx_percentile edges instead).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.floor(F.col("l_extendedprice") / F.lit(5000.0))
        .cast("bigint")
        .alias("price_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias(
            "bucket_total"
        ),
    )


# ---------------------------------------------------------------------------
# Funnel conversion (view -> click -> purchase, strictly ordered in time)
# ---------------------------------------------------------------------------

# Three grouped mins chained by user_id equi-joins: every stage shuffles
# on the SAME key, so Spark reuses the hash partitioning (exchange reuse)
# instead of re-shuffling; stage tables shrink monotonically.
_FUNNEL_ORACLE = """
WITH v AS (
  SELECT user_id, min(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id
)
SELECT
  CAST((SELECT count(*) FROM v) AS BIGINT) AS users_viewed,
  CAST((SELECT count(*) FROM c) AS BIGINT) AS users_clicked_after_view,
  CAST((SELECT count(*) FROM p) AS BIGINT) AS users_purchased_after_click
"""


@register("funnel_conversion", _FUNNEL_ORACLE)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered conversion funnel view -> click -> purchase: each
    stage is the earliest qualifying event AFTER the previous stage's
    timestamp (not mere co-occurrence). Three single-key aggregations,
    one partitioning reused throughout.
    """
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    counts = [
        v.agg(F.count(F.lit(1)).alias("users_viewed")),
        c.agg(F.count(F.lit(1)).alias("users_clicked_after_view")),
        p.agg(F.count(F.lit(1)).alias("users_purchased_after_click")),
    ]
    out = counts[0].crossJoin(counts[1]).crossJoin(counts[2])
    return out
