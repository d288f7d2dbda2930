"""Extension queries, round 5: multi-way star join (TPC-H Q5), outer-join
distribution (Q13), HAVING-subquery (Q18), anti-join + scalar-avg (Q22),
and a weekly cohort-retention matrix — each with a DuckDB oracle.

The reference's join surface stops at broadcast equi-joins and one
anti-join (SURVEY.md §2.3 J1-J9); these shapes extend it to the
multi-dimension star joins and decorrelated subqueries a BI/training
workload needs, expressed so Catalyst picks broadcast vs shuffle per
side (AQE re-plans at runtime — the same code is the right plan at
sf0.01 and at 100 TB).

Determinism rules shared with plans/queries.py: decimal casts before
sums, cross-multiplied decimal comparisons instead of decimal division
(division scale rules differ across engines; a * n > total is exact in
both), integer-exact week arithmetic via unix_micros, explicit aliases
matching the oracle exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

# ---------------------------------------------------------------------------
# TPC-H Q5 shape: local-supplier volume (6-table star join)
# ---------------------------------------------------------------------------

# region -> nation is a ~25-row broadcast; customer/supplier prune to one
# region BEFORE touching the facts, so the two big shuffles (orders on
# custkey, lineitem on orderkey) carry only the surviving fifth of rows.
# The "local" predicate c_nationkey = s_nationkey rides on the already-
# joined row — no extra join.
_Q5_ORACLE = """
SELECT
  n_name,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE), 2)
    AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND c_nationkey = s_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


@register("tpch_q5_local_supplier_volume", _Q5_ORACLE)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier volume (TPC-H Q5 shape): revenue per nation where the
    customer and supplier share a nation inside one region.

    Physical shape: nation⋈region is broadcast into supplier; the orders
    year-filter is scan-side; the two fact shuffles (custkey, orderkey)
    are the only exchanges that scale with data size. Broadcasts are
    explicit only for the guaranteed-tiny dims — supplier/customer are
    left to AQE because at 100 TB they exceed the broadcast threshold.
    """
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    supplier = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    joined = (
        li.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
    )
    return joined.groupBy("n_name").agg(
        F.round(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
            ).cast("double"),
            2,
        ).alias("revenue")
    )


# ---------------------------------------------------------------------------
# TPC-H Q13 shape: customer order-count distribution (outer join + 2 aggs)
# ---------------------------------------------------------------------------

# The LEFT join is load-bearing: customers with zero qualifying orders
# must land in the c_count=0 bucket, which an inner join silently drops.
# Second agg groups on c_count (small domain) — map-side combinable.
_Q13_ORACLE = """
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT
  CAST(c_count AS BIGINT) AS c_count,
  CAST(count(*) AS BIGINT) AS custdist
FROM per_cust
GROUP BY c_count
"""


@register("tpch_q13_customer_distribution", _Q13_ORACLE)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13 shape): how many
    customers placed N non-urgent orders, including N=0 via the left
    outer join (count(col) skips the nulls the outer join manufactures).
    """
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    ).select(F.col("c_count").cast("bigint").alias("c_count"), "custdist")


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: large-volume orders (HAVING subquery -> agg + join back)
# ---------------------------------------------------------------------------

# l_quantity is fractional in this fixture, so the HAVING boundary is
# decimal-summed (float sum order could flip a row sitting exactly at
# the threshold). The qualifying-orders set is tiny (~p99) — joining it
# back to orders/customer is a broadcast at any scale where Q18 is sane.
_Q18_ORACLE = """
WITH big AS (
  SELECT l_orderkey AS bk,
         sum(CAST(l_quantity AS DECIMAL(18,6))) AS total_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,6))) > 250
)
SELECT
  c_name,
  CAST(o_orderkey AS BIGINT) AS o_orderkey,
  o_orderdate,
  round(CAST(o_totalprice AS DOUBLE), 2) AS o_totalprice,
  CAST(total_qty AS DOUBLE) AS total_qty
FROM big
JOIN orders   ON o_orderkey = bk
JOIN customer ON c_custkey = o_custkey
"""


@register("tpch_q18_large_volume_orders", _Q18_ORACLE)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume orders (TPC-H Q18 shape): orders whose line quantities
    sum past a threshold, enriched with the customer. The IN-subquery is
    the grouped aggregate itself joined back — no second lineitem scan.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy(F.col("l_orderkey").alias("bk"))
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, F.col("o_orderkey") == F.col("bk"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
            "o_orderdate",
            F.round(F.col("o_totalprice").cast("double"), 2).alias("o_totalprice"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q22 shape: idle rich customers (scalar-avg + anti-join)
# ---------------------------------------------------------------------------

# The avg threshold is applied CROSS-MULTIPLIED: acctbal * n_pos >
# total_pos, all decimal — exact in both engines, where decimal DIVISION
# scale rules differ (Spark rounds to scale 6+, DuckDB keeps full
# precision) and a customer sitting on the boundary would diverge.
_Q22_ORACLE = """
WITH pos AS (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total_pos,
         CAST(count(*) AS BIGINT) AS n_pos
  FROM customer WHERE c_acctbal > 0.0
)
SELECT
  c_mktsegment,
  CAST(count(*) AS BIGINT) AS numcust,
  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer, pos
WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n_pos > total_pos
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '2000-01-01'
  )
GROUP BY c_mktsegment
"""


@register("tpch_q22_idle_rich_customers", _Q22_ORACLE)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idle rich customers (TPC-H Q22 shape): above-average balances with
    no RECENT orders (none since 2000 — every fixture customer has SOME
    order, so the unscoped variant is trivially empty), counted per
    market segment. NOT EXISTS compiles to a left-anti join on custkey
    with the date filter pushed to the orders scan; the scalar average
    is a 1-row broadcast anchor compared cross-multiplied so both
    engines agree bit-for-bit.
    """
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", F.col("c_acctbal").cast("decimal(18,2)").alias("bal")
    )
    pos = customer.filter(F.col("bal") > 0).agg(
        F.sum("bal").cast("decimal(38,2)").alias("total_pos"),
        F.count(F.lit(1)).alias("n_pos"),
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    rich = customer.crossJoin(F.broadcast(pos)).filter(
        F.col("bal") * F.col("n_pos") > F.col("total_pos")
    )
    idle_rich = rich.join(
        orders, rich.c_custkey == orders.o_custkey, "left_anti"
    )
    return idle_rich.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum("bal").cast("double").alias("totacctbal"),
    )


# ---------------------------------------------------------------------------
# Weekly cohort retention matrix
# ---------------------------------------------------------------------------

# Two aggs + one join, ALL partitioned on user_id, then a final tiny
# (cohort, offset) rollup: the user-grain shuffle is reused, and the
# output is O(weeks²) regardless of input size. Week offsets are
# integer-exact micros arithmetic — no float date math.
_COHORT_ORACLE = """
WITH firstw AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT e.user_id,
         f.cohort_week,
         (epoch_us(date_trunc('week', e.ts)) - epoch_us(f.cohort_week))
           // 604800000000 AS week_offset
  FROM events e JOIN firstw f ON e.user_id = f.user_id
)
SELECT
  CAST(cohort_week AS TIMESTAMP) AS cohort_week,
  CAST(week_offset AS BIGINT) AS week_offset,
  CAST(count(*) AS BIGINT) AS active_users
FROM activity
GROUP BY cohort_week, week_offset
"""


@register("weekly_cohort_retention", _COHORT_ORACLE)
def q_weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-seen week, counted
    in every later week they return (the classic retention triangle).
    min-ts agg, the activity join, and the DISTINCT all shuffle on
    user_id — one partitioning end-to-end until the final tiny rollup.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    firstw = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        ev.join(firstw, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                (
                    F.unix_micros(F.date_trunc("week", F.col("ts")))
                    - F.unix_micros(F.col("cohort_week"))
                )
                / F.lit(604800000000)
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("active_users")
    )
