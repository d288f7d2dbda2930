"""Extension queries, round 77: growth economics — cohort LTV curves and
market-concentration HHI, closing the customer-base family (RFM / Gini /
Lorenz / retention) with its two remaining standard metrics.

- cohort_ltv_curve: per signup-week cohort, CUMULATIVE purchase cents by
  week age (0..3) — the lifetime-value ramp a growth team plots per
  acquisition cohort. Cents via the shared DECIMAL(18,2) hop
  (plans/money.py rationale); the cumulative step is a broadcast
  triangular self-join over the O(cohorts x ages) frame, not a window.

- supplier_concentration_hhi: Herfindahl-Hirschman index of supplier
  quantity share within each part brand: HHI_micro =
  floor(1e6 * sum(q_s^2) / Q^2) on exact integer quantity hundredths
  (DECIMAL(38,0) for the squares). 1e6 = monopoly; small = fragmented.
  One combinable groupBy to (brand, supplier), one to brand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_MAX_AGE = 3

_LTV_ORACLE = f"""
WITH signup AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events WHERE event_type = 'signup' GROUP BY user_id
), spend AS (
  SELECT e.user_id,
         CAST(date_diff('week', s.cohort_week,
              date_trunc('week', e.ts)) AS BIGINT) AS age_weeks,
         CAST(CAST(e.value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events e JOIN signup s ON s.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= s.cohort_week
), cells AS (
  SELECT s.cohort_week, a.age AS age_weeks,
         CAST(count(DISTINCT s.user_id) AS BIGINT) AS cohort_users,
         CAST(coalesce(sum(CASE WHEN sp.age_weeks <= a.age
                           THEN sp.cents END), 0) AS BIGINT) AS cum_cents
  FROM signup s
  CROSS JOIN (SELECT unnest(range({_MAX_AGE + 1})) AS age) a
  LEFT JOIN spend sp
    ON sp.user_id = s.user_id AND sp.age_weeks <= a.age
  GROUP BY 1, 2
)
SELECT CAST(strftime(cohort_week, '%Y-%m-%d') AS VARCHAR) AS cohort_week,
       CAST(age_weeks AS INT) AS age_weeks,
       cohort_users, cum_cents
FROM cells
"""


@register("cohort_ltv_curve", _LTV_ORACLE)
def q_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative purchase cents per signup-week cohort at week ages
    0..3 — exact integers, cumulative over ages via a broadcast age
    table joined with a <= band (no window)."""
    ev = load_table(spark, sf_dir, "events")
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    )
    spend = (
        ev.filter(F.col("event_type") == "purchase")
        .join(signup, "user_id")
        .filter(F.col("ts") >= F.col("cohort_week"))
        .select(
            "user_id",
            "cohort_week",
            (
                F.floor(
                    F.datediff(
                        F.date_trunc("week", F.col("ts")), F.col("cohort_week")
                    )
                    / 7
                )
            )
            .cast("bigint")
            .alias("age_weeks"),
            (F.col("value").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        )
    )
    ages = spark.range(_MAX_AGE + 1).select(F.col("id").cast("int").alias("age"))
    # the age band belongs IN the left join (like the oracle's ON clause):
    # a post-join filter would drop users whose only purchases fall past
    # the cell's age, losing them from cohort_users
    sp = spend.select(
        F.col("user_id").alias("_uid"),
        "age_weeks",
        "cents",
    )
    cells = (
        signup.crossJoin(F.broadcast(ages))
        .join(
            sp,
            (F.col("user_id") == F.col("_uid"))
            & (F.col("age_weeks") <= F.col("age")),
            "left",
        )
        .groupBy("cohort_week", "age")
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("cohort_users"),
            F.coalesce(F.sum("cents"), F.lit(0)).cast("bigint").alias(
                "cum_cents"
            ),
        )
    )
    return cells.select(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        F.col("age").cast("int").alias("age_weeks"),
        "cohort_users",
        "cum_cents",
    )


_HHI_ORACLE = """
WITH q AS (
  SELECT p.p_brand AS brand, l.l_suppkey AS supp,
         CAST(sum(CAST(CAST(l.l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS DECIMAL(38,0)) AS qty
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
), tot AS (
  SELECT brand,
         CAST(count(*) AS BIGINT) AS n_suppliers,
         CAST(sum(qty * qty) AS DECIMAL(38,0)) AS sum_sq,
         CAST(sum(qty) AS DECIMAL(38,0)) AS total
  FROM q GROUP BY 1
)
SELECT brand, n_suppliers,
       CAST(floor(CAST(sum_sq AS DOUBLE) * 1000000
            / CAST(total * total AS DOUBLE)) AS BIGINT) AS hhi_micro
FROM tot
"""


@register("supplier_concentration_hhi", _HHI_ORACLE)
def q_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl index of supplier quantity share per brand (1e6 =
    single-supplier monopoly), exact integer quantity sums."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    dec = "decimal(38,0)"
    q = (
        li.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            li["l_partkey"] == F.col("p_partkey"),
        )
        .groupBy(F.col("p_brand").alias("brand"), F.col("l_suppkey").alias("supp"))
        .agg(
            F.sum((F.col("l_quantity").cast("decimal(18,2)") * 100).cast("bigint"))
            .cast(dec)
            .alias("qty")
        )
    )
    tot = q.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.sum(F.col("qty") * F.col("qty")).cast(dec).alias("sum_sq"),
        F.sum("qty").cast(dec).alias("total"),
    )
    return tot.select(
        "brand",
        "n_suppliers",
        F.floor(
            F.col("sum_sq").cast("double")
            * 1000000
            / (F.col("total") * F.col("total")).cast("double")
        )
        .cast("bigint")
        .alias("hhi_micro"),
    )
