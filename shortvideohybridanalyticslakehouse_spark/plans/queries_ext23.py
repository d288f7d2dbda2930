"""Extension queries, round 23: CUBE (completing the grouping-set family
alongside ROLLUP and GROUPING SETS), percent-of-total window shares,
and a referential-integrity audit (FK orphan detection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

# ---------------------------------------------------------------------------
# CUBE: all 4 grouping combinations of (status, priority) in one pass
# ---------------------------------------------------------------------------

_CUBE_ORACLE = """
SELECT
  coalesce(o_orderstatus, '__all__') AS orderstatus,
  coalesce(o_orderpriority, '__all__') AS orderpriority,
  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT)
    AS gid,
  CAST(count(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@register("cube_order_status_priority", _CUBE_ORACLE)
def q_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts at every granularity of (status, priority) — detail,
    two one-dim subtotals, grand total — via CUBE: 2² grouping sets
    expanded inside ONE partial-aggregated shuffle (4 separate scans'
    worth of reports for one scan's I/O).
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (
                F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority")
            ).cast("bigint").alias("gid"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("__all__")).alias(
                "orderstatus"
            ),
            F.coalesce(F.col("o_orderpriority"), F.lit("__all__")).alias(
                "orderpriority"
            ),
            "gid",
            "n_orders",
        )
    )


# ---------------------------------------------------------------------------
# Percent-of-total (ratio_to_report): nation share of its region's revenue
# ---------------------------------------------------------------------------

# The share denominator is a window sum over the ALREADY-AGGREGATED
# per-nation rows (O(nations)), not a second pass over facts. Exact
# decimal totals divide once into a double, rounded identically.
_SHARE_ORACLE = """
WITH per_nation AS (
  SELECT r_name, n_name,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
           AS nation_rev
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name
)
SELECT
  r_name, n_name,
  round(CAST(nation_rev AS DOUBLE), 2) AS nation_rev,
  round(CAST(nation_rev AS DOUBLE)
        / CAST(sum(nation_rev) OVER (PARTITION BY r_name) AS DOUBLE), 6)
    AS region_share
FROM per_nation
"""


@register("nation_revenue_region_share", _SHARE_ORACLE)
def q_nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each nation's share of its region's order revenue — the
    percent-of-total (ratio_to_report) window idiom, applied on the
    aggregated grain so the window touches O(nations) rows.
    """
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region")
    per_nation = (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .alias("nation_rev")
        )
    )
    w = Window.partitionBy("r_name")
    return per_nation.select(
        "r_name",
        "n_name",
        F.round(F.col("nation_rev").cast("double"), 2).alias("nation_rev"),
        F.round(
            F.col("nation_rev").cast("double")
            / F.sum("nation_rev").over(w).cast("double"),
            6,
        ).alias("region_share"),
    )


# ---------------------------------------------------------------------------
# Referential-integrity audit (FK orphans via anti-joins)
# ---------------------------------------------------------------------------

# Each FK edge is one left-anti join on the key; counts roll into one
# audit row. On healthy fixtures all zeros — the test plants orphans to
# prove detection (a DQ check that cannot fail is not a check).
_RI_ORACLE = """
SELECT
  CAST((SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey))
       AS BIGINT) AS lineitem_orphans,
  CAST((SELECT count(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey))
       AS BIGINT) AS order_orphans,
  CAST((SELECT count(*) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM nation n
                          WHERE n.n_nationkey = c.c_nationkey))
       AS BIGINT) AS customer_orphans
"""


@register("referential_integrity_audit", _RI_ORACLE)
def q_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK orphan counts along lineitem→orders→customer→nation — the
    referential-integrity slice of a DQ suite, one left-anti join per
    edge (child shuffles on its FK; parent key sets broadcast when
    small).
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey")
    li_orph = li.join(
        orders.select("o_orderkey"),
        li.l_orderkey == F.col("o_orderkey"),
        "left_anti",
    ).agg(F.count(F.lit(1)).alias("lineitem_orphans"))
    o_orph = orders.join(
        customer.select("c_custkey"),
        orders.o_custkey == F.col("c_custkey"),
        "left_anti",
    ).agg(F.count(F.lit(1)).alias("order_orphans"))
    c_orph = customer.join(
        F.broadcast(nation),
        customer.c_nationkey == F.col("n_nationkey"),
        "left_anti",
    ).agg(F.count(F.lit(1)).alias("customer_orphans"))
    return li_orph.crossJoin(o_orph).crossJoin(c_orph)
