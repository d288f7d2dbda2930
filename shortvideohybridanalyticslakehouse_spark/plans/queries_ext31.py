"""Extension queries, round 31: the four remaining TPC-H plan shapes —
q2 (correlated-min supplier selection), q11 (grouped value vs global-
fraction HAVING), q16 (distinct-count with NOT-IN exclusion), q20
(nested semi-join qualification) — completing all 22 TPC-H query
families on the fixture schema.

The fixture has no ``partsupp`` table (TESTDATA.md), so the supply
relation is DERIVED: ``supply(partkey, suppkey, supplycost)`` :=
per-(part, supplier) aggregate over lineitem (min extended price as the
cost proxy, total shipped quantity as the availability proxy). Every
adaptation keeps the canonical query's PLAN SHAPE — the correlated
scalar subquery, the global-total HAVING, the NOT-IN anti join, the
nested IN chains — which is the thing worth testing. Reference analogs:
the ad-hoc BI query surface in SURVEY.md §2.5/§2.8.

Determinism discipline as everywhere in this package: money math in
DECIMAL(18,2) end-to-end, one final cast to double + round(2); ORDER BY
keys always extended to a unique total order before any LIMIT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table


def _supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived supply relation: one row per (partkey, suppkey) pair seen in
    lineitem, with min extended price as the supply-cost proxy. One
    aggregate on a 2-key shuffle; at 100 TB this is the co-partitioned
    grain every downstream join reuses.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    return li.groupBy(
        F.col("l_partkey").alias("sp_partkey"),
        F.col("l_suppkey").alias("sp_suppkey"),
    ).agg(
        F.min(F.col("l_extendedprice").cast("decimal(18,2)")).alias("supplycost")
    )


_SUPPLY_CTE = """
supply AS (
  SELECT l_partkey AS sp_partkey, l_suppkey AS sp_suppkey,
         min(CAST(l_extendedprice AS DECIMAL(18,2))) AS supplycost
  FROM lineitem GROUP BY 1, 2
)
"""


# ---------------------------------------------------------------------------
# q2 shape: minimum-cost supplier per part within a region
# ---------------------------------------------------------------------------

_Q2_ORACLE = f"""
WITH {_SUPPLY_CTE},
scoped AS (
  SELECT p.p_partkey, p.p_name, s.s_name, s.s_acctbal, n.n_name,
         sp.supplycost
  FROM supply sp
  JOIN part p ON p.p_partkey = sp.sp_partkey
  JOIN supplier s ON s.s_suppkey = sp.sp_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE p.p_type = 'LARGE' AND p.p_size <= 25 AND r.r_name = 'EUROPE'
)
SELECT round(CAST(s_acctbal AS DOUBLE), 2) AS s_acctbal,
       s_name, n_name AS nation,
       CAST(p_partkey AS BIGINT) AS p_partkey, p_name,
       round(CAST(supplycost AS DOUBLE), 2) AS supplycost
FROM (
  SELECT *, min(supplycost) OVER (PARTITION BY p_partkey) AS min_cost
  FROM scoped
) WHERE supplycost = min_cost
ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
LIMIT 20
"""


@register("tpch_q2_min_cost_supplier", _Q2_ORACLE)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q2 adapted (supply relation derived from lineitem): for each
    LARGE part of size <= 25, the EUROPE supplier(s) offering the minimum
    supply cost, richest supplier first. The canonical correlated scalar
    subquery (`ps_supplycost = (SELECT min ...)`) becomes a window min
    over the part key on the already-region-scoped supply rows — ONE
    partkey shuffle, no re-scan, no per-row subquery. part / supplier /
    nation / region are all broadcast dims; the only big shuffles are the
    supply aggregate and the window.
    """
    sp = _supply(spark, sf_dir)
    part = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_type") == "LARGE") & (F.col("p_size") <= 25))
        .select("p_partkey", "p_name")
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    scoped = (
        sp.join(F.broadcast(part), sp.sp_partkey == part.p_partkey)
        .join(F.broadcast(sup), sp.sp_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
    )
    w = Window.partitionBy("p_partkey")
    return (
        scoped.withColumn("min_cost", F.min("supplycost").over(w))
        .filter(F.col("supplycost") == F.col("min_cost"))
        .select(
            F.round(F.col("s_acctbal").cast("double"), 2).alias("s_acctbal"),
            "s_name",
            F.col("n_name").alias("nation"),
            F.col("p_partkey").cast("bigint").alias("p_partkey"),
            "p_name",
            F.round(F.col("supplycost").cast("double"), 2).alias("supplycost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(),
            F.col("nation").asc(),
            F.col("s_name").asc(),
            F.col("p_partkey").asc(),
        )
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q11 shape: per-part value vs a global-fraction HAVING threshold
# ---------------------------------------------------------------------------

_Q11_ORACLE = """
WITH v AS (
  SELECT l.l_partkey,
         sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS val
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_3'
  GROUP BY 1
)
SELECT CAST(l_partkey AS BIGINT) AS p_partkey,
       round(CAST(val AS DOUBLE), 2) AS part_value
FROM v, (SELECT sum(val) AS total FROM v) t
WHERE val > total * CAST(0.002 AS DECIMAL(6,4))
ORDER BY part_value DESC, p_partkey ASC
"""


@register("tpch_q11_important_stock", _Q11_ORACLE)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q11 adapted (stock value proxied by extended price shipped by
    NATION_3 suppliers): parts whose value exceeds 0.2% of the nation
    total. The canonical scalar subquery (`HAVING sum > (SELECT sum …)`)
    becomes: grouped agg -> re-agg of THAT O(parts) result for the 1-row
    total -> broadcast cross join back. The fact is scanned once; the
    total is computed from the grouped intermediate, not a second scan —
    the shape that survives 100x.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    v = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("val"))
    )
    total = v.agg(F.sum("val").alias("total"))
    return (
        v.crossJoin(F.broadcast(total))
        .filter(F.col("val") > F.col("total") * F.lit("0.002").cast("decimal(6,4)"))
        .select(
            F.col("l_partkey").cast("bigint").alias("p_partkey"),
            F.round(F.col("val").cast("double"), 2).alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), F.col("p_partkey").asc())
    )


# ---------------------------------------------------------------------------
# q16 shape: distinct-supplier counts with a NOT-IN exclusion anti join
# ---------------------------------------------------------------------------

_Q16_ORACLE = f"""
WITH {_SUPPLY_CTE}
SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT sp.sp_suppkey) AS BIGINT) AS supplier_cnt
FROM supply sp
JOIN part p ON p.p_partkey = sp.sp_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND sp.sp_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
LIMIT 50
"""


@register("tpch_q16_supplier_part_counts", _Q16_ORACLE)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q16 adapted (complaint suppliers proxied by negative account
    balance): distinct suppliers able to supply each surviving
    (brand, type, size) class, excluding bad-standing suppliers. The
    canonical NOT IN subquery is a LEFT ANTI join against the O(bad)
    exclusion set (broadcast — NULL-safe by construction since keys are
    non-null); part filters push into the broadcast dim; the distinct
    count partial-aggregates under the (brand, type, size) shuffle.
    """
    sp = _supply(spark, sf_dir).select("sp_partkey", "sp_suppkey")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        sp.join(F.broadcast(bad), sp.sp_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), sp.sp_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", F.col("p_size").cast("bigint").alias("p_size"))
        .agg(F.countDistinct("sp_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(),
            F.col("p_brand").asc(),
            F.col("p_type").asc(),
            F.col("p_size").asc(),
        )
        .limit(50)
    )


# ---------------------------------------------------------------------------
# q20 shape: nested semi-join supplier qualification
# ---------------------------------------------------------------------------

_Q20_ORACLE = """
WITH shipped AS (
  SELECT l.l_suppkey, l.l_partkey,
         sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS pair_qty
  FROM lineitem l
  WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate < TIMESTAMP '1997-01-01'
    AND l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
  GROUP BY 1, 2
),
dominant AS (
  SELECT l_suppkey
  FROM (
    SELECT l_suppkey, pair_qty,
           sum(pair_qty) OVER (PARTITION BY l_partkey) AS part_qty
    FROM shipped
  ) WHERE pair_qty > part_qty * CAST(0.30 AS DECIMAL(4,2))
)
SELECT s.s_name, n.n_name AS nation
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name IN ('NATION_0', 'NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
  AND s.s_suppkey IN (SELECT l_suppkey FROM dominant)
ORDER BY s_name ASC
"""


@register("tpch_q20_dominant_supplier", _Q20_ORACLE)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q20 adapted (availability proxied by shipped quantity): the
    canonical nested-IN chain — suppliers IN (pairs whose quantity beats
    a correlated per-part threshold) for parts IN (name-filtered set) —
    as semi joins end-to-end. The part name filter broadcasts as a
    left-semi prune BEFORE the pair aggregate; the correlated
    `0.5 * sum(l_quantity)` threshold becomes a window sum over the
    aggregated (supplier, part) grain (dominant = >30% of the part's
    year volume); the final supplier qualification is a left-semi against
    the O(qualifying) key set. No subquery re-executes per row anywhere.
    """
    red = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("l_suppkey", "l_partkey", "l_quantity")
        .join(F.broadcast(red), F.col("l_partkey") == red.p_partkey, "left_semi")
    )
    shipped = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("pair_qty")
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        shipped.withColumn("part_qty", F.sum("pair_qty").over(w))
        .filter(F.col("pair_qty") > F.col("part_qty") * F.lit("0.30").cast("decimal(4,2)"))
        .select("l_suppkey")
        .distinct()
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(
            "NATION_0", "NATION_1", "NATION_2", "NATION_3", "NATION_4"
        )
    )
    return (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(dominant, sup.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_name", F.col("n_name").alias("nation"))
        .orderBy(F.col("s_name").asc())
    )
