"""Extension queries, round 30: the remaining TPC-H-shaped plan families
expressible on the fixture schema — disjunctive predicate pushdown (q19),
derived-class × priority matrix (q12), multi-EXISTS / NOT-EXISTS anti
(q21), and the multi-join profit rollup (q9).

The fixture's lineitem is trimmed (no shipmode / commitdate / receiptdate
/ shipinstruct / container — TESTDATA.md), so each query is an explicit
ADAPTATION that preserves the canonical query's PLAN SHAPE (the thing
worth testing) against the columns that exist; lateness is derived from
l_shipdate - o_orderdate. Reference analogs: the BI query surface in
SURVEY.md §2.5/§2.8.

Determinism discipline as everywhere: decimal-exact money sums cast to
double at the very end, date arithmetic in whole days, counts as BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

# ---------------------------------------------------------------------------
# q12 shape: lateness class x order priority matrix
# ---------------------------------------------------------------------------

_Q12_ORACLE = """
SELECT
  CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY THEN 'late'
       ELSE 'on_time' END AS ship_class,
  CAST(count(*) FILTER (WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH'))
       AS BIGINT) AS high_line_count,
  CAST(count(*) FILTER (WHERE o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
       AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
"""


@register("tpch_q12_late_line_priority", _Q12_ORACLE)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q12 adapted (no shipmode column): lines classed late/on-time
    by shipdate lag vs the order date, crossed with order priority as
    conditional counts. One fact-fact join on orderkey (both sides
    key-partitioned; at scale the orders side projects 3 columns and
    co-partitions — no broadcast of a fact), then a 2-group conditional
    aggregate, map-side combinable.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.withColumn(
            "ship_class",
            F.when(
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
                F.lit("late"),
            ).otherwise(F.lit("on_time")),
        )
        .groupBy("ship_class")
        .agg(
            F.count_if(high).alias("high_line_count"),
            F.count_if(~high).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# q19 shape: disjunctive OR-of-ANDs predicate revenue
# ---------------------------------------------------------------------------

_Q19_ORACLE = """
SELECT
  round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
              * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2)
    AS revenue,
  CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE
  (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
     AND l.l_quantity >= 1 AND l.l_quantity <= 20)
  OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
     AND l.l_quantity >= 10 AND l.l_quantity <= 40)
  OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
     AND l.l_quantity >= 20 AND l.l_quantity <= 50)
"""


@register("tpch_q19_disjunctive_revenue", _Q19_ORACLE)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q19 adapted (no container/shipinstruct columns): revenue under
    an OR-of-ANDs predicate spanning both join sides. The per-side
    conjuncts Catalyst CAN extract get pushed below the join (part's
    brand/size disjunction prunes the build side; quantity bounds prune
    the probe side via the derived `quantity between min-min and max-max`
    envelope); the cross-side residue evaluates post-join — the exact
    disjunction-pushdown behavior q19 exists to exercise.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    q = F.col("l_quantity")
    pred = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & (q >= 1)
            & (q <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & (q >= 10)
            & (q <= 40)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & (q >= 20)
            & (q <= 50)
        )
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return j.filter(pred).agg(
        F.round(F.sum(rev).cast("double"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# q21 shape: EXISTS + NOT EXISTS waiting-supplier anti pattern
# ---------------------------------------------------------------------------

_Q21_ORACLE = """
WITH late AS (
  SELECT l.l_orderkey, l.l_suppkey,
         l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY AS is_late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
)
SELECT s.s_name,
       CAST(count(*) AS BIGINT) AS numwait
FROM late l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE l1.is_late
  AND n.n_name IN ('NATION_0', 'NATION_1', 'NATION_2')
  AND EXISTS (
    SELECT 1 FROM late l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM late l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.is_late)
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name ASC
LIMIT 10
"""


@register("tpch_q21_waiting_supplier", _Q21_ORACLE)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q21 adapted (lateness = shipdate > orderdate + 90d, no
    receipt/commit dates): suppliers who were the SOLE late supplier on a
    multi-supplier finished order. The canonical EXISTS -> left-semi and
    NOT EXISTS -> left-anti pair, both on the orderkey shuffle the `late`
    subplan already established — three passes over one co-partitioned
    intermediate, never a per-row subquery.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderstatus"
    )
    late = (
        li.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            li.l_orderkey == orders.o_orderkey,
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
            ).alias("is_late"),
        )
    )
    l1 = late.filter(F.col("is_late")).alias("l1")
    l2 = late.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    ).alias("l2")
    l3 = (
        late.filter(F.col("is_late"))
        .select(F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3"))
        .alias("l3")
    )
    cand = l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("k2"))
        & (F.col("l1.l_suppkey") != F.col("s2")),
        "left_semi",
    ).join(
        l3,
        (F.col("l1.l_orderkey") == F.col("k3"))
        & (F.col("l1.l_suppkey") != F.col("s3")),
        "left_anti",
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_0", "NATION_1", "NATION_2")
    )
    return (
        cand.join(F.broadcast(sup), cand.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q9 shape: multi-join profit rollup by nation x year
# ---------------------------------------------------------------------------

_Q9_ORACLE = """
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       round(CAST(sum(
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
         - CAST(p.p_retailprice AS DECIMAL(18,2))
           * CAST(l.l_quantity AS DECIMAL(18,2)) * CAST(0.10 AS DECIMAL(4,2))
       ) AS DOUBLE), 2) AS sum_profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%red%'
GROUP BY 1, 2
"""


@register("tpch_q9_nation_profit_proxy", _Q9_ORACLE)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q9 adapted (no partsupp table: supply cost proxied as 10% of
    p_retailprice x quantity): per nation x order-year profit over a
    5-table star. Plan: lineitem streams ONCE; part (name-filtered),
    supplier, nation broadcast; the orders join shuffles on orderkey —
    the one unavoidable fact-fact exchange; decimal-exact profit summed
    before the final double cast.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount",
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    ) - F.col("p_retailprice").cast("decimal(18,2)") * F.col("l_quantity").cast(
        "decimal(18,2)"
    ) * F.lit("0.10").cast("decimal(4,2)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.round(F.sum(profit).cast("double"), 2).alias("sum_profit"))
    )
