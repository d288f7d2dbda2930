"""Extension queries, round 13: the remaining TPC-H shapes expressible on
this fixture's columns — Q6 (scan-side filter agg), Q7 (nation-pair
volume), Q8 (market share), Q10 (returned-item top-k), Q14 (promo share).

Q2/Q9/Q11/Q16/Q20 need partsupp (absent from the fixture) and
Q12/Q19/Q21 need l_shipmode/l_commitdate/l_receiptdate (absent), so this
closes out the implementable classic set. Reference analog: these are the
BI-read-path shapes (SURVEY.md §3.3) generalized beyond the metrics
domain — star joins, conditional shares, and top-k reports.

Determinism rules shared with queries_ext5.py: decimal casts before
sums, conditional sums via CASE inside the decimal agg, double division
only on already-exact decimal totals, round(…, N) on both engines,
explicit tie-breaks on every top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

# ---------------------------------------------------------------------------
# TPC-H Q6 shape: forecast revenue change (pure scan-side filter + agg)
# ---------------------------------------------------------------------------

# The cheapest classic: every predicate is scan-pushable (PushedFilters
# on shipdate/discount/quantity), the agg is a 1-row partial+final — at
# 100 TB this is I/O bound and reads exactly 4 columns.
_Q6_ORACLE = """
SELECT
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("tpch_q6_forecast_revenue", _Q6_ORACLE)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast revenue change (TPC-H Q6 shape): revenue that would have
    been gained by eliminating small discounts in one year. All three
    predicates push to the parquet scan; only 4 columns are read.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * F.col("l_discount").cast("decimal(18,2)")
                ).cast("double"),
                2,
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q7 shape: volume shipping between two nations
# ---------------------------------------------------------------------------

# supplier⋈nation and customer⋈nation prune to 2/25 of each dim BEFORE
# the fact joins, so the orderkey/custkey shuffles carry only qualifying
# rows; the (supp, cust) nation-pair cross filter rides the joined row.
_Q7_ORACLE = """
SELECT
  supp_nation,
  cust_nation,
  CAST(l_year AS BIGINT) AS l_year,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE), 2)
    AS revenue
FROM (
  SELECT
    n1.n_name AS supp_nation,
    n2.n_name AS cust_nation,
    EXTRACT(year FROM l_shipdate) AS l_year,
    l_extendedprice,
    l_discount
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@register("tpch_q7_volume_shipping", _Q7_ORACLE)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping (TPC-H Q7 shape): yearly trade revenue between two
    nations, in both directions. The two nation dims broadcast into
    supplier/customer first, shrinking both fact-join inputs ~12.5×
    before any big shuffle.
    """
    nations = ("NATION_1", "NATION_2")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(*nations)
    )
    supplier = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    customer = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    joined = (
        li.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return joined.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("bigint").alias("l_year"),
    ).agg(
        F.round(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
            ).cast("double"),
            2,
        ).alias("revenue")
    )


# ---------------------------------------------------------------------------
# TPC-H Q8 shape: national market share within a region
# ---------------------------------------------------------------------------

# The share is a conditional decimal sum over the SAME rows as the total
# — one agg, no self-join. Division happens once, on exact decimal
# totals cast to double, rounded identically in both engines.
_Q8_ORACLE = """
SELECT
  CAST(o_year AS BIGINT) AS o_year,
  round(CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume
                      ELSE CAST(0.00 AS DECIMAL(38,4)) END) AS DOUBLE)
        / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT
    EXTRACT(year FROM o_orderdate) AS o_year,
    CAST(CAST(l_extendedprice AS DECIMAL(18,2))
         * CAST(1 - l_discount AS DECIMAL(18,2)) AS DECIMAL(38,4)) AS volume,
    n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'EUROPE'
    AND p_type = 'PROMO'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate <  TIMESTAMP '1998-01-01'
) all_nations
GROUP BY o_year
"""


@register("tpch_q8_market_share", _Q8_ORACLE)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (TPC-H Q8 shape): NATION_3's slice of PROMO
    part revenue sold into EUROPE customers per order-year. Eight-table
    star: part filters lineitem by ~1/6 via broadcast, region/nation
    prune customers; the numerator is count_if-style conditional sum so
    the whole query is one pass over qualifying facts.
    """
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO"
    ).select("p_partkey")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = load_table(spark, sf_dir, "nation")
    cust_nation = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("cnk"))
    customer = load_table(spark, sf_dir, "customer").join(
        F.broadcast(cust_nation), F.col("c_nationkey") == F.col("cnk")
    ).select("c_custkey")
    supplier = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    volume = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
    ).cast("decimal(38,4)")
    joined = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            volume.alias("volume"),
            "nation",
        )
    )
    return joined.groupBy("o_year").agg(
        F.round(
            F.sum(
                F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(
                    F.lit(0.00).cast("decimal(38,4)")
                )
            ).cast("double")
            / F.sum("volume").cast("double"),
            6,
        ).alias("mkt_share")
    )


# ---------------------------------------------------------------------------
# TPC-H Q10 shape: returned-item reporting (top-20 customers by lost revenue)
# ---------------------------------------------------------------------------

# Agg BEFORE the dim join: revenue groups on the customer grain first,
# then only the top candidates' rows meet customer/nation. Tie-break on
# c_custkey makes the LIMIT edge deterministic across engines.
_Q10_ORACLE = """
WITH rev AS (
  SELECT c_custkey AS k,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * CAST(1 - l_discount AS DECIMAL(18,2))) AS revenue
  FROM customer
  JOIN orders   ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate <  TIMESTAMP '1996-07-01'
    AND l_returnflag = 'R'
  GROUP BY c_custkey
)
SELECT
  CAST(c_custkey AS BIGINT) AS c_custkey,
  c_name,
  round(CAST(revenue AS DOUBLE), 2) AS revenue,
  round(CAST(c_acctbal AS DOUBLE), 2) AS c_acctbal,
  n_name
FROM rev
JOIN customer ON c_custkey = k
JOIN nation   ON c_nationkey = n_nationkey
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


@register("tpch_q10_returned_items", _Q10_ORACLE)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting (TPC-H Q10 shape): the 20 customers who
    lost the most revenue to returns in one half-year. The heavy agg runs
    on (custkey) BEFORE joining customer/nation attributes, so the dim
    join touches at most the aggregated grain; TakeOrderedAndProject
    keeps a 20-row heap per partition instead of a global sort.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    rev = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
            ).alias("rev_d")
        )
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        rev.join(customer, F.col("c_custkey") == F.col("k"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("c_custkey").cast("bigint").alias("c_custkey"),
            "c_name",
            F.round(F.col("rev_d").cast("double"), 2).alias("revenue"),
            F.round(F.col("c_acctbal").cast("double"), 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# TPC-H Q14 shape: promotion revenue share
# ---------------------------------------------------------------------------

_Q14_ORACLE = """
SELECT
  round(100.00 * CAST(sum(CASE WHEN p_type = 'PROMO'
    THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2))
              * CAST(1 - l_discount AS DECIMAL(18,2)) AS DECIMAL(38,4))
    ELSE CAST(0.00 AS DECIMAL(38,4)) END) AS DOUBLE)
    / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE), 6)
  AS promo_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate <  TIMESTAMP '1996-04-01'
"""


@register("tpch_q14_promo_revenue", _Q14_ORACLE)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion revenue share (TPC-H Q14 shape): percent of one month's
    revenue from PROMO parts. Month filter is scan-side on lineitem;
    part broadcasts; numerator/denominator are one conditional-sum agg.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
    )
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    return joined.agg(
        F.round(
            F.lit(100.00)
            * F.sum(
                F.when(F.col("p_type") == "PROMO", rev.cast("decimal(38,4)"))
                .otherwise(F.lit(0.00).cast("decimal(38,4)"))
            ).cast("double")
            / F.sum(rev).cast("double"),
            6,
        ).alias("promo_revenue")
    )
