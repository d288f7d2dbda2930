"""Extension queries, round 82: data-contract expectation suite — the
dbt-tests / Great-Expectations report shape: ONE relation of
(check_name, table_name, n_checked, n_violations, passed) rows covering
referential integrity, domain, range, ordering, uniqueness, and
null-required checks over the raw warehouse tables.

This complements the serving-layer gates (plans/bi.py acceptance pack,
which guards the ENGINE's outputs) by auditing the INPUT tables — the
contract a warehouse asserts before building anything on top.

Scale shape: every per-table check family is ONE conditional-aggregation
pass over its table (never one scan per check); the two FK checks are
left-anti joins on the join keys; the uniqueness check is one groupBy on
the candidate key counting size>1 groups. Unioning a handful of 1-row
aggregates is free. 100 TB story: each scan is a full-table pass you
would schedule anyway as a post-load audit; nothing here is quadratic
and nothing collects.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_DQ_ORACLE = """
WITH li AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS bad_qty,
         CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END)
           AS BIGINT) AS bad_disc,
         CAST(sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
                        OR l_returnflag IS NULL THEN 1 ELSE 0 END)
           AS BIGINT) AS bad_flag
  FROM lineitem
), ords AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS bad_price,
         CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS bad_null
  FROM orders
), fk_li AS (
  SELECT CAST(count(*) AS BIGINT) AS orphans
  FROM lineitem l WHERE NOT EXISTS (
    SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
), fk_o AS (
  SELECT CAST(count(*) AS BIGINT) AS orphans
  FROM orders o WHERE NOT EXISTS (
    SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
), uq AS (
  SELECT CAST(count(*) AS BIGINT) AS n_keys,
         CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_keys
  FROM (SELECT count(*) AS cnt FROM lineitem
        GROUP BY l_orderkey, l_linenumber)
)
SELECT * FROM (
  SELECT 'quantity_positive' AS check_name, 'lineitem' AS table_name,
         n AS n_checked, bad_qty AS n_violations, bad_qty = 0 AS passed
  FROM li
  UNION ALL
  SELECT 'discount_in_unit_range', 'lineitem', n, bad_disc, bad_disc = 0
  FROM li
  UNION ALL
  SELECT 'returnflag_domain', 'lineitem', n, bad_flag, bad_flag = 0 FROM li
  UNION ALL
  SELECT 'totalprice_non_negative', 'orders', n, bad_price, bad_price = 0
  FROM ords
  UNION ALL
  SELECT 'orderdate_not_null', 'orders', n, bad_null, bad_null = 0 FROM ords
  UNION ALL
  SELECT 'fk_lineitem_orders', 'lineitem', (SELECT n FROM li), orphans,
         orphans = 0 FROM fk_li
  UNION ALL
  SELECT 'fk_orders_customer', 'orders', (SELECT n FROM ords), orphans,
         orphans = 0 FROM fk_o
  UNION ALL
  SELECT 'unique_orderkey_linenumber', 'lineitem', n_keys, dup_keys,
         dup_keys = 0 FROM uq
)
"""

@register("data_contract_expectations", _DQ_ORACLE)
def q_data_contract_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation-suite report: one conditional-agg pass per table, two
    anti-join FK audits, one candidate-key uniqueness groupBy — unioned
    into the standard (check, table, checked, violations, passed) shape."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    li_agg = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("l_quantity") <= 0, 1).otherwise(0)).alias(
            "bad_qty"
        ),
        F.sum(
            F.when(
                (F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1
            ).otherwise(0)
        ).alias("bad_disc"),
        F.sum(
            F.when(
                ~F.col("l_returnflag").isin("A", "N", "R")
                | F.col("l_returnflag").isNull(),
                1,
            ).otherwise(0)
        ).alias("bad_flag"),
    )
    o_agg = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("o_totalprice") < 0, 1).otherwise(0)).alias(
            "bad_price"
        ),
        F.sum(F.when(F.col("o_orderdate").isNull(), 1).otherwise(0)).alias(
            "bad_null"
        ),
    )
    # FK audits as LEFT join + conditional count: one pass gives both the
    # denominator (n) and the orphan count, instead of an anti-join plus a
    # second scan to broadcast the table size (parent keys are unique, so
    # the join never fans out)
    fk_li = li.select("l_orderkey").join(
        orders.select(
            F.col("o_orderkey").alias("l_orderkey"), F.lit(1).alias("_hit")
        ),
        "l_orderkey",
        "left",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0)).alias("orphans"),
    )
    fk_o = orders.select("o_custkey").join(
        cust.select(
            F.col("c_custkey").alias("o_custkey"), F.lit(1).alias("_hit")
        ),
        "o_custkey",
        "left",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0)).alias("orphans"),
    )
    uq = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0)).alias("dup_keys"),
        )
    )

    def melt(src, table, checks):
        """One agg row -> one report row per check via explode, so every
        check family in `src` costs exactly ONE scan of its table (a
        union of per-check selects would re-run the whole aggregate per
        branch — measured 12 lineitem scans before this shape)."""
        return src.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(check).alias("check_name"),
                            F.lit(table).alias("table_name"),
                            F.col(n_col).cast("bigint").alias("n_checked"),
                            F.col(v_col).cast("bigint").alias("n_violations"),
                            (F.col(v_col) == 0).alias("passed"),
                        )
                        for check, n_col, v_col in checks
                    ]
                )
            ).alias("r")
        ).select("r.*")

    li_rows = melt(
        li_agg,
        "lineitem",
        [
            ("quantity_positive", "n", "bad_qty"),
            ("discount_in_unit_range", "n", "bad_disc"),
            ("returnflag_domain", "n", "bad_flag"),
        ],
    )
    o_rows = melt(
        o_agg,
        "orders",
        [
            ("totalprice_non_negative", "n", "bad_price"),
            ("orderdate_not_null", "n", "bad_null"),
        ],
    )
    fk_li_rows = melt(
        fk_li, "lineitem", [("fk_lineitem_orders", "n", "orphans")]
    )
    fk_o_rows = melt(
        fk_o, "orders", [("fk_orders_customer", "n", "orphans")]
    )
    uq_rows = melt(
        uq, "lineitem", [("unique_orderkey_linenumber", "n_keys", "dup_keys")]
    )
    return reduce(
        lambda a, b: a.unionByName(b),
        [li_rows, o_rows, fk_li_rows, fk_o_rows, uq_rows],
    )
