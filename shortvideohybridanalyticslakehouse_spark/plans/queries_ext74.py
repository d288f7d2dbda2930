"""Extension queries, round 74: privacy-governance audits — k-anonymity
and l-diversity over the customer registry, the checks a warehouse runs
before an extract is shared. Complements the PII-redaction stats
(queries_ext26 family) with the formal re-identification measures
(Sweeney's k-anonymity; Machanavajjhala's l-diversity).

Quasi-identifier (QI) signature: (nationkey, account-balance band of
width 1000.00) — the generalized attributes a linker could join on.
Sensitive attribute: market segment. Both audits are pure integer
relational algebra: one combinable groupBy to the QI classes (with the
exact count and the distinct-sensitive count), then an O(classes)
rollup. Scale: the class table is the reduced side; at 100 TB the only
shuffle is the QI groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_K = 5
_L = 2

_KANON_ORACLE = f"""
WITH classes AS (
  SELECT c_nationkey,
         CAST(floor(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
              / 100000) AS BIGINT) AS bal_band,
         CAST(count(*) AS BIGINT) AS class_size,
         CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_sensitive
  FROM customer
  GROUP BY 1, 2
)
SELECT CAST(count(*) AS BIGINT) AS n_classes,
       CAST(min(class_size) AS BIGINT) AS min_class_size,
       CAST(sum(CASE WHEN class_size < {_K} THEN 1 ELSE 0 END) AS BIGINT)
         AS k_violating_classes,
       CAST(sum(CASE WHEN class_size < {_K} THEN class_size ELSE 0 END)
            AS BIGINT) AS k_exposed_rows,
       CAST(sum(CASE WHEN n_sensitive < {_L} THEN 1 ELSE 0 END) AS BIGINT)
         AS l_violating_classes,
       CAST(sum(CASE WHEN n_sensitive < {_L} THEN class_size ELSE 0 END)
            AS BIGINT) AS l_exposed_rows
FROM classes
"""


@register("k_anonymity_audit", _KANON_ORACLE)
def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity (k=5) and l-diversity (l=2) of the customer extract
    under the (nation, balance-band) quasi-identifier with market
    segment sensitive: class counts, the minimum class size, and how
    many rows sit in violating classes."""
    cust = load_table(spark, sf_dir, "customer")
    classes = cust.groupBy(
        "c_nationkey",
        F.floor(
            (F.col("c_acctbal").cast("decimal(18,2)") * 100).cast("bigint")
            / 100000
        )
        .cast("bigint")
        .alias("bal_band"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("class_size"),
        F.countDistinct("c_mktsegment").cast("bigint").alias("n_sensitive"),
    )
    return classes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.min("class_size").cast("bigint").alias("min_class_size"),
        F.sum(F.when(F.col("class_size") < _K, 1).otherwise(0))
        .cast("bigint")
        .alias("k_violating_classes"),
        F.sum(F.when(F.col("class_size") < _K, F.col("class_size")).otherwise(0))
        .cast("bigint")
        .alias("k_exposed_rows"),
        F.sum(F.when(F.col("n_sensitive") < _L, 1).otherwise(0))
        .cast("bigint")
        .alias("l_violating_classes"),
        F.sum(
            F.when(F.col("n_sensitive") < _L, F.col("class_size")).otherwise(0)
        )
        .cast("bigint")
        .alias("l_exposed_rows"),
    )
