"""Extension queries, round 116: t-closeness audit (Li, Li &
Venkatasubramanian 2007) — the third member of the re-identification
triad, joining the ext74 k-anonymity/l-diversity audit. An equivalence
class can be k-anonymous and l-diverse yet still leak: if its SENSITIVE
DISTRIBUTION skews far from the table-wide one, membership in the class
is itself informative. t-closeness bounds the total-variation distance
between the class's sensitive distribution and the global distribution.

Shares ext74's quasi-identifier contract — (nationkey, balance band of
width 1000.00 through the DECIMAL(18,2) cents hop, plans/money.py) —
with market segment sensitive, so the two audits read as one policy.

Exactness: TV distance is computed entirely in integers. For class c
with n_c rows and segment counts cnt_cs (global: N, cnt_s):

    num_c = sum_{s in class} |cnt_cs * N - cnt_s * n_c|
            + (N - sum_{s in class} cnt_s) * n_c     -- absent segments
    tv_micro = (num_c * 1000000) // (2 * n_c * N)

The absent-segment identity (sum of p_s over segments missing from the
class = 1 - sum of present p_s) removes the class-x-segment grid join
entirely. All products stay in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB,
native) so the arithmetic cannot overflow at any SF; the single final
integral divide is SQL DIV == '//' (the ext90/ext103 half-up-DIV family
rule for micro-unit rates).

Plan shape for 100 TB: one map-side-combinable groupBy to
(class, segment) counts, one to class sizes, and a BROADCAST of the
<=5-row global segment distribution — the only shuffle is the QI
groupBy; everything after runs on the reduced class table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

T_MICRO = 200000  # flag classes with TV > 0.2

_BAND_SQL = (
    "CAST(floor(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)"
    " / 100000) AS BIGINT)"
)

_TCLOSE_ORACLE = f"""
WITH cs AS (
  SELECT c_nationkey, {_BAND_SQL} AS bal_band, c_mktsegment,
         CAST(count(*) AS BIGINT) AS cnt_cs
  FROM customer GROUP BY 1, 2, 3
), cls AS (
  SELECT c_nationkey, bal_band,
         CAST(sum(cnt_cs) AS BIGINT) AS n_c
  FROM cs GROUP BY 1, 2
), gseg AS (
  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS cnt_s FROM customer
  GROUP BY 1
), tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM customer),
num AS (
  SELECT cs.c_nationkey, cs.bal_band,
         sum(abs(CAST(cnt_cs AS HUGEINT) * n - CAST(cnt_s AS HUGEINT)
                 * cls.n_c)) AS present_abs,
         sum(CAST(cnt_s AS HUGEINT)) AS present_glob
  FROM cs
  JOIN cls USING (c_nationkey, bal_band)
  JOIN gseg USING (c_mktsegment)
  CROSS JOIN tot
  GROUP BY 1, 2
)
SELECT num.c_nationkey AS nationkey, num.bal_band, cls.n_c AS n_rows,
       CAST(((present_abs + (n - present_glob) * CAST(cls.n_c AS HUGEINT))
             * 1000000) // (2 * CAST(cls.n_c AS HUGEINT) * n) AS BIGINT)
         AS tv_micro,
       (((present_abs + (n - present_glob) * CAST(cls.n_c AS HUGEINT))
         * 1000000) // (2 * CAST(cls.n_c AS HUGEINT) * n)) > {T_MICRO}
         AS t_violation
FROM num JOIN cls USING (c_nationkey, bal_band) CROSS JOIN tot
"""


@register("t_closeness_audit", _TCLOSE_ORACLE)
def q_t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per equivalence class (nation, balance band): exact
    total-variation distance (micro units) between the class's market
    segment distribution and the global one, flagged against t=0.2."""
    cust = load_table(spark, sf_dir, "customer")
    band = (
        F.floor(
            (F.col("c_acctbal").cast("decimal(18,2)") * 100).cast("bigint")
            / 100000
        )
        .cast("bigint")
        .alias("bal_band")
    )
    cs = cust.groupBy(
        F.col("c_nationkey").alias("nationkey"), band, "c_mktsegment"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt_cs"))
    cls = cs.groupBy("nationkey", "bal_band").agg(
        F.sum("cnt_cs").cast("bigint").alias("n_c")
    )
    glob = cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt_s")
    )
    tot = cust.agg(F.count(F.lit(1)).cast("bigint").alias("n"))

    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    num = (
        cs.join(cls, ["nationkey", "bal_band"])
        .join(F.broadcast(glob), "c_mktsegment")
        .crossJoin(F.broadcast(tot))
        .groupBy("nationkey", "bal_band")
        .agg(
            F.sum(
                F.abs(
                    d38(F.col("cnt_cs")) * d38(F.col("n"))
                    - d38(F.col("cnt_s")) * d38(F.col("n_c"))
                )
            ).alias("present_abs"),
            F.sum(d38(F.col("cnt_s"))).alias("present_glob"),
        )
    )
    out = (
        num.join(cls, ["nationkey", "bal_band"])
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "tv_micro",
            F.expr(
                "CAST(((present_abs + (CAST(n AS DECIMAL(38,0))"
                " - present_glob) * CAST(n_c AS DECIMAL(38,0)))"
                " * 1000000) DIV (2 * CAST(n_c AS DECIMAL(38,0))"
                " * CAST(n AS DECIMAL(38,0))) AS BIGINT)"
            ),
        )
    )
    return out.select(
        "nationkey",
        "bal_band",
        F.col("n_c").alias("n_rows"),
        "tv_micro",
        (F.col("tv_micro") > T_MICRO).alias("t_violation"),
    )
