"""Extension queries, round 90: three operational-warehouse closers.

- order_totalprice_reconciliation: the classic header-vs-lines audit —
  does o_totalprice equal sum(l_extendedprice * (1-l_discount) *
  (1+l_tax)) over the order's lines? The line formula is PURE INTEGER
  arithmetic in both engines: cents x (100 - disc_pct) x (100 + tax_pct)
  with explicit half-up division by 10^4 — a chained DECIMAL product
  would hit Spark's precision-loss reduction (38-digit cap) and drift
  from DuckDB by cents. Reports the mismatch population and its worst
  absolute delta. (TPC-H's generator doesn't guarantee consistency here
  — the AUDIT is the operator under test, whatever the data says.)

- table_file_row_profile: rows-per-physical-file inventory via Spark's
  input_file_name() / DuckDB's filename=true — the small-file compaction
  diagnostic every lakehouse job scheduler wants (file skew = task
  skew). File identity is reduced to the basename so both engines agree.

- hash_experiment_assignment: deterministic A/B bucketing — variant =
  hash60(user_id) % 100 bucketed 50/50, the hash-based assignment every
  experimentation platform uses so the split replays with no assignment
  table; reports per-variant user counts and purchase conversion. Uses
  THE repo md5 hash contract (dedupfns.hash60), so assignment is
  identical in Spark, DuckDB, and any future engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions.dedupfns import hash60
from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_TOL_CENTS = 100  # header/lines agreement tolerance: one dollar

_RECON_ORACLE = f"""
WITH line_cents AS (
  SELECT l_orderkey,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS ext_cents,
         CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS d_pct,
         CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT) AS t_pct
  FROM lineitem
), line_sums AS (
  SELECT l_orderkey,
         CAST(SUM((ext_cents * (100 - d_pct) * (100 + t_pct) + 5000)
                  // 10000) AS BIGINT) AS lines_cents
  FROM line_cents GROUP BY 1
), joined AS (
  SELECT o.o_orderkey,
         CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS header_cents,
         coalesce(l.lines_cents, 0) AS lines_cents
  FROM orders o LEFT JOIN line_sums l ON l.l_orderkey = o.o_orderkey
), flagged AS (
  SELECT *,
         abs(header_cents - lines_cents) AS delta_cents
  FROM joined
)
SELECT CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN delta_cents <= {_TOL_CENTS} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_reconciled,
       CAST(sum(CASE WHEN delta_cents > {_TOL_CENTS} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_mismatched,
       CAST(max(delta_cents) AS BIGINT) AS worst_delta_cents
FROM flagged
"""


@register("order_totalprice_reconciliation", _RECON_ORACLE)
def q_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-vs-lines money audit with exact DECIMAL cents and a
    1-dollar tolerance; one line aggregation + one left join."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    line_cents = li.select(
        "l_orderkey",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("ext_cents"),
        (F.col("l_discount").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("d_pct"),
        (F.col("l_tax").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("t_pct"),
    )
    line_sums = line_cents.groupBy("l_orderkey").agg(
        F.sum(
            F.expr(
                "(ext_cents * (100 - d_pct) * (100 + t_pct) + 5000)"
                " DIV 10000"
            )
        )
        .cast("bigint")
        .alias("lines_cents")
    )
    joined = orders.join(
        line_sums,
        orders["o_orderkey"] == line_sums["l_orderkey"],
        "left",
    ).select(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("header_cents"),
        F.coalesce(F.col("lines_cents"), F.lit(0).cast("bigint")).alias(
            "lines_cents"
        ),
    )
    delta = F.abs(F.col("header_cents") - F.col("lines_cents"))
    return joined.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(delta <= _TOL_CENTS, 1).otherwise(0))
        .cast("bigint")
        .alias("n_reconciled"),
        F.sum(F.when(delta > _TOL_CENTS, 1).otherwise(0))
        .cast("bigint")
        .alias("n_mismatched"),
        F.max(delta).cast("bigint").alias("worst_delta_cents"),
    )


# The driver's DuckDB session exposes only the 10 fixed table VIEWS (no
# filename pseudo-column), and the fixture tables are single parquet
# FILES — so the oracle asserts exactly that layout: one group, named
# 'lineitem.parquet', with the table's full counts. If the fixture ever
# becomes multi-file the row-count mismatch fails loudly instead of
# silently passing. Multi-file grouping behavior is pinned by the
# tmp-path test (tests/test_ext90_queries.py).
_FILE_PROFILE_ORACLE = """
SELECT 'lineitem.parquet' AS file_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
FROM lineitem
"""


@register("table_file_row_profile", _FILE_PROFILE_ORACLE)
def q_table_file_row_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows (and distinct orders) per physical parquet file of the
    lineitem table via input_file_name() — the file-skew / small-file
    compaction diagnostic. Basename-only so engines agree on identity."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.regexp_extract(F.input_file_name(), r"([^/\\]+)$", 1).alias(
                "file_name"
            ),
            "l_orderkey",
        )
        .groupBy("file_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
    )


_ASSIGN_ORACLE = """
WITH assigned AS (
  SELECT user_id,
         CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                   AS BIGINT) % 100 < 50
              THEN 'control' ELSE 'treatment' END AS variant
  FROM (SELECT DISTINCT user_id FROM events)
), outcomes AS (
  SELECT a.variant, a.user_id,
         max(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END)
           AS converted
  FROM assigned a JOIN events e ON e.user_id = a.user_id
  GROUP BY 1, 2
)
SELECT variant,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(converted) AS BIGINT) AS n_converted,
       round(CAST(sum(converted) AS DOUBLE) / count(*), 6) AS conversion
FROM outcomes GROUP BY 1
"""


@register("hash_experiment_assignment", _ASSIGN_ORACLE)
def q_hash_experiment_assignment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Deterministic 50/50 A/B assignment via the repo hash contract
    (hash60(user_id) % 100), with per-variant conversion — assignment
    replays identically everywhere with no assignment table."""
    ev = load_table(spark, sf_dir, "events")
    assigned = (
        ev.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.when(
                hash60(F.col("user_id").cast("string")) % 100 < 50,
                F.lit("control"),
            )
            .otherwise(F.lit("treatment"))
            .alias("variant"),
        )
    )
    outcomes = (
        assigned.join(ev, "user_id")
        .groupBy("variant", "user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted")
        )
    )
    return outcomes.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_converted"),
        F.round(
            F.sum("converted").cast("double") / F.count(F.lit(1)), 6
        ).alias("conversion"),
    )
