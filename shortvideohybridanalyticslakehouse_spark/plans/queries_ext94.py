"""Extension queries, round 94: ABC revenue classification and the
day-of-week x hour activity heatmap — two inventory/ops staples.

- part_abc_classification: rank parts by exact revenue cents, classify
  by CUMULATIVE revenue share (A = first 80%, B = to 95%, C = rest; the
  classic Pareto inventory policy). The global rank and the exclusive
  cumulative sum both come from the distributed-rank machinery
  (operators/ranks.py) — no single-partition sort or window anywhere;
  the oracle replays with ordinary windows (DuckDB is single-node, the
  ENGINE plan is the thing under scale constraints).
- dow_hour_activity: event counts + exact-cents value sums on the
  (day-of-week, hour) grid — the staffing/capacity heatmap. Day-of-week
  uses the cross-engine rule (DuckDB strftime('%w')+1 == Spark
  dayofweek, 1=Sunday).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.operators.ranks import (
    with_distributed_prefix_sum,
    with_distributed_row_number,
)
from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_A_MICRO = 800_000  # cumulative share boundaries in micro units
_B_MICRO = 950_000

_ABC_ORACLE = f"""
WITH rev AS (
  -- pure integer cents x percent with explicit half-up (the ext90
  -- contract): decimal scale-reduction casts round differently across
  -- engines exactly at the .005 boundaries 2-decimal factors produce
  SELECT l_partkey,
         CAST(SUM((CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)
                   * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
                              AS BIGINT)) + 50) // 100) AS BIGINT) AS cents
  FROM lineitem GROUP BY 1
), ranked AS (
  SELECT l_partkey, cents,
         sum(cents) OVER (ORDER BY cents DESC, l_partkey ASC
                          ROWS UNBOUNDED PRECEDING) AS cum,
         sum(cents) OVER () AS tot
  FROM rev
), classed AS (
  SELECT l_partkey, cents,
         CASE WHEN cum * 1000000 <= tot * {_A_MICRO} THEN 'A'
              WHEN cum * 1000000 <= tot * {_B_MICRO} THEN 'B'
              ELSE 'C' END AS abc
  FROM ranked
)
SELECT abc,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(cents) AS BIGINT) AS revenue_cents,
       CAST(sum(cents) * 1000000 // (SELECT sum(cents) FROM rev) AS BIGINT)
         AS share_micro
FROM classed GROUP BY 1
"""


@register("part_abc_classification", _ABC_ORACLE)
def q_part_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto ABC classes over exact part revenue: global rank +
    INCLUSIVE cumulative revenue via the distributed prefix machinery
    (exclusive prefix + own value), integer share thresholds."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        li.select(
            "l_partkey",
            (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("ext_cents"),
            (F.col("l_discount").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("d_pct"),
        )
        .groupBy("l_partkey")
        .agg(
            F.sum(F.expr("(ext_cents * (100 - d_pct) + 50) DIV 100"))
            .cast("bigint")
            .alias("cents")
        )
    )
    # total order for rank/prefix: revenue DESC then partkey — encode as
    # ascending keys (negatives) for the machinery's ascending contract
    keyed = rev.select(
        "l_partkey", "cents", (-F.col("cents")).alias("_negc")
    )
    pre = with_distributed_prefix_sum(
        keyed,
        part_cols=[],
        order_cols=["_negc", "l_partkey"],
        value_col="cents",
        out_col="_cum_before",
        single_pass=True,
    )
    tot = rev.agg(F.sum("cents").alias("tot"))
    classed = pre.crossJoin(F.broadcast(tot)).select(
        "l_partkey",
        "cents",
        F.when(
            (F.col("_cum_before") + F.col("cents")) * 1_000_000
            <= F.col("tot") * _A_MICRO,
            F.lit("A"),
        )
        .when(
            (F.col("_cum_before") + F.col("cents")) * 1_000_000
            <= F.col("tot") * _B_MICRO,
            F.lit("B"),
        )
        .otherwise(F.lit("C"))
        .alias("abc"),
        F.col("tot"),
    )
    return classed.groupBy("abc").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("cents").cast("bigint").alias("revenue_cents"),
        F.expr("CAST(sum(cents) * 1000000 DIV max(tot) AS BIGINT)").alias(
            "share_micro"
        ),
    )


_DOW_HOUR_ORACLE = """
SELECT CAST(strftime(ts, '%w') AS INT) + 1 AS dow,
       CAST(strftime(ts, '%H') AS INT) AS hour,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
            AS BIGINT) AS value_cents
FROM events
GROUP BY 1, 2
"""


@register("dow_hour_activity", _DOW_HOUR_ORACLE)
def q_dow_hour_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (day-of-week, hour) staffing heatmap: exact counts and cents
    (1 = Sunday, the Spark dayofweek convention the oracle mirrors)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.dayofweek("ts").alias("dow"), F.hour("ts").alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("bigint"))
        .cast("bigint")
        .alias("value_cents"),
    )
