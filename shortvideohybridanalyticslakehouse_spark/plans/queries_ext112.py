"""Extension queries, round 112: ranking-quality and dependence
diagnostics — AUC-ROC of the hash-contract propensity score via the
rank-sum (Mann-Whitney) identity, and mutual information between event
type and hour of day.

AUC is EXACT integers end to end: tie-averaged ranks carried x2
(2*min_rank + tie_count - 1), U statistic from the positive-class rank
sum, auc_micro = U_x2 * 1e6 DIV (2 * n_pos * n_neg). The MI follows the
ext10 entropy convention — every log2 takes an exact integer count, the
float sum spans only |types| x |hours| = 120 terms, and the result
rounds to 4 decimals on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions.dedupfns import hash60
from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_AUC_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) % 1000 AS score,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
  FROM events GROUP BY user_id
), ranked AS (
  SELECT y,
         2 * rank() OVER (ORDER BY score)
           + count(*) OVER (PARTITION BY score) - 1 AS r2
  FROM per_user
), sums AS (
  SELECT CAST(sum(CASE WHEN y = 1 THEN r2 ELSE 0 END) AS BIGINT) AS r1_x2,
         CAST(sum(y) AS BIGINT) AS n_pos,
         CAST(sum(1 - y) AS BIGINT) AS n_neg
  FROM ranked
)
SELECT n_pos, n_neg,
       CAST(r1_x2 - n_pos * (n_pos + 1) AS BIGINT) AS u_stat_x2,
       CAST(((r1_x2 - n_pos * (n_pos + 1)) * 1000000)
            // (2 * n_pos * n_neg) AS BIGINT) AS auc_micro
FROM sums
"""


@register("propensity_auc_rank", _AUC_ORACLE)
def q_propensity_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUC-ROC of the hash-contract propensity score against realized
    purchase, by the Mann-Whitney rank-sum identity — tie-averaged ranks
    x2 keep every intermediate an exact integer (the score is uniform
    noise, so AUC ~ 0.5: the eval harness's null calibration). One
    global rank over |users| rows — bounded, single window."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("y")
    ).select(
        (hash60(F.col("user_id").cast("string")) % 1000).alias("score"),
        "y",
    )
    ranked = per_user.select(
        "y",
        (
            2 * F.rank().over(Window.orderBy("score"))
            + F.count(F.lit(1)).over(Window.partitionBy("score"))
            - 1
        ).cast("bigint").alias("r2"),
    )
    sums = ranked.agg(
        F.sum(F.when(F.col("y") == 1, F.col("r2")).otherwise(0))
        .cast("bigint")
        .alias("r1_x2"),
        F.sum("y").cast("bigint").alias("n_pos"),
        F.sum(1 - F.col("y")).cast("bigint").alias("n_neg"),
    )
    return sums.select(
        "n_pos",
        "n_neg",
        F.expr("CAST(r1_x2 - n_pos * (n_pos + 1) AS BIGINT)").alias(
            "u_stat_x2"
        ),
        F.expr(
            "CAST(((r1_x2 - n_pos * (n_pos + 1)) * 1000000)"
            " DIV (2 * n_pos * n_neg) AS BIGINT)"
        ).alias("auc_micro"),
    )


_MI_ORACLE = """
WITH cells AS (
  SELECT event_type AS x, CAST(extract(hour FROM ts) AS BIGINT) AS y,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), mx AS (
  SELECT x, CAST(sum(c) AS BIGINT) AS cx FROM cells GROUP BY 1
), my AS (
  SELECT y, CAST(sum(c) AS BIGINT) AS cy FROM cells GROUP BY 1
), tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS n FROM cells
), terms AS (
  SELECT c.c, m1.cx, m2.cy, t.n
  FROM cells c JOIN mx m1 USING (x) JOIN my m2 USING (y), tot t
)
SELECT max(n) AS n_events,
       CAST(count(*) AS BIGINT) AS n_cells,
       round(sum(CAST(c AS DOUBLE) * (log2(CAST(c AS DOUBLE))
                                      + log2(CAST(n AS DOUBLE))
                                      - log2(CAST(cx AS DOUBLE))
                                      - log2(CAST(cy AS DOUBLE))))
             / max(n), 4) AS mi_bits,
       round(log2(CAST(max(n) AS DOUBLE))
             - sum(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))) / max(n),
             4) AS h_joint_bits
FROM terms
"""


@register("event_type_hour_mutual_info", _MI_ORACLE)
def q_type_hour_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (bits) between event type and hour of day —
    the dependence screen feature selection runs before building
    per-hour models. Every log2 argument is an exact integer count
    (ext10 entropy convention); the float sum spans 120 cells and
    rounds to 4 decimals on both engines."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.col("event_type").alias("x"),
        F.hour("ts").cast("bigint").alias("y"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    mx = cells.groupBy("x").agg(F.sum("c").cast("bigint").alias("cx"))
    my = cells.groupBy("y").agg(F.sum("c").cast("bigint").alias("cy"))
    tot = F.broadcast(cells.agg(F.sum("c").cast("bigint").alias("n")))
    terms = (
        cells.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(tot)
    )
    cd = F.col("c").cast("double")
    mi_term = cd * (
        F.log2(cd)
        + F.log2(F.col("n").cast("double"))
        - F.log2(F.col("cx").cast("double"))
        - F.log2(F.col("cy").cast("double"))
    )
    return terms.agg(
        F.max("n").alias("n_events"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.round(F.sum(mi_term) / F.max("n"), 4).alias("mi_bits"),
        F.round(
            F.log2(F.max("n").cast("double"))
            - F.sum(cd * F.log2(cd)) / F.max("n"),
            4,
        ).alias("h_joint_bits"),
    )
