"""Extension queries, round 126: average precision (AP / area under the
precision-recall curve in its standard discrete form) — the companion
to ext112's rank-sum ROC-AUC. On imbalanced outcomes PR-space is the
informative view (Davis & Goadrich 2006); a serving pipeline reports
both.

Definition pinned here (deterministic total order, exact integers):
rank all users by (score DESC, user_id ASC); for each positive at rank
k with c positives at or above it, the precision term is
floor(c * 1e6 / k); AP_micro is the integer mean of those terms
(final DIV n_pos). The per-term floor-then-sum makes the rollup
order-free and the oracle replay bit-exact — the ext92/ext120 micro
discipline. Random scores concentrate AP at the positive prevalence;
the planted test replays the md5 score contract in pure Python and
checks the exact value.

Plan shape for 100 TB: one map-side-combinable per-user reduction, then
a single rank over the bounded per-user frame (the ext112 contract) and
one aggregation. Prevalence rides along as the null baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions.dedupfns import hash60
from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_AP_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) % 1000 AS score,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
  FROM events GROUP BY user_id
), ranked AS (
  SELECT y,
         row_number() OVER (ORDER BY score DESC, user_id ASC) AS k,
         sum(y) OVER (ORDER BY score DESC, user_id ASC) AS c
  FROM per_user
), terms AS (
  SELECT CAST(sum(CASE WHEN y = 1 THEN (c * 1000000) // k ELSE 0 END)
              AS BIGINT) AS term_sum,
         CAST(sum(y) AS BIGINT) AS n_pos,
         CAST(sum(1 - y) AS BIGINT) AS n_neg
  FROM ranked
)
SELECT n_pos, n_neg,
       CAST(term_sum // n_pos AS BIGINT) AS ap_micro,
       CAST((n_pos * 1000000) // (n_pos + n_neg) AS BIGINT)
         AS prevalence_micro
FROM terms
"""


@register("propensity_average_precision", _AP_ORACLE)
def q_propensity_average_precision(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact average precision of the hash-contract propensity score
    against realized purchase, with the prevalence null baseline."""
    ev = load_table(spark, sf_dir, "events")
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("y")
        )
        .select(
            "user_id",
            (hash60(F.col("user_id").cast("string")) % 1000).alias("score"),
            "y",
        )
    )
    w = Window.orderBy(F.col("score").desc(), F.col("user_id").asc())
    ranked = per_user.select(
        "y",
        F.row_number().over(w).cast("bigint").alias("k"),
        F.sum("y").over(w).cast("bigint").alias("c"),
    )
    terms = ranked.agg(
        F.sum(
            F.when(
                F.col("y") == 1,
                F.expr("(c * 1000000) DIV k"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("term_sum"),
        F.sum("y").cast("bigint").alias("n_pos"),
        F.sum(1 - F.col("y")).cast("bigint").alias("n_neg"),
    )
    return terms.select(
        "n_pos",
        "n_neg",
        F.expr("CAST(term_sum DIV n_pos AS BIGINT)").alias("ap_micro"),
        F.expr(
            "CAST((n_pos * 1000000) DIV (n_pos + n_neg) AS BIGINT)"
        ).alias("prevalence_micro"),
    )
