"""Extension queries, round 20: FULL OUTER join reconciliation (the one
join type the ledger lacked) and matryoshka truncated-dimension ANN
recall (how much retrieval quality 1/8th of the embedding buys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions import similarity
from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

# ---------------------------------------------------------------------------
# FULL OUTER reconciliation: view-activity vs purchase-activity per user-day
# ---------------------------------------------------------------------------

# Both aggregates AND the join share the (user_id, day) partitioning —
# one shuffle feeds all three; the outer join preserves one-sided rows
# (viewed-but-not-purchased and vice versa), which inner/left joins
# silently misclassify. Final rollup is 3 rows.
_FULL_OUTER_ORACLE = """
WITH v AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(count(*) AS BIGINT) AS n_views
  FROM events WHERE event_type = 'view' GROUP BY 1, 2
), p AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(count(*) AS BIGINT) AS n_purchases
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
)
SELECT
  CASE WHEN v.user_id IS NULL THEN 'purchase_only'
       WHEN p.user_id IS NULL THEN 'view_only'
       ELSE 'both' END AS activity_class,
  CAST(count(*) AS BIGINT) AS n_user_days,
  CAST(sum(coalesce(n_views, 0)) AS BIGINT) AS views,
  CAST(sum(coalesce(n_purchases, 0)) AS BIGINT) AS purchases
FROM v FULL OUTER JOIN p ON v.user_id = p.user_id AND v.day = p.day
GROUP BY 1
"""


@register("user_day_activity_full_outer", _FULL_OUTER_ORACLE)
def q_user_day_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user-day reconciliation of view vs purchase activity via FULL
    OUTER join — the only join type that keeps BOTH one-sided
    populations (browsers who never bought that day, buyers who arrived
    without browsing). One (user_id, day) shuffle serves both
    aggregates and the join.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "day")
        .agg(F.count(F.lit(1)).alias("n_views"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "day")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
    joined = v.join(p, ["user_id", "day"], "full_outer")
    # after USING-style join, one-sided rows null out the SIDE's metric,
    # not the key — classify on the metric columns
    cls = (
        F.when(F.col("n_views").isNull(), "purchase_only")
        .when(F.col("n_purchases").isNull(), "view_only")
        .otherwise("both")
    )
    return joined.groupBy(cls.alias("activity_class")).agg(
        F.count(F.lit(1)).alias("n_user_days"),
        F.sum(F.coalesce(F.col("n_views"), F.lit(0))).alias("views"),
        F.sum(F.coalesce(F.col("n_purchases"), F.lit(0))).alias("purchases"),
    )


# ---------------------------------------------------------------------------
# Matryoshka truncation recall: top-10 with 8 of 64 dims vs full vector
# ---------------------------------------------------------------------------

# The MRL serving question: truncated prefixes are 8× cheaper to scan —
# what recall do they keep? Both rankings use the same deterministic
# tie-break (rounded sim DESC, id ASC); the overlap join is 10×10.
_DUCK_COS8 = (
    "round(list_sum(list_transform(range(1, 9), "
    "i -> CAST(b.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))) "
    "/ (sqrt(list_sum(list_transform(range(1, 9), "
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)))) "
    "* sqrt(list_sum(list_transform(range(1, 9), "
    "i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))), 6)"
)
_DUCK_COS64 = (
    "round(list_sum(list_transform(range(1, 65), "
    "i -> CAST(b.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))) "
    "/ (sqrt(list_sum(list_transform(range(1, 65), "
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)))) "
    "* sqrt(list_sum(list_transform(range(1, 65), "
    "i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))), 6)"
)

_MATRYOSHKA_ORACLE = f"""
WITH a AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
full_top AS (
  SELECT b.vec_id FROM embeddings b CROSS JOIN a WHERE b.vec_id <> 0
  ORDER BY {_DUCK_COS64} DESC, b.vec_id ASC LIMIT 10
),
trunc_top AS (
  SELECT b.vec_id FROM embeddings b CROSS JOIN a WHERE b.vec_id <> 0
  ORDER BY {_DUCK_COS8} DESC, b.vec_id ASC LIMIT 10
)
SELECT
  CAST((SELECT count(*) FROM full_top) AS BIGINT) AS n_full,
  CAST((SELECT count(*) FROM trunc_top) AS BIGINT) AS n_trunc,
  CAST((SELECT count(*) FROM full_top JOIN trunc_top USING (vec_id))
       AS BIGINT) AS n_overlap,
  round(CAST((SELECT count(*) FROM full_top JOIN trunc_top USING (vec_id))
             AS DOUBLE) / 10, 6) AS recall_at_10
"""


@register("matryoshka_truncation_recall", _MATRYOSHKA_ORACLE)
def q_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of 8-dim-prefix retrieval against the full 64-dim
    ranking (the matryoshka-truncation trade-off audit). A truncated
    index scans 1/8th the floats; this measures what that costs for
    one probe under identical tie-breaks.
    """
    emb = load_table(spark, sf_dir, "embeddings", ensure_parallelism=True)
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    corpus = emb.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(query))

    def topk(sim_col):
        return (
            corpus.select("vec_id", F.round(sim_col, 6).alias("sim"))
            .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
            .limit(10)
            .select("vec_id")
        )

    full_top = topk(similarity.cosine(F.col("embedding"), F.col("qv")))
    trunc_top = topk(
        similarity.cosine(
            F.slice(F.col("embedding"), 1, 8), F.slice(F.col("qv"), 1, 8)
        )
    )
    overlap = full_top.join(trunc_top, "vec_id").agg(
        F.count(F.lit(1)).alias("n_overlap")
    )
    counts = full_top.agg(F.count(F.lit(1)).alias("n_full")).crossJoin(
        trunc_top.agg(F.count(F.lit(1)).alias("n_trunc"))
    )
    return counts.crossJoin(overlap).select(
        "n_full",
        "n_trunc",
        "n_overlap",
        F.round(F.col("n_overlap").cast("double") / 10, 6).alias("recall_at_10"),
    )
