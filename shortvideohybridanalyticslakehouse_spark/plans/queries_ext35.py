"""Extension queries, round 35: batched multi-query ANN — the production
search shape (one corpus pass amortized over a query set), motivated by
the scale-probe finding in PLANS.md that single-query Arrow scoring loses
to the JVM fold on transfer cost alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions import similarity
from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_COS = (
    "round(list_sum(list_transform(range(1, 65), "
    "i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))) "
    "/ (sqrt(list_sum(list_transform(range(1, 65), "
    "i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))) "
    "* sqrt(list_sum(list_transform(range(1, 65), "
    "i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))))), 6)"
)

_BATCH_TOPK_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 8
), scored AS (
  SELECT q.query_id, e.vec_id, {_COS} AS cosine_sim
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
)
SELECT query_id, vec_id, cosine_sim FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id ASC) AS rn
  FROM scored)
WHERE rn <= 10
ORDER BY query_id ASC, cosine_sim DESC, vec_id ASC
"""


@register("embedding_batch_topk", _BATCH_TOPK_ORACLE)
def q_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched exact ANN: top-10 neighbors for the 8 lowest-id vectors in
    ONE corpus pass (numpy GEMM per Arrow batch against the whole query
    block, local top-10 per query per batch, tiny per-query window
    global). See similarity.cosine_topk_batch.
    """
    emb = load_table(spark, sf_dir, "embeddings", ensure_parallelism=True)
    qrows = (
        emb.filter(F.col("vec_id") < 8)
        .select("vec_id", F.col("embedding").cast("array<double>"))
        .orderBy("vec_id")
        .collect()
    )
    if not qrows:  # fail loudly, not with an empty silent result
        raise ValueError(f"fixture has no query vectors vec_id<8 under {sf_dir}")
    queries = [(r[0], list(r[1])) for r in qrows]
    return similarity.cosine_topk_batch(emb, queries, k=10)


# ---------------------------------------------------------------------------
# Unconverted clicks: the LEFT OUTER channel of the stream-stream join
# ---------------------------------------------------------------------------

from shortvideohybridanalyticslakehouse_spark.streaming.jobs import (  # noqa: E402
    interval_attribution_plan,
)

_UNCONVERTED_ORACLE = """
WITH c AS (
  SELECT user_id, event_id, ts FROM events
  WHERE event_type = 'click' AND ts IS NOT NULL
), p AS (
  SELECT user_id, ts FROM events
  WHERE event_type = 'purchase' AND ts IS NOT NULL
)
SELECT c.user_id, CAST(count(*) AS BIGINT) AS unconverted_clicks
FROM c
WHERE NOT EXISTS (
  SELECT 1 FROM p
  WHERE p.user_id = c.user_id
    AND p.ts >= c.ts
    AND p.ts <= c.ts + INTERVAL 10 MINUTE)
GROUP BY 1 ORDER BY c.user_id
"""


@register("attribution_unconverted_clicks", _UNCONVERTED_ORACLE)
def q_unconverted_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unconverted clicks per user: the LEFT OUTER arm of the stream-stream
    interval join (streaming/jobs.py:interval_attribution_plan with
    how='left_outer'), filtered to the null-extended rows — each is a
    click the engine PROVED unconvertible within its 10-minute window.
    Same plan function as the streaming job (where the null row emits
    only once both watermarks pass click_ts + window — asserted in
    tests/test_streaming_interval_join.py); the batch oracle is the
    equivalent NOT EXISTS.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    pairs = interval_attribution_plan(
        clicks, purchases, key="user_id", window_minutes=10, how="left_outer"
    )
    return (
        pairs.filter(F.col("purchase_id").isNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("unconverted_clicks"))
        .orderBy("user_id")
    )
