"""Extension queries, round 12: event-time interval-join attribution —
the batch twin of the stream-stream join in streaming/jobs.py
(interval_attribution_plan), rolled up per user. DuckDB-oracle-checked;
the streaming variant is asserted equal to this plan in
tests/test_streaming_interval_join.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table
from shortvideohybridanalyticslakehouse_spark.streaming.jobs import (
    interval_attribution_plan,
)

ATTRIBUTION_WINDOW_MIN = 10

_ATTRIBUTION_ORACLE = f"""
WITH c AS (
  SELECT user_id, event_id, ts FROM events
  WHERE event_type = 'click' AND ts IS NOT NULL
), p AS (
  SELECT user_id, event_id, ts, value FROM events
  WHERE event_type = 'purchase' AND ts IS NOT NULL
), pairs AS (
  SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
         p.value AS purchase_value,
         date_diff('second', c.ts, p.ts) AS latency_s
  FROM c JOIN p
    ON c.user_id = p.user_id
   AND p.ts >= c.ts
   AND p.ts <= c.ts + INTERVAL {ATTRIBUTION_WINDOW_MIN} MINUTE
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(DISTINCT purchase_id) AS BIGINT) AS n_purchases,
       CAST(sum(CAST(purchase_value AS DECIMAL(18,6))) AS DOUBLE)
         AS attributed_value,
       round(CAST(sum(latency_s) AS DOUBLE) / count(*), 4) AS avg_latency_s
FROM pairs GROUP BY user_id
"""


@register("attribution_interval_join", _ATTRIBUTION_ORACLE)
def q_attribution_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase attribution by event-time interval join (purchase
    within 10 minutes at-or-after a click by the same user), rolled up
    per user. SAME plan function as the streaming stream-stream join
    (streaming/jobs.py:interval_attribution_plan) run on batch inputs —
    one plan, two execution modes, which is the engine's core design
    stance. Unlike the as-of join (last-before, 1:1) or the funnel
    (global strict stages), the interval join is m:n within the window —
    the attribution/feature-window primitive. One shuffle per side on
    user_id; join state bounded by the interval.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    pairs = interval_attribution_plan(
        clicks, purchases, key="user_id", window_minutes=ATTRIBUTION_WINDOW_MIN
    )
    latency_s = (
        F.col("purchase_ts").cast("long") - F.col("click_ts").cast("long")
    )
    return pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("purchase_id").alias("n_purchases"),
        F.sum(F.col("purchase_value").cast("decimal(18,6)"))
        .cast("double")
        .alias("attributed_value"),
        F.round(F.sum(latency_s).cast("double") / F.count(F.lit(1)), 4).alias(
            "avg_latency_s"
        ),
    )


# ---------------------------------------------------------------------------
# Arrow-vectorized ANN brute force (same oracle as the HOF baseline)
# ---------------------------------------------------------------------------

from shortvideohybridanalyticslakehouse_spark.functions import similarity  # noqa: E402
from shortvideohybridanalyticslakehouse_spark.plans.queries_ext import (  # noqa: E402
    _COSINE_TOPK_ORACLE,
)


@register("embedding_cosine_topk_vectorized", _COSINE_TOPK_ORACLE)
def q_cosine_topk_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 via the Arrow/numpy mapInPandas path —
    hash-checked against the SAME DuckDB oracle as the higher-order-
    function baseline (embedding_cosine_topk), proving the two plans are
    interchangeable. The vectorized path wins when dims are wide or the
    per-row expression falls out of codegen (HOF lambdas are interpreted
    per element); the HOF path wins when Python workers are scarce.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").head()
    if qrow is None:  # fail loudly, not with an opaque TypeError
        raise ValueError(f"fixture has no query vector vec_id=0 under {sf_dir}")
    corpus = emb.filter(F.col("vec_id") != 0)
    return similarity.cosine_topk_vectorized(corpus, qrow[0], k=10)
