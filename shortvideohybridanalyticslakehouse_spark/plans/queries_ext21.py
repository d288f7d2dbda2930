"""Extension queries, round 21: bitmap-mergeable EXACT distinct counts
(the exactness-preserving alternative to HLL re-aggregation), an
embedding sparsity profile on array higher-order functions, and
bool_and/bool_or behavioral flags.

The bitmap query is the interesting one architecturally: Spark computes
weekly distincts by OR-merging per-day roaring-style bitmaps (never
rescanning raw events), while the DuckDB oracle computes plain
COUNT(DISTINCT …) — the hash match proves the merge path is EXACT, not
approximate, which no sketch can claim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

# ---------------------------------------------------------------------------
# Bitmap-merged exact weekly distincts
# ---------------------------------------------------------------------------

# Per (week, day, bucket): one bitmap of the user ids that hashed into
# that 32k-bit bucket. Weekly merge = bitmap_or_agg per bucket, then
# sum of set bits — associative, partial-aggregatable, EXACT. State per
# day is O(active-id-range/8) bytes instead of the raw id list; the
# oracle needs none of this machinery, which is the point.
_BITMAP_ORACLE = """
SELECT
  CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_weekly_users
FROM events GROUP BY 1
"""


@register("weekly_bitmap_exact_distinct", _BITMAP_ORACLE)
def q_weekly_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT weekly distinct users via mergeable bitmaps: day-grain
    bitmaps (bitmap_construct_agg per 32k-id bucket) OR-merge into
    weeks without touching raw events twice. The DuckDB twin is plain
    COUNT(DISTINCT) — hash equality proves the bitmap path loses
    nothing (contrast weekly_hll_union_estimate, ±0.8%).
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("week", F.col("ts")).alias("week"),
        F.date_trunc("day", F.col("ts")).alias("day"),
        "user_id",
    )
    daily = ev.groupBy(
        "week", "day", F.bitmap_bucket_number(F.col("user_id")).alias("bucket")
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position(F.col("user_id"))).alias(
            "bm"
        )
    )
    weekly = daily.groupBy("week", "bucket").agg(
        F.bitmap_count(F.bitmap_or_agg(F.col("bm"))).alias("n_bucket")
    )
    return weekly.groupBy("week").agg(
        F.sum("n_bucket").cast("bigint").alias("exact_weekly_users")
    )


# ---------------------------------------------------------------------------
# Embedding sparsity profile (array higher-order functions)
# ---------------------------------------------------------------------------

# filter/exists/aggregate run INSIDE the row — no explode, no shuffle
# until the tiny per-label agg. Near-zero threshold 0.1; "has an
# extreme dim" threshold 2.0.
_SPARSITY_ORACLE = """
SELECT
  label,
  CAST(count(*) AS BIGINT) AS n_vecs,
  round(CAST(sum(len(list_filter(embedding, x -> abs(CAST(x AS DOUBLE)) < 0.1)))
             AS DOUBLE) / CAST(sum(len(embedding)) AS DOUBLE), 6)
    AS near_zero_frac,
  CAST(count(*) FILTER (
    WHERE len(list_filter(embedding, x -> abs(CAST(x AS DOUBLE)) > 2.0)) > 0
  ) AS BIGINT) AS n_with_extreme_dim
FROM embeddings GROUP BY label
"""


@register("embedding_sparsity_profile", _SPARSITY_ORACLE)
def q_embedding_sparsity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label sparsity diagnostics: fraction of near-zero dimensions
    and count of vectors containing an extreme dimension — array
    filter/exists higher-order functions, all in-row until a per-label
    rollup (quantization-readiness audit for an embedding corpus).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    near_zero = F.size(
        F.filter(F.col("embedding"), lambda x: F.abs(x.cast("double")) < 0.1)
    )
    has_extreme = F.exists(
        F.col("embedding"), lambda x: F.abs(x.cast("double")) > 2.0
    )
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(
            F.sum(near_zero).cast("double")
            / F.sum(F.size(F.col("embedding"))).cast("double"),
            6,
        ).alias("near_zero_frac"),
        F.count(F.when(has_extreme, 1)).alias("n_with_extreme_dim"),
    )


# ---------------------------------------------------------------------------
# bool_and / bool_or behavioral flags
# ---------------------------------------------------------------------------

_BOOL_ORACLE = """
SELECT
  user_id,
  bool_and(value >= 0) AS all_nonneg,
  bool_or(event_type = 'purchase') AS ever_purchased,
  bool_and(event_type <> 'error') AS error_free
FROM events
WHERE value IS NOT NULL
GROUP BY user_id
"""


@register("user_behavior_flags", _BOOL_ORACLE)
def q_user_behavior_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user boolean rollups (bool_and/bool_or): universal and
    existential facts as single map-side-combinable aggregates instead
    of count-comparison circumlocutions.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return ev.groupBy("user_id").agg(
        F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
        F.bool_or(F.col("event_type") == "purchase").alias("ever_purchased"),
        F.bool_and(F.col("event_type") != "error").alias("error_free"),
    )
