"""Extension queries, round 22: sliding-window EXACT distinct users via
bitmap re-aggregation — the report-serving pattern where every output
day re-uses the same 7 daily bitmaps instead of rescanning a week of
raw events.

Cost shape: daily bitmaps are built ONCE (one pass over events), then
each contributes to 7 output days by exploding a 7-element offset
array — O(days × buckets × 7) tiny bitmap rows into the merge, vs the
naive plan's O(events × 7) row replication. The DuckDB oracle is the
naive plan (range-joined COUNT DISTINCT), so the hash match certifies
the optimization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_SLIDING_ORACLE = """
WITH days AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day FROM events
)
SELECT
  d.day,
  CAST(count(DISTINCT e.user_id) AS BIGINT) AS users_7d
FROM days d
JOIN events e
  ON e.ts >= d.day - INTERVAL '6' DAY
 AND e.ts < d.day + INTERVAL '1' DAY
GROUP BY d.day
"""


@register("sliding_7d_exact_distinct_users", _SLIDING_ORACLE)
def q_sliding_7d_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day exact distinct users for every active day. Daily
    bucket bitmaps are built once and fanned out to the ≤7 window ends
    they serve (sequence+explode on DAY grain), then OR-merged per
    output day — events are scanned exactly once however long the
    window. Output days with no OWN events are excluded to match the
    oracle's active-day spine.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
    )
    daily = ev.groupBy(
        "day", F.bitmap_bucket_number(F.col("user_id")).alias("bucket")
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position(F.col("user_id"))).alias("bm")
    )
    # fan each day's bitmap out to the window-end days it participates in
    contrib = daily.select(
        F.explode(
            F.sequence(
                F.col("day"), F.col("day") + F.expr("INTERVAL 6 DAYS"), F.expr("INTERVAL 1 DAY")
            )
        ).alias("end_day"),
        "bucket",
        "bm",
    )
    active_days = daily.select(F.col("day").alias("end_day")).distinct()
    merged = (
        contrib.join(active_days, "end_day")  # only days that exist in data
        .groupBy("end_day", "bucket")
        .agg(F.bitmap_count(F.bitmap_or_agg(F.col("bm"))).alias("n_bucket"))
    )
    return merged.groupBy(F.col("end_day").alias("day")).agg(
        F.sum("n_bucket").cast("bigint").alias("users_7d")
    )
