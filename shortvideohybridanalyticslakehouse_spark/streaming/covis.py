"""Streaming co-visitation maintenance (round 7): the recommender's
candidate table kept current from a live event stream, composing three
engine pieces that already carry proofs —

  1. T9 session windows: ``session_window`` + watermark in APPEND mode
     emits each (user, session) item set exactly once, when the
     watermark closes it;
  2. closed sessions make co-visitation ADDITIVE: a closed session's
     item pairs never change, so per-pair co-session counts are a
     monoid over closed sessions;
  3. the generic MV store (streaming/mv.py) therefore maintains the
     (item_a, item_b) -> co count table with its staged, bucketed,
     replay-idempotent machinery — and top-k recommendations read
     straight off it.

Per-batch cost: pairs of the batch's CLOSED sessions only (bounded by
the ext106 session-item cap) + touched MV buckets. stream == batch:
counts over the closed-session set equal the batch pair aggregation of
the same sessions — proven by tests/test_stream_covis.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from shortvideohybridanalyticslakehouse_spark.streaming.mv import (
    MvSpec,
    counting,
    merge_mv_batch,
    read_mv,
)

MAX_SESSION_ITEMS = 32


def covis_spec() -> MvSpec:
    return MvSpec(
        key_cols=("item_a", "item_b"), measures=(counting("co_sessions"),)
    )


def closed_session_items(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 minutes"
) -> DataFrame:
    """Streaming (user_id, session start, item set) — append mode emits
    each session once, on close. ``events`` needs user_id, ts, item."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.collect_set("item").alias("items"))
        .select("user_id", F.col("w.start").alias("session_start"), "items")
    )


def session_pairs(sessions: DataFrame) -> DataFrame:
    """Explode a closed session's item set into canonical (a < b) pairs,
    capped at MAX_SESSION_ITEMS items per session (the ext106 guard).

    Pairs come from an array-HOF combination over the sorted item set —
    ONE projection, no self-join — so a stateful micro-batch frame is
    scanned exactly once per action (Spark 4 state-store commit
    sensitivity; the scd2/mv stage-first rule's stronger cousin)."""
    bounded = sessions.filter(F.size("items") <= MAX_SESSION_ITEMS)
    return bounded.select(
        F.explode(
            F.expr(
                "flatten(transform(array_sort(items), (x, i) ->"
                " transform(slice(array_sort(items), i + 2, size(items)),"
                " y -> struct(x AS item_a, y AS item_b))))"
            )
        ).alias("p")
    ).select("p.item_a", "p.item_b")


def merge_covis_batch(
    spark: SparkSession, closed_batch: DataFrame, store: str, batch_id: int
) -> None:
    merge_mv_batch(
        spark, session_pairs(closed_batch), store, batch_id, covis_spec()
    )


def read_covis(spark: SparkSession, store: str) -> DataFrame:
    return read_mv(spark, store, covis_spec())


def top_recs(covis: DataFrame, k: int = 3) -> DataFrame:
    """Per-item top-k recommendations off the maintained counts."""
    from pyspark.sql import Window

    directed = covis.select(
        F.col("item_a").alias("item"),
        F.col("item_b").alias("rec"),
        "co_sessions",
    ).unionByName(
        covis.select(
            F.col("item_b").alias("item"),
            F.col("item_a").alias("rec"),
            "co_sessions",
        )
    )
    w = Window.partitionBy("item").orderBy(F.desc("co_sessions"), F.asc("rec"))
    return (
        directed.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("item", "rnk", "rec", "co_sessions")
    )


def start_covis_job(
    spark: SparkSession,
    events: DataFrame,
    store: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "2 minutes",
    trigger: dict | None = None,
) -> StreamingQuery:
    """events: streaming frame with user_id, ts, item."""
    trigger = trigger or {"availableNow": True}
    closed = closed_session_items(events, gap=gap, watermark=watermark)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        merge_covis_batch(spark, batch_df, store, batch_id)

    return (
        closed.writeStream.foreachBatch(fold)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**trigger)
        .start()
    )
