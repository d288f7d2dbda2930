"""Incremental SCD2 band maintenance over a CDC change stream (VERDICT
r5 #6): the streaming twin of plans/queries_ext54.scd2_bands.

Each micro-batch of change events (user_id, ts, event_id, state) merges
into a parquet dimension table of validity bands:

1. CLOSED bands (valid_to not null) are immutable — carried through.
2. OPEN bands re-enter the band builder as pseudo-change events at their
   valid_from with event_id = -1 (sorts before any real event at the
   same instant), unioned with the batch's events.
3. The SHARED batch builder (scd2_bands) recomputes bands over that
   union — so a batch whose first state matches a user's open band
   collapses into it (true SCD2: only CHANGES open versions), a new
   state closes the open band at the new valid_from, and multi-change
   batches produce every intermediate closed band.
4. The table is atomically replaced (tmp dir + rename, the
   _merge_overwrite idiom) with a per-batch marker file INSIDE the new
   table dir, making replay after crash/restart exactly-once: a replayed
   batch sees its own marker in the committed table and skips (markers
   ride the same rename as the data — no torn window).

Ordering contract: the CDC transport delivers each user's changes in
event-time order across micro-batches (Kafka keyed-by-user partitions,
or the file-source fixture with pinned mtimes). Late cross-batch data is
the upstream watermark layer's job, same as the reference's CDC upsert
(src/spark/rt_video_cdc_upsert_sql.py ordering contract).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from shortvideohybridanalyticslakehouse_spark.plans.queries_ext54 import scd2_bands

_CHANGE_COLS = ["user_id", "ts", "event_id", "state"]


def _applied_marker(table_path: str, batch_id: int) -> str:
    # underscore prefix: parquet readers ignore it as a data file
    return os.path.join(table_path, f"_applied_batch_{batch_id}")


def merge_scd2_batch(
    spark: SparkSession, batch_df: DataFrame, table_path: str, batch_id: int
) -> None:
    """foreachBatch body: merge one micro-batch of changes into the band
    table. Consumes every partition before the idempotent-skip check
    (Spark 4 state-store commit rule), recomputes open bands through the
    shared builder, and swaps the table atomically with the batch marker
    inside it."""
    rows = batch_df.collect()
    if os.path.exists(_applied_marker(table_path, batch_id)):
        return  # replayed batch already committed (marker rode the rename)
    if not rows:
        return
    batch = spark.createDataFrame(rows, batch_df.schema).select(*_CHANGE_COLS)

    closed = None
    if os.path.isdir(table_path):
        cur = spark.read.parquet(table_path)
        closed = cur.filter(F.col("valid_to").isNotNull())
        open_rows = cur.filter(F.col("valid_to").isNull())
        pseudo = open_rows.select(
            "user_id",
            F.col("valid_from").alias("ts"),
            F.lit(-1).cast("long").alias("event_id"),
            "state",
        )
        changes = pseudo.unionByName(batch)
    else:
        changes = batch
    bands = scd2_bands(changes)
    out = bands if closed is None else closed.unionByName(bands)

    tmp = table_path + "._tmp"
    old = table_path + "._old"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    out.write.mode("overwrite").parquet(tmp)
    # markers: every previously applied batch's plus this one's, written
    # into the tmp dir BEFORE the rename so idempotence commits atomically
    # with the data
    if os.path.isdir(table_path):
        for f in os.listdir(table_path):
            if f.startswith("_applied_batch_"):
                open_path = os.path.join(tmp, f)
                with open(open_path, "w"):
                    pass
    with open(_applied_marker(tmp, batch_id), "w"):
        pass
    if os.path.isdir(table_path):
        os.rename(table_path, old)
    os.rename(tmp, table_path)
    shutil.rmtree(old, ignore_errors=True)


def start_scd2_band_job(
    spark: SparkSession,
    source: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Run the SCD2 band maintainer over a streaming change frame
    (user_id, ts, event_id, state)."""
    trigger = trigger or {"availableNow": True}

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        merge_scd2_batch(spark, batch_df, table_path, batch_id)

    return (
        source.select(*_CHANGE_COLS)
        .writeStream.foreachBatch(upsert)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**trigger)
        .start()
    )
