"""State-store READER: offline introspection of streaming state via Spark 4's
`statestore` / `state-metadata` DataFrame sources.

Why it matters at scale: a long-lived streaming job's state is the one
dataset you cannot re-derive by replaying a day of traffic. The state
reader turns every checkpoint into a queryable table — audit how many keys
a dedup operator holds, find the skewed watermark partitions, export state
for a migration — all with ordinary DataFrame queries against the
checkpoint directory, no running query required.

Reference analog: the reference operates its streaming jobs blind between
checkpoints (rt_content_events_aggregator.py has no state surface at all);
this is a beyond-reference operability layer built on the public Spark 4
State Data Source (SPARK-45511).

All functions are thin, typed wrappers: the heavy lifting (snapshot
reconstruction from changelogs, RocksDB vs HDFS formats) is the data
source's; our value is the contract — stable column selection and the
per-operator entry points the tests pin.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def state_metadata(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    """One row per stateful operator in the checkpoint: operator id/name,
    partition counts, and the min/max batch ids whose state survives.
    The discovery entry point — run this first, feed its operatorId into
    :func:`state_rows`."""
    return (
        spark.read.format("state-metadata")
        .load(checkpoint_dir)
        .select(
            "operatorId",
            "operatorName",
            "stateStoreName",
            "numPartitions",
            "minBatchId",
            "maxBatchId",
        )
        .orderBy("operatorId")
    )


def state_rows(
    spark: SparkSession,
    checkpoint_dir: str,
    operator_id: int = 0,
    batch_id: int | None = None,
    store_name: str | None = None,
) -> DataFrame:
    """Raw (key, value, partition_id) state rows of one operator — the
    latest committed batch by default, or `snapshotStartBatchId`-style time
    travel when ``batch_id`` is given."""
    reader = (
        spark.read.format("statestore")
        .option("operatorId", operator_id)
    )
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    if store_name is not None:
        reader = reader.option("storeName", store_name)
    return reader.load(checkpoint_dir)


def dedup_state_keys(
    spark: SparkSession, checkpoint_dir: str, operator_id: int = 0
) -> DataFrame:
    """The key set a streaming dedup currently retains (one row per live
    key): what you audit when deciding whether a watermark actually bounds
    the operator — `soak_state_bounded` in tools/acceptance.py is the
    aggregate twin of this row-level view."""
    rows = state_rows(spark, checkpoint_dir, operator_id)
    key_fields = rows.select("key.*").columns
    return rows.select(
        F.col("partition_id"),
        *[F.col(f"key.{f}").alias(f) for f in key_fields],
    )


def state_key_skew(
    spark: SparkSession, checkpoint_dir: str, operator_id: int = 0
) -> DataFrame:
    """Per-partition state-row counts for one operator, descending — the
    first thing to read when one task of a stateful stage lags: a fat
    partition here is key skew in the stream's grouping column."""
    return (
        state_rows(spark, checkpoint_dir, operator_id)
        .groupBy("partition_id")
        .agg(F.count(F.lit(1)).alias("n_state_rows"))
        .orderBy(F.col("n_state_rows").desc(), F.col("partition_id").asc())
    )


def checkpoint_operators(spark: SparkSession, checkpoint_dir: str) -> list[dict]:
    """Driver-side convenience: the state-metadata table as a bounded list
    of dicts (operator inventory is O(operators), never large)."""
    return [r.asDict() for r in state_metadata(spark, checkpoint_dir).collect()]


def export_state(
    spark: SparkSession,
    checkpoint_dir: str,
    out_dir: str,
    operator_id: int = 0,
) -> str:
    """Export one operator's live state to parquet (flattened key/value
    structs) — the migration path when a query must restart with a new
    shuffle partition count or state schema: export, transform, seed.
    Returns the output path."""
    rows = state_rows(spark, checkpoint_dir, operator_id)
    key_fields = rows.select("key.*").columns
    val_fields = rows.select("value.*").columns
    flat = rows.select(
        "partition_id",
        *[F.col(f"key.{f}").alias(f"key_{f}") for f in key_fields],
        *[F.col(f"value.{f}").alias(f"value_{f}") for f in val_fields],
    )
    path = os.path.join(out_dir, f"state_op{operator_id}")
    flat.write.mode("overwrite").parquet(path)
    return path
