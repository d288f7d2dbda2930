"""Streaming ingest-time near-dup flagging against a winnowing
fingerprint store (round 7): the arrival-order twin of
plans/queries_ext95.winnowing_dup_pairs, for the dedup-on-ingest stage
of a corpus pipeline.

Contract: a document d is a near-dup iff some document d' with
doc_id < d.doc_id shares at least ``min_shared`` distinct winnowing
fingerprint hashes with it, where a hash counts as evidence only while
it appears in at most ``hot_cap`` docs seen so far (arrival-time cap —
the streaming-correct reading of the batch lane's whole-corpus cap: a
hash that later becomes hot was legitimate evidence when it was rare).
The store accumulates EVERY doc's fingerprints (not just accepted ones),
keyed by arrival batch (``fps/batch=N/`` — a batch writes only its own
partition, replay overwrites it idempotently), and within a batch
smaller-id docs count as "earlier" exactly as they would across batches
— so flags are SPLIT-INVARIANT wherever no contributing bucket crosses
the hot cap mid-stream (below the cap the predicate depends only on the
doc-id order, never on batch boundaries; tests pin this with two
different splits of the same stream).

Per-batch cost: batch-fps x store-fps equi-join on the fingerprint hash
(bucket-bounded by the hot cap) + the intra-batch smaller-id pair join.
The store-side scan grows with the corpus — the standard inverted-index
growth; at 100 TB the store becomes a bucketed table on the hash so the
probe join co-locates (plans/ddl.write_bucketed_table), and hot hashes
are already excluded by the cap before any pairing.

Verdicts land in ``flags/batch=N/`` (doc_id, is_dup, first_dup_of,
shared_fps) — replay-idempotent by the same own-partition-overwrite
rule as the edge store in streaming/graph.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from shortvideohybridanalyticslakehouse_spark.plans.queries_ext95 import (
    _HOT_HASH_CAP,
    _PAIR_MIN_SHARED,
    _POS_PACK,
    winnowing_fingerprints_df,
)


def _fps_dir(store: str) -> str:
    return os.path.join(store, "fps")


def _flags_dir(store: str) -> str:
    return os.path.join(store, "flags")


def doc_fingerprint_hashes(docs: DataFrame) -> DataFrame:
    """(doc_id, fph) distinct winnowing fingerprint hashes."""
    fps = winnowing_fingerprints_df(docs)
    return fps.select(
        "doc_id", (F.col("wmin") / _POS_PACK).cast("bigint").alias("fph")
    ).distinct()


def _read_fps_before(
    spark: SparkSession, store: str, batch_id: int
) -> DataFrame | None:
    path = _fps_dir(store)
    if not os.path.isdir(path) or not any(
        d.startswith("batch=") and int(d.split("=", 1)[1]) < batch_id
        for d in os.listdir(path)
    ):
        return None
    return (
        spark.read.parquet(path)
        .filter(F.col("batch") < batch_id)  # partition-pruned
        .select("doc_id", "fph")
    )


def flag_near_dups(
    batch_hashes: DataFrame, earlier_hashes: DataFrame | None
) -> DataFrame:
    """Per-doc verdict for a batch of fingerprint hashes against all
    earlier hashes (earlier batches UNION smaller ids within the batch):
    (doc_id, is_dup, first_dup_of, shared_fps)."""
    intra = batch_hashes.select(
        F.col("doc_id").alias("e_doc"), "fph"
    )
    earlier = (
        intra
        if earlier_hashes is None
        else earlier_hashes.select(
            F.col("doc_id").alias("e_doc"), "fph"
        ).unionByName(intra)
    )
    # hot-hash cap over the COMBINED view (same rule the batch lane
    # applies to the whole corpus)
    buck = (
        earlier.groupBy("fph")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") <= _HOT_HASH_CAP)
        .select("fph")
    )
    pairs = (
        batch_hashes.join(buck, "fph")
        .join(
            earlier.join(buck, "fph"),
            "fph",
        )
        .filter(F.col("e_doc") < F.col("doc_id"))
        .groupBy("doc_id", "e_doc")
        .agg(F.countDistinct("fph").alias("shared"))
        .filter(F.col("shared") >= _PAIR_MIN_SHARED)
    )
    best = pairs.groupBy("doc_id").agg(
        F.max(F.struct(F.col("shared"), (-F.col("e_doc")).alias("_neg"))).alias(
            "_b"
        )
    )
    verdict = best.select(
        "doc_id",
        F.lit(True).alias("is_dup"),
        (-F.col("_b._neg")).cast("bigint").alias("first_dup_of"),
        F.col("_b.shared").cast("bigint").alias("shared_fps"),
    )
    all_docs = batch_hashes.select("doc_id").distinct()
    return all_docs.join(verdict, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("is_dup"), F.lit(False)).alias("is_dup"),
        "first_dup_of",
        F.coalesce(F.col("shared_fps"), F.lit(0)).cast("bigint").alias(
            "shared_fps"
        ),
    )


def merge_winnow_batch(
    spark: SparkSession, batch_df: DataFrame, store: str, batch_id: int
) -> None:
    """foreachBatch body: fingerprint the batch, flag near-dups against
    every earlier doc, persist both (own-partition overwrites)."""
    hashes = doc_fingerprint_hashes(batch_df.select("doc_id", "text"))
    # own-partition write consumes every source partition (Spark 4 rule)
    # and makes replay idempotent
    hashes.withColumn("batch", F.lit(batch_id)).write.mode(
        "overwrite"
    ).parquet(os.path.join(_fps_dir(store), f"batch={batch_id}"))
    staged = os.path.join(_fps_dir(store), f"batch={batch_id}")
    if not any(f.endswith(".parquet") for f in os.listdir(staged)):
        return  # empty batch
    batch_hashes = spark.read.parquet(staged).select("doc_id", "fph")
    earlier = _read_fps_before(spark, store, batch_id)
    flags = flag_near_dups(batch_hashes, earlier)
    flags.write.mode("overwrite").parquet(
        os.path.join(_flags_dir(store), f"batch={batch_id}")
    )


def read_flags(spark: SparkSession, store: str) -> DataFrame:
    return spark.read.parquet(_flags_dir(store)).select(
        "doc_id", "is_dup", "first_dup_of", "shared_fps"
    )


def start_winnow_dedup_job(
    spark: SparkSession,
    source: DataFrame,
    store: str,
    checkpoint_dir: str,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Flag near-dups on a streaming (doc_id, text) frame."""
    trigger = trigger or {"availableNow": True}

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        merge_winnow_batch(spark, batch_df, store, batch_id)

    return (
        source.writeStream.foreachBatch(fold)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**trigger)
        .start()
    )
