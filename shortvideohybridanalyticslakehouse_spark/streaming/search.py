"""Streaming search-index maintenance (round 7): the BM25 inverted
index as an incremental materialized view.

The entire Lucene-flavored BM25 state is derivable from ONE monoid MV —
the (doc_id, term) -> tf table (each doc arrives once, so per-key term
frequencies are additive across batches; DF, doc length, corpus size and
avgdl are all re-aggregations of it). The streaming side therefore
reuses streaming/mv.py verbatim: staged partials, bucketed store,
per-bucket markers, replay-idempotent. Query time reads the store and
scores exactly the ext50 batch formula (k1=1.2, b=0.75,
idf = ln(1 + (N - df + 0.5)/(df + 0.5))), so a search against the
streamed index EQUALS the batch pipeline over the same corpus — proven
by tests/test_stream_search_index.py.

Scale: the index grows as the corpus's distinct (doc, term) pairs; the
MV store is hash-bucketed on doc_id||term, a batch touches only its
buckets, and query-term scoring joins a broadcast O(|terms|) frame into
the postings — the same pruned shape as the batch lane.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from shortvideohybridanalyticslakehouse_spark.functions import text
from shortvideohybridanalyticslakehouse_spark.streaming.mv import (
    MvSpec,
    counting,
    merge_mv_batch,
    read_mv,
)

_K1 = 1.2
_B = 0.75


def tf_spec() -> MvSpec:
    return MvSpec(key_cols=("doc_id", "term"), measures=(counting("tf"),))


def token_rows(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", F.explode(text.tokens(F.col("text"))).alias("term")
    )


def merge_index_batch(
    spark: SparkSession, batch_df: DataFrame, store: str, batch_id: int
) -> None:
    merge_mv_batch(spark, token_rows(batch_df), store, batch_id, tf_spec())


def read_index(spark: SparkSession, store: str) -> DataFrame:
    return read_mv(spark, store, tf_spec())


def bm25_score_terms(
    tf: DataFrame, terms: list[str], k: int = 10
) -> DataFrame:
    """Top-k docs for a bag of query terms against a (doc_id, term, tf)
    frame — identical arithmetic to the ext50 batch lane, shared by the
    streamed-index and batch paths so they cannot drift."""
    spark = tf.sparkSession
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dlen"))
    stats = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    consts = (
        dl.agg(
            F.count(F.lit(1)).cast("double").alias("n_docs"),
            (F.sum("dlen").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        )
    )
    qterms = spark.createDataFrame([(t,) for t in terms], "term string")
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_part = (F.col("tf") * (_K1 + 1.0)) / (
        F.col("tf") + _K1 * (1.0 - _B + _B * F.col("dlen") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .join(stats, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(consts))
        .groupBy("doc_id")
        .agg(
            F.sum(idf * tf_part).alias("score"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
    )
    return (
        scored.select(
            "doc_id",
            F.round("score", 6).alias("bm25"),
            "n_terms_hit",
        )
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(k)
    )


def start_index_job(
    spark: SparkSession,
    source: DataFrame,
    store: str,
    checkpoint_dir: str,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Maintain the BM25 TF index over a streaming (doc_id, text) frame."""
    trigger = trigger or {"availableNow": True}

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        merge_index_batch(spark, batch_df, store, batch_id)

    return (
        source.writeStream.foreachBatch(fold)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**trigger)
        .start()
    )
