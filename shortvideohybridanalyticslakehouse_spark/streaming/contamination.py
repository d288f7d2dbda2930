"""Streaming benchmark-contamination firewall: incoming candidate docs
(a stream) checked against a STATIC train-shingle index — the online
form of plans/queries_ext133.shingle_contamination_audit. New eval/test
documents arrive continuously; any doc sharing one verbatim 8-token
shingle with the frozen train corpus is flagged before it can enter an
eval set.

Spark-first shape: a stream-static equi-join (Structured Streaming
joins each micro-batch against the static side with full Catalyst
planning — the static shingle index is just a DataFrame, broadcast or
shuffled by size), followed by a streaming dropDuplicates on doc_id so
a doc flagged by several shingles emits once. State is the dedup set
only — O(flagged docs), not O(shingles).

At 100 TB the static side is a bucketed parquet shingle index
(hash-partitioned on the shingle, so the per-batch join co-locates);
the fixture-scale test drives the same plan through files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHINGLE_N = 8


def doc_shingles(docs: DataFrame, n: int = SHINGLE_N) -> DataFrame:
    """(doc_id, source, shingle) — n-token shingles of the normalized
    text; single-space split, the ext133 tokenization contract."""
    text = F.trim(F.lower(F.coalesce(F.col("text"), F.lit(""))))
    toks = docs.filter(F.length(text) > 0).select(
        "doc_id", "source", F.split(text, " ", -1).alias("ts")
    )
    return toks.filter(F.size("ts") >= n).select(
        "doc_id",
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ts") - (n - 1)),
                lambda i: F.array_join(F.slice(F.col("ts"), i, n), " "),
            )
        ).alias("shingle"),
    )


def train_shingle_index(train_docs: DataFrame, n: int = SHINGLE_N) -> DataFrame:
    """Distinct train shingles — the static side of the firewall."""
    return doc_shingles(train_docs, n).select("shingle").distinct()


def contamination_firewall(
    stream_docs: DataFrame, train_index: DataFrame, n: int = SHINGLE_N
) -> DataFrame:
    """Streaming (doc_id, source) of contaminated incoming docs.

    ``stream_docs`` is a streaming DataFrame with (doc_id, source,
    text); ``train_index`` is the STATIC distinct-shingle frame. The
    stream-static join runs per micro-batch; dropDuplicates keeps one
    emission per doc across batches (doc ids are the stream's key)."""
    flagged = (
        doc_shingles(stream_docs, n)
        .join(train_index, "shingle")
        .select("doc_id", "source")
    )
    return flagged.dropDuplicates(["doc_id"])


def write_shingle_index_bucketed(
    train_docs, table_name: str, n_buckets: int = 16, n: int = SHINGLE_N
) -> None:
    """Persist the train shingle index as a BUCKETED, sorted table —
    the 100 TB layout for the firewall: bucketed+sorted by ``shingle``,
    so every per-micro-batch probe joins it WITHOUT shuffling or
    re-sorting the (huge, frozen) index side. Spark plans the join as a
    SortMergeJoin whose index leg has no Exchange and no Sort — the
    layout provides both (asserted in
    tests/test_stream_contamination_twin.py)."""
    from shortvideohybridanalyticslakehouse_spark.plans.ddl import (
        write_bucketed_sorted_table,
    )

    # sort_cols excludes the key — the helper emits sortBy(key, *cols)
    write_bucketed_sorted_table(
        train_shingle_index(train_docs, n),
        table_name,
        "shingle",
        [],
        n_buckets=n_buckets,
    )


def contamination_firewall_bucketed(
    stream_docs: DataFrame, spark, table_name: str, n: int = SHINGLE_N
) -> DataFrame:
    """contamination_firewall against the bucketed on-disk index: the
    static leg reads the bucketed table (exchange-free, pre-sorted);
    only the micro-batch's shingles shuffle."""
    index = spark.table(table_name)
    flagged = (
        doc_shingles(stream_docs, n)
        # merge pin: the index is a volume build side (the measured OOM
        # class from tools/SKEW_PROBE_SHJ.json) and the bucketed layout
        # makes its SMJ leg exchange- and sort-free
        .join(index.hint("merge"), "shingle")
        .select("doc_id", "source")
    )
    return flagged.dropDuplicates(["doc_id"])
