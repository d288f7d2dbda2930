"""Streamed BM25 index == batch pipeline: a search against the
incrementally-maintained TF materialized view must return EXACTLY the
batch scores over the same corpus, for any arrival split, with
replay-idempotent batches."""

from __future__ import annotations

import os
import time

from shortvideohybridanalyticslakehouse_spark.streaming.search import (
    bm25_score_terms,
    merge_index_batch,
    read_index,
    start_index_job,
    token_rows,
    tf_spec,
)

_SCHEMA = "doc_id long, text string"

_DOCS = [
    (1, "spark shuffles data between stages when keys move"),
    (2, "adaptive query execution replans shuffles at runtime"),
    (3, "the catalyst optimizer prunes columns and pushes filters"),
    (4, "broadcast joins avoid shuffles for small dimension tables"),
    (5, "window functions sort within partitions after one shuffle"),
    (6, "spark spark spark repeated terms raise term frequency"),
    (7, "completely unrelated cooking recipe with garlic and basil"),
    (8, "filters and columns and shuffles appear here together spark"),
]

_QUERY = ["spark", "shuffles", "filters"]


def _batch_topk(spark):
    df = spark.createDataFrame(_DOCS, _SCHEMA)
    tf = tf_spec().partials(token_rows(df))
    return [
        (r.doc_id, r.bm25, r.n_terms_hit)
        for r in bm25_score_terms(tf, _QUERY, k=5).collect()
    ]


def test_streamed_index_search_equals_batch(spark, tmp_path):
    src = os.path.join(str(tmp_path), "in")
    os.makedirs(src)
    t0 = time.time() - 600
    splits = [_DOCS[:3], _DOCS[3:5], _DOCS[5:]]
    for i, chunk in enumerate(splits):
        p = os.path.join(src, f"d{i:04d}.csv")
        with open(p, "w") as f:
            for d, t in chunk:
                f.write(f'{d},"{t}"\n')
        os.utime(p, (t0 + i, t0 + i))
    store = os.path.join(str(tmp_path), "bm25_idx")
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("quote", '"')
        .csv(src)
    )
    q = start_index_job(
        spark, stream, store, os.path.join(str(tmp_path), "ckpt")
    )
    q.awaitTermination(120)

    got = [
        (r.doc_id, r.bm25, r.n_terms_hit)
        for r in bm25_score_terms(read_index(spark, store), _QUERY, k=5).collect()
    ]
    want = _batch_topk(spark)
    assert got == want  # scores bit-equal: same frame, same arithmetic
    assert len(got) == 5 and got[0][2] >= 2  # top hit matches >= 2 terms


def test_index_replay_idempotent(spark, tmp_path):
    store = os.path.join(str(tmp_path), "bm25_idx")
    chunks = [_DOCS[:4], _DOCS[4:]]
    for i, chunk in enumerate(chunks):
        merge_index_batch(
            spark, spark.createDataFrame(chunk, _SCHEMA), store, i
        )
    before = sorted(
        (r.doc_id, r.term, r.tf) for r in read_index(spark, store).collect()
    )
    merge_index_batch(  # crash-replay batch 0
        spark, spark.createDataFrame(chunks[0], _SCHEMA), store, 0
    )
    after = sorted(
        (r.doc_id, r.term, r.tf) for r in read_index(spark, store).collect()
    )
    assert after == before
