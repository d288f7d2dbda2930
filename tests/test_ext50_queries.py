"""Round-50 extension: BM25 ranked retrieval semantics."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()
SF = "/root/testdata/sf0.001"


def _write_docs(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id",
        "text",
        F.lit("en").alias("lang"),
        F.lit("src").alias("source"),
    )
    d = tempfile.mkdtemp()
    docs.write.mode("overwrite").parquet(d + "/documents.parquet")
    return d


def test_bm25_shape_and_ordering(spark):
    fn, _ = REGISTRY["bm25_topk_search"]
    rows = fn(spark, SF).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
    assert set(per_q) == {0, 1, 2, 3, 4}
    for q, rs in per_q.items():
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 10
        scores = [r.bm25 for r in rs]
        assert scores == sorted(scores, reverse=True)
        assert all(1 <= r.n_terms_hit <= 3 for r in rs)
        assert all(r.bm25 > 0 for r in rs)


def test_bm25_analytic_replay_tiny_corpus(spark):
    """Planted two-term corpus, scores replayed analytically: the single
    derived query is {b, apple} (only two distinct terms exist), and the
    hand-computed Lucene BM25 must match to the rounded 6 decimals —
    which also pins the semantic ordering: doc 1 (tf(apple)=2) beats
    doc 2 (tf=1, same length) beats doc 3 (tf=1 but 26 tokens: the
    b-weighted length normalization penalty)."""
    import math

    fn, _ = REGISTRY["bm25_topk_search"]
    rows = [
        (1, "apple apple b b b b"),
        (2, "apple b b b b b"),
        (3, "apple " + " ".join(["b"] * 25)),
        (4, "b b b b b b"),
        (5, "b b b b b b"),
    ]
    d = _write_docs(spark, rows)
    out = {r.doc_id: r for r in fn(spark, d).collect()}
    assert all(r.query_id == 0 for r in out.values())

    k1, b = 1.2, 0.75
    n, avgdl = 5.0, (6 + 6 + 26 + 6 + 6) / 5.0
    tf_apple = {1: 2, 2: 1, 3: 1}
    tf_b = {1: 4, 2: 5, 3: 25, 4: 6, 5: 6}
    dlen = {1: 6, 2: 6, 3: 26, 4: 6, 5: 6}

    def part(tf, df, dl):
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    for doc in (1, 2, 3, 4, 5):
        exp = part(tf_b[doc], 5, dlen[doc])
        if doc in tf_apple:
            exp += part(tf_apple[doc], 3, dlen[doc])
        assert out[doc].bm25 == round(exp, 6), doc
        assert out[doc].n_terms_hit == (2 if doc in tf_apple else 1)
    # semantic ordering through the apple differential (doc 1 vs 2) and
    # the length normalization (doc 2 vs 3, equal apple TF)
    a1 = part(2, 3, 6)
    a2 = part(1, 3, 6)
    a3 = part(1, 3, 26)
    assert a1 > a2 > a3
