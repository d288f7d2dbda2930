"""Boundary test for doc_unigram_logprob: hand-computed bits on a tiny
corpus with a known unigram distribution."""

from __future__ import annotations

import math

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_unigram_bits_closed_form(spark, tmp_path):
    # corpus: "a a a b" -> p(a)=3/4, p(b)=1/4
    # doc 1 = "a a a": bits/token = -log2(3/4)
    # doc 2 = "b":     bits/token = -log2(1/4) = 2
    rows = [
        (1, "a a a", "en", "s1", 5),
        (2, "b", "en", "s2", 1),
        (3, "   ", "en", "s3", 3),  # whitespace-only: excluded entirely
    ]
    spark.createDataFrame(rows, DOC_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    fn, _ = REGISTRY["doc_unigram_logprob"]
    got = {r["source"]: r for r in fn(spark, str(tmp_path)).collect()}
    assert set(got) == {"s1", "s2"}
    assert got["s1"]["avg_bits_per_token"] == round(-math.log2(3 / 4), 6)
    assert got["s2"]["avg_bits_per_token"] == 2.0
    assert got["s2"]["n_surprising"] == 0  # 2 bits < 8-bit threshold
