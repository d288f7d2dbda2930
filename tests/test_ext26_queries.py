"""Boundary tests for queries_ext26: PII detection/redaction arithmetic
and repetition-fraction edges (planted fixtures — the synthetic corpus
contains no PII and near-uniform repetition)."""

from __future__ import annotations

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _write(spark, tmp_path, rows):
    spark.createDataFrame(rows, DOC_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )


def test_pii_detection_and_redaction_delta(spark, tmp_path):
    text = "contact bob@example.com or 10.0.0.1 via https://x.io/a?b=1"
    rows = [
        (1, text, "en", "s1", len(text)),
        (2, "no pii here at all", "en", "s1", 18),
        (3, "call +1 555-123-4567 now", "en", "s2", 24),
    ]
    _write(spark, tmp_path, rows)
    fn, _ = REGISTRY["doc_pii_redaction_stats"]
    got = {r["source"]: r for r in fn(spark, str(tmp_path)).collect()}
    s1, s2 = got["s1"], got["s2"]
    assert s1["n_email"] == 1 and s1["n_ipv4"] == 1 and s1["n_url"] == 1
    assert s1["n_docs"] == 2 and s1["n_docs_with_pii"] == 1
    assert s2["n_phone"] == 1 and s2["n_docs_with_pii"] == 1
    # doc 1: email(15) + ipv4(8) + url(18) hits replaced by 5-char tags
    assert s1["chars_removed"] == (15 - 5) + (8 - 5) + (18 - 5)


def test_repetition_fractions_and_edges(spark, tmp_path):
    rows = [
        # 4 tokens, all same: tok_rep = 1 - 1/4; bigrams 3 same: 1 - 1/3
        (1, "a a a a", "en", "rep", 7),
        # all distinct: both fractions 0
        (2, "w x y z", "en", "uniq", 7),
        # single token: no bigrams -> bg_rep 0 by guard
        (3, "solo", "en", "tiny", 4),
    ]
    _write(spark, tmp_path, rows)
    fn, _ = REGISTRY["doc_repetition_quality"]
    got = {r["source"]: r for r in fn(spark, str(tmp_path)).collect()}
    assert got["rep"]["avg_token_rep"] == 0.75
    assert got["rep"]["avg_bigram_rep"] == round(1 - 1 / 3, 6)
    assert got["rep"]["n_flag_token_rep"] == 1
    assert got["rep"]["n_flag_bigram_rep"] == 1
    assert got["uniq"]["avg_token_rep"] == 0.0
    assert got["uniq"]["n_flag_token_rep"] == 0
    assert got["tiny"]["avg_bigram_rep"] == 0.0
