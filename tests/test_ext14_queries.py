"""Boundary tests for queries_ext14 on tiny hand-built corpora where the
expected numbers are computable by eye. The split/order tests reproduce
the hash60 bucketing in pure Python (md5-prefix) to place docs in
specific splits deliberately."""

from __future__ import annotations

import hashlib

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars int"


def bucket(doc_id: int) -> int:
    h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
    return h % 100


def write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, t, "en", s, len(t)) for (i, t, s) in rows], DOC_SCHEMA
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def words(n: int, prefix: str = "w") -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_mixture_weights_cap_and_rate(spark, tmp_path):
    # src A: 20 tokens, src B: 60 tokens -> total 80, target 40/source.
    # A undersized -> rate capped at 1; B oversized -> rate 2/3.
    sf = write_docs(
        spark,
        tmp_path,
        [(1, words(10), "A"), (2, words(10), "A"), (3, words(60), "B")],
    )
    fn, _ = REGISTRY["domain_mixture_weights"]
    got = {r["source"]: r for r in fn(spark, sf).collect()}
    assert got["A"]["sample_rate"] == 1.0
    assert got["A"]["expected_tokens"] == 20.0
    assert got["B"]["sample_rate"] == round(40.0 / 60.0, 6)
    assert got["B"]["expected_tokens"] == 40.0


def test_contamination_identical_doc_across_split(spark, tmp_path):
    # Find one train-bucket id and one test-bucket id, give them identical
    # 8-token texts; a second test doc is unique -> rate = 1/2.
    train_id = next(i for i in range(1000) if bucket(i) < 80)
    test_ids = [i for i in range(1000) if bucket(i) >= 90][:2]
    shared = words(8, "shared")
    sf = write_docs(
        spark,
        tmp_path,
        [
            (train_id, shared, "s"),
            (test_ids[0], shared, "s"),
            (test_ids[1], words(8, "unique"), "s"),
        ],
    )
    fn, _ = REGISTRY["split_contamination_8gram"]
    row = fn(spark, sf).collect()[0]
    assert row["n_test_docs"] == 2
    assert row["contaminated_docs"] == 1
    assert row["shared_grams"] == 1
    assert row["contamination_rate"] == 0.5


def test_dup_spans_doc_frequency(spark, tmp_path):
    shared = words(8, "x")
    sf = write_docs(
        spark,
        tmp_path,
        [(1, shared, "s"), (2, shared, "s"), (3, words(8, "y"), "s")],
    )
    fn, _ = REGISTRY["duplicate_ngram_spans"]
    rows = fn(spark, sf).collect()
    assert rows[0]["gram"] == shared.lower()
    assert rows[0]["n_docs"] == 2
    assert all(r["n_docs"] == 1 for r in rows[1:])


def test_packing_single_small_doc(spark, tmp_path):
    sf = write_docs(spark, tmp_path, [(1, words(10), "s")])
    fn, _ = REGISTRY["concat_chunk_packing_plan"]
    row = fn(spark, sf).collect()[0]
    assert row["total_docs"] == 1
    assert row["total_tokens"] == 10
    assert row["n_chunks"] == 1
    assert row["last_chunk_fill"] == round(10 / 2048, 6)
    assert row["straddling_docs"] == 0


def test_packing_straddling_doc(spark, tmp_path):
    # One 3000-token doc spans chunks 0 and 1: 2 chunks, tail 952/2048.
    sf = write_docs(spark, tmp_path, [(1, words(3000), "s")])
    fn, _ = REGISTRY["concat_chunk_packing_plan"]
    row = fn(spark, sf).collect()[0]
    assert row["n_chunks"] == 2
    assert row["straddling_docs"] == 1
    assert row["last_chunk_fill"] == round((3000 - 2048) / 2048, 6)


def test_novelty_repeat_vs_fresh_batches(spark, tmp_path):
    # Batch 0 (doc 0): one gram. Batch 1 (docs 100, 101): the same gram
    # again (not novel) + one fresh gram -> rate 0.5.
    seen = words(8, "seen")
    sf = write_docs(
        spark,
        tmp_path,
        [(0, seen, "s"), (100, seen, "s"), (101, words(8, "fresh"), "s")],
    )
    fn, _ = REGISTRY["corpus_novelty_curve"]
    got = {r["batch"]: r for r in fn(spark, sf).collect()}
    assert got[0]["total_grams"] == 1 and got[0]["novel_grams"] == 1
    assert got[0]["novelty_rate"] == 1.0
    assert got[1]["total_grams"] == 2 and got[1]["novel_grams"] == 1
    assert got[1]["novelty_rate"] == 0.5
