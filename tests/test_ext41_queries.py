"""Closed-form fixtures for round-41 (duplication provenance reports)."""

from __future__ import annotations

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars int"


def test_cross_source_matrix_cells(spark, tmp_path):
    # docs 1 (src A) and 2 (src B) identical -> one CROSS cell A/B;
    # docs 3,4 (both src A) identical -> one WITHIN cell A/A;
    # doc 5 unrelated.
    t1 = "alpha beta gamma delta epsilon zeta eta theta"
    t2 = "one two three four five six seven eight nine ten"
    rows = [
        (1, t1, "en", "A", 0),
        (2, t1, "en", "B", 0),
        (3, t2, "en", "A", 0),
        (4, t2, "en", "A", 0),
        (5, "totally different words here now ok fine yes", "en", "C", 0),
    ]
    spark.createDataFrame(rows, DOC_SCHEMA).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    fn, _ = REGISTRY["cross_source_dup_matrix"]
    got = {
        (r.source_a, r.source_b): (r.n_pairs, r.cross_source_pairs)
        for r in fn(spark, str(tmp_path)).collect()
    }
    assert got == {("A", "B"): (1, 1), ("A", "A"): (1, 0)}


def test_top_boilerplate_example_doc(spark, tmp_path):
    same = " ".join(f"t{i}" for i in range(10))
    rows = [
        (7, same, "en", "s0", 0),
        (3, same, "en", "s0", 0),
        (9, same, "en", "s0", 0),
        (1, "unique words only here", "en", "s0", 0),
    ]
    spark.createDataFrame(rows, DOC_SCHEMA).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    fn, _ = REGISTRY["top_boilerplate_chunks"]
    out = fn(spark, str(tmp_path)).collect()
    assert len(out) == 1  # only the repeated chunk survives HAVING > 1
    r = out[0]
    assert (r.n_occurrences, r.n_docs, r.example_doc) == (3, 3, 3)
