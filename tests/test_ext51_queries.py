"""Round-51 extension: positional phrase search semantics."""

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


def test_phrase_search_shape(spark):
    fn, _ = REGISTRY["phrase_search_positional"]
    rows = fn(spark, SF).collect()
    assert len(rows) == 5
    assert sorted(r.phrase_id for r in rows) == [0, 1, 2, 3, 4]
    for r in rows:
        assert r.n_occurrences >= r.n_docs >= 1


def test_phrase_search_adjacency_and_overlap(spark):
    """Positional semantics: non-adjacent words must NOT match; an
    overlapping run 'y y y' contains the phrase (y, y) TWICE (positions
    1-2 and 2-3); counts replay the planted corpus exactly."""
    fn, _ = REGISTRY["phrase_search_positional"]
    rows = [
        (1, "x y filler1 filler2"),   # adjacent "x y"
        (2, "x z y filler1"),         # x..y NON-adjacent -> no "x y" hit
        (3, "x y x y filler1"),       # two "x y" occurrences
        (4, "y y y filler1"),         # overlapping (y,y) twice
        (5, "x y filler1 filler2"),
    ]
    d = _write_docs(spark, rows)
    out = {(r.term1, r.term2): r for r in fn(spark, d).collect()}
    # "x y": docs 1, 3, 5 (doc 2 non-adjacent) with 4 occurrences total
    assert ("x", "y") in out
    xy = out[("x", "y")]
    assert (xy.n_docs, xy.n_occurrences) == (3, 4)
    # overlapping "y y": one doc, two positional hits
    if ("y", "y") in out:  # present iff it reaches the top-5 bigrams
        yy = out[("y", "y")]
        assert (yy.n_docs, yy.n_occurrences) == (1, 2)
    # phrase ids are ordered by frequency then terms, densely 0..4
    assert sorted(r.phrase_id for r in out.values()) == list(range(len(out)))


def test_phrase3_chained_adjacency(spark):
    """Three-word chaining: all three terms must be consecutive, in
    order; a doc with the words scrambled or gapped must not match."""
    fn, _ = REGISTRY["phrase3_search_positional"]
    rows = [
        (1, "a b c pad1 pad2"),       # exact "a b c"
        (2, "a b x c pad1"),          # gapped -> no match
        (3, "c b a pad1 pad2"),       # reversed -> no match
        (4, "a b c a b c pad1"),      # two occurrences
        (5, "pad1 a b c pad2"),       # offset occurrence
    ]
    d = _write_docs(spark, rows)
    out = {(r.term1, r.term2, r.term3): r for r in fn(spark, d).collect()}
    assert ("a", "b", "c") in out
    abc = out[("a", "b", "c")]
    assert (abc.n_docs, abc.n_occurrences) == (3, 4)
    assert ("c", "b", "a") not in out or out[("c", "b", "a")].n_docs == 1
    for r in out.values():
        assert r.n_occurrences >= r.n_docs >= 1
