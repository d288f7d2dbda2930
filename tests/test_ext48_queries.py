"""Round-48 extensions: cross-modal curation + content-defined chunking."""

from __future__ import annotations

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()
SF_DIR = "/root/testdata/sf0.001"


def test_curation_flags_decision_domain(spark):
    fn, _ = REGISTRY["multimodal_curation_flags"]
    rows = fn(spark, SF_DIR).collect()
    assert rows and {r["decision"] for r in rows} <= {"KEEP", "REVIEW", "DROP"}
    for r in rows:
        if r["decision"] == "DROP":
            assert r["audio_clipped"] and r["video_dark"]
        elif r["decision"] == "KEEP":
            assert not (
                r["audio_clipped"] or r["video_dark"] or r["image_bright"]
            )


def _cdc_stats(spark, rows):
    # patch the NAME the query module bound at import time, not the
    # defining module
    from shortvideohybridanalyticslakehouse_spark.plans import queries_ext48

    df = spark.createDataFrame(rows, "doc_id long, text string")
    orig = queries_ext48.load_table
    try:
        queries_ext48.load_table = lambda *a, **k: df
        fn, _ = REGISTRY["cdc_chunk_dedup_stats"]
        return {r["doc_id"]: r for r in fn(spark, SF_DIR).collect()}
    finally:
        queries_ext48.load_table = orig


def test_cdc_boundaries_resynchronize_after_insertion(spark):
    """THE content-defined property: inserting one character near the
    front of a long text shifts at most the chunk it lands in — the
    boundary hash depends only on a 16-char window, so later boundaries
    (and thus later chunks) re-synchronize and stay SHARED between the
    original and the edited copy. A fixed-stride chunker would shift
    every later chunk and share ~nothing."""
    import shortvideohybridanalyticslakehouse_spark.plans.queries_ext48 as ext48
    import random

    rng = random.Random(7)
    text = "".join(rng.choice("abcdefgh ") for _ in range(4000))
    edited = text[:10] + "X" + text[10:]
    stats = _cdc_stats(
        spark, [(1, text), (2, edited)]
    )
    s1, s2 = stats[1], stats[2]
    assert s1["n_chunks"] > 20  # boundary rate ~1/64 over 4000 chars
    # nearly all of the original's chunks survive in the edited copy
    assert s1["shared_ratio"] >= 0.9
    assert s2["shared_ratio"] >= 0.9


def test_cdc_short_text_single_chunk(spark):
    stats = _cdc_stats(spark, [(1, "tiny"), (2, "tiny"), (3, "other")])
    assert stats[1]["n_chunks"] == 1
    # identical whole-text chunks are shared; the distinct one is not
    assert stats[1]["shared_ratio"] == 1.0 and stats[2]["shared_ratio"] == 1.0
    assert stats[3]["shared_ratio"] == 0.0
