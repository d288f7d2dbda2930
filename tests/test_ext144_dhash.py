"""raster_dhash_near_dup (ext144): planted cross-format re-encodes are
found at hamming 0; unrelated images stay apart."""

from __future__ import annotations

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REG = load_all()


def _write_docs(spark, tmp_path, n):
    rows = [(i, "t%d" % i, "xx", "s", 1) for i in range(1, n + 1)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def test_planted_reencodes_found_at_hamming_zero(spark, tmp_path):
    _write_docs(spark, tmp_path, 40)
    out = REG["raster_dhash_near_dup"][0](spark, str(tmp_path)).collect()
    got = {(r.doc_a, r.doc_b): r.hamming for r in out}
    # ids 7,17,27,37 re-encode their predecessor: 4 planted pairs
    for d in (7, 17, 27, 37):
        assert got.get((d - 1, d)) == 0, (d, got)
    # nothing else collides on a 40-image corpus of distinct pixels
    extras = {k: v for k, v in got.items() if k[1] - k[0] != 1 or v != 0}
    assert extras == {}


def test_dhash_differs_across_distinct_images(spark, tmp_path):
    from shortvideohybridanalyticslakehouse_spark.functions import (
        multimodal,
    )

    _write_docs(spark, tmp_path, 12)
    docs = spark.read.parquet(str(tmp_path / "documents.parquet"))
    payloads = multimodal.synthetic_raster_payloads_with_dups(docs)
    hashes = {
        r.doc_id: r.dhash
        for r in multimodal.raster_dhash(payloads).collect()
    }
    assert hashes[6] == hashes[7]  # the planted re-encode
    non_dup = [hashes[d] for d in (1, 2, 3, 4, 5, 8, 9, 10)]
    assert len(set(non_dup)) == len(non_dup)  # distinct images differ
