"""Closed-form fixtures for the round-37 training-export queries."""

from __future__ import annotations

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars int"


def _doc(i, n, src="s0"):
    return (i, " ".join(f"t{j}" for j in range(n)), "en", src, 0)


def test_packed_manifest_offsets_and_straddle(spark, tmp_path):
    # three docs of 1000/1500/600 tokens: in SOME hash order the cumsums
    # are a permutation of prefix sums; verify invariants rather than the
    # (hash-dependent) order: offsets = cum % 2048, contiguity of cumsums,
    # and exactly the docs crossing a 2048 boundary flagged.
    spark.createDataFrame(
        [_doc(1, 1000), _doc(2, 1500), _doc(3, 600)], DOC_SCHEMA
    ).write.parquet(str(tmp_path / "documents.parquet"))
    fn, _ = REGISTRY["packed_sequence_manifest"]
    rows = fn(spark, str(tmp_path)).collect()
    assert len(rows) == 3
    # reconstruct cum_before from (chunk_id, chunk_offset)
    recon = sorted(r.chunk_id * 2048 + r.chunk_offset for r in rows)
    sizes = {r.doc_id: r.n_tok for r in rows}
    # the three cum_before values must be 0 and the two partial sums of
    # the sizes in SOME order (prefix-sum contiguity)
    ordered = sorted(rows, key=lambda r: r.chunk_id * 2048 + r.chunk_offset)
    expect, acc = [], 0
    for r in ordered:
        expect.append(acc)
        acc += r.n_tok
    assert recon == expect
    assert acc == 3100
    for r in rows:
        cum = r.chunk_id * 2048 + r.chunk_offset
        assert r.spans_boundary == (cum // 2048 != (cum + r.n_tok - 1) // 2048)


def test_oov_rate_closed_form(spark, tmp_path):
    # >100 distinct rare tokens force a real vocab cutoff: "common" appears
    # 200x (always in vocab); 150 singletons can't all fit in top-100.
    common = " ".join(["common"] * 10)
    rare = " ".join(f"rare{i:03d}" for i in range(150))
    spark.createDataFrame(
        [
            (1, common, "en", "core", 0),
            (2, common, "en", "core", 0),
            (3, rare, "en", "longtail", 0),
        ],
        DOC_SCHEMA,
    ).write.parquet(str(tmp_path / "documents.parquet"))
    fn, _ = REGISTRY["oov_rate_by_source"]
    got = {r.source: (r.tokens, r.oov_tokens, r.oov_rate) for r in fn(
        spark, str(tmp_path)
    ).collect()}
    # vocab = common + 99 lexicographically-first singletons (tie on n=1)
    assert got["core"] == (20, 0, 0.0)
    assert got["longtail"][0] == 150
    assert got["longtail"][1] == 150 - 99  # 51 tokens fall outside top-100
    assert got["longtail"][2] == round(51 / 150, 6)
