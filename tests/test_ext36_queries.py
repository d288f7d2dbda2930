"""Closed-form fixture for shingle containment (round 36)."""

from __future__ import annotations

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars int"


def test_containment_subset_beats_jaccard(spark, tmp_path):
    # doc 1 = 6 tokens; doc 2 = doc 1 + 12 extra tokens.
    # doc1 shingles (3-gram): 4; doc2: 16 — all 4 of doc1's are inside doc2
    # -> containment 1.0, jaccard only 4/16 = 0.25: the asymmetry on show.
    base = "a b c d e f"
    extra = " ".join(f"x{i}" for i in range(12))
    spark.createDataFrame(
        [
            (1, base, "en", "s0", 0),
            (2, base + " " + extra, "en", "s0", 0),
        ],
        DOC_SCHEMA,
    ).write.parquet(str(tmp_path / "documents.parquet"))
    fn, _ = REGISTRY["containment_top_pairs"]
    rows = fn(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert r.max_containment == 1.0
    assert r.jaccard == 0.25


def test_temperature_mixture_flattens(spark, tmp_path):
    # sources with 400 vs 100 tokens: raw shares .8/.2; sqrt-temperature
    # shares 20/(20+10)=2/3 and 1/3 — smaller source upweighted.
    def doc(i, n, src):
        return (i, " ".join(f"t{j}" for j in range(n)), "en", src, 0)

    spark.createDataFrame(
        [doc(1, 400, "big"), doc(2, 100, "small")],
        "doc_id long, text string, lang string, source string, n_chars int",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    fn, _ = REGISTRY["temperature_mixture_shares"]
    got = {r.source: (r.tokens, r.raw_share, r.temp_share) for r in fn(
        spark, str(tmp_path)
    ).collect()}
    assert got["big"] == (400, 0.8, round(20 / 30, 6))
    assert got["small"] == (100, 0.2, round(10 / 30, 6))
