"""Burrows' Delta (ext127): same-generator sources must sit closer than
a vocabulary-shifted impostor."""

from __future__ import annotations

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all


def test_burrows_delta_separates_generators(spark, tmp_path):
    """Sources a1/a2 share one generator (same word distribution up to
    noise); source b leans on a different function-word mix. Delta must
    rank (a1, a2) as the closest pair."""
    def doc(words):
        return " ".join(words)

    vocab_a = ["the", "of", "and", "to", "in"]
    vocab_b = ["zzz", "qqq", "and", "to", "in"]
    rows = []
    i = 0
    for src, vocab, reps in (
        ("a1", vocab_a, 12),
        ("a2", vocab_a, 12),
        ("b", vocab_b, 12),
    ):
        for k in range(reps):
            words = [vocab[(k + j) % 5] for j in range(10 + k % 3)]
            rows.append((i, doc(words), "en", src, 1))
            i += 1
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    reg = load_all()
    out = {
        (r.src_a, r.src_b): r.delta_micro
        for r in reg["burrows_delta_sources"][0](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(out) == {("a1", "a2"), ("a1", "b"), ("a2", "b")}
    assert out[("a1", "a2")] < out[("a1", "b")]
    assert out[("a1", "a2")] < out[("a2", "b")]
    assert all(v >= 0 for v in out.values())
