"""Closed-form fixtures for the round-34 curation queries (chunk dedup,
token-budget sampling, int8 quantization audit)."""

from __future__ import annotations

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars int"


def test_chunk_dedup_counts(spark, tmp_path):
    # Two 10-token docs with IDENTICAL text -> 1 chunk each, same hash
    # (dup_chunks 2); one unique doc -> 1 chunk, no dup.
    same = " ".join(f"t{i}" for i in range(10))
    other = " ".join(f"u{i}" for i in range(10))
    spark.createDataFrame(
        [
            (1, same, "en", "s0", 0),
            (2, same, "en", "s0", 0),
            (3, other, "en", "s1", 0),
        ],
        DOC_SCHEMA,
    ).write.parquet(str(tmp_path / "documents.parquet"))
    fn, _ = REGISTRY["chunk_dedup_stats"]
    got = {
        r.source: (r.n_chunks, r.distinct_chunks, r.dup_chunks, r.dup_ratio)
        for r in fn(spark, str(tmp_path)).collect()
    }
    assert got == {"s0": (2, 1, 2, 1.0), "s1": (1, 1, 0, 0.0)}


def test_chunk_dedup_cross_doc_boundary_chunks_differ(spark, tmp_path):
    # 100-token doc -> chunks [0:64], [48:100], [96:100]; a 64-token doc
    # equal to the FIRST 64 tokens -> chunks [0:64], [48:64]. Only the
    # [0:64] chunk collides (strided windows differ otherwise).
    toks = [f"w{i}" for i in range(100)]
    spark.createDataFrame(
        [
            (1, " ".join(toks), "en", "s0", 0),
            (2, " ".join(toks[:64]), "en", "s0", 0),
        ],
        DOC_SCHEMA,
    ).write.parquet(str(tmp_path / "documents.parquet"))
    fn, _ = REGISTRY["chunk_dedup_stats"]
    row = fn(spark, str(tmp_path)).collect()[0]
    # 5 chunks total; the [0:64] chunk occurs twice -> 2 dup chunks
    assert (row.n_chunks, row.distinct_chunks, row.dup_chunks) == (5, 4, 2)


def test_token_budget_greedy_boundary(spark, tmp_path):
    # one source, docs of 200 tokens each: greedy fill at budget 300 keeps
    # the doc that CROSSES the boundary -> 2 selected (400 tokens), not 1.
    def doc(i):
        return (i, " ".join(f"t{j}" for j in range(200)), "en", "s0", 0)

    spark.createDataFrame([doc(1), doc(2), doc(3)], DOC_SCHEMA).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    fn, _ = REGISTRY["token_budget_sample"]
    row = fn(spark, str(tmp_path)).collect()[0]
    assert (row.n_docs, row.n_selected, row.tokens_selected) == (3, 2, 400)


def test_int8_quant_zero_error_on_exact_grid(spark, tmp_path):
    # vectors whose entries are exact multiples of scale quantize losslessly:
    # v = [127, 0, ..., 0] -> scale 1.0, all codes exact -> mse 0, max_abs 0
    v1 = [127.0] + [0.0] * 63
    v2 = [0.0, 254.0] + [0.0] * 62  # scale 2.0, entries multiples of 2
    spark.createDataFrame(
        [(0, v1, 0), (1, v2, 1)],
        "vec_id long, embedding array<float>, label int",
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    fn, _ = REGISTRY["embedding_int8_quant_error"]
    got = {r.label: (r.n_vecs, r.mse, r.max_abs_err, r.avg_scale) for r in fn(
        spark, str(tmp_path)
    ).collect()}
    assert got == {0: (1, 0.0, 0.0, 1.0), 1: (1, 0.0, 0.0, 2.0)}


def test_int8_quant_known_error(spark, tmp_path):
    # v = [127, 0.5, 0, ...]: scale 1.0; 0.5 rounds half-up to 1 -> error
    # -0.5 on that coordinate only: mse = 0.25/64, max_abs 0.5
    v = [127.0, 0.5] + [0.0] * 62
    spark.createDataFrame(
        [(0, v, 7)], "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    fn, _ = REGISTRY["embedding_int8_quant_error"]
    row = fn(spark, str(tmp_path)).collect()[0]
    assert row.label == 7
    assert row.max_abs_err == 0.5
    assert row.mse == round(0.25 / 64, 9)
