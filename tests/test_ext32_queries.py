"""Closed-form fixtures for the round-32 corpus-curation queries
(SemDeDup prune, sliding-window chunking, vocab coverage, OLS moments)."""

from __future__ import annotations

import datetime as dt

from shortvideohybridanalyticslakehouse_spark.functions import similarity
from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars int"
EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _e(i: int) -> list[float]:
    v = [0.0] * 64
    v[i] = 1.0
    return v


def test_semdedup_identical_vectors_pruned(spark):
    # v0 == v1 (cosine 1.0): both land in v0's cell (distance-0 tie breaks
    # to the smaller medoid id) and v1 is dropped; v2 is orthogonal, kept.
    emb = spark.createDataFrame(
        [(0, _e(1), 0), (1, _e(1), 0), (2, _e(2), 0)],
        "vec_id long, embedding array<float>, label int",
    )
    rows = similarity.semdedup_prune(emb, n_cells=16, tau=0.30).collect()
    got = {r.cell_id: (r.n_members, r.n_kept, r.n_dropped) for r in rows}
    assert got == {0: (2, 1, 1), 2: (1, 1, 0)}


def test_semdedup_below_threshold_kept(spark):
    # cosine(e1, e1+e2 normalized-ish) = 1/sqrt(2) ~= 0.707 >= 0.30 -> drop;
    # with tau=0.8 the same pair survives.
    mixed = [0.0] * 64
    mixed[1] = 1.0
    mixed[2] = 1.0
    emb = spark.createDataFrame(
        [(0, _e(1), 0), (1, mixed, 0)],
        "vec_id long, embedding array<float>, label int",
    )
    tight = similarity.semdedup_prune(emb, n_cells=16, tau=0.80).collect()
    assert sum(r.n_dropped for r in tight) == 0


def _doc(doc_id, n_tok, source="s0"):
    return (doc_id, " ".join(f"t{i}" for i in range(n_tok)), "en", source, 0)


def test_chunking_sizes_and_overlap(spark, tmp_path):
    # 10 tokens -> 1 chunk (len 10); 64 -> chunks 64+16 (overlap 16);
    # 112 -> 64+64+16 (overlap 32)
    spark.createDataFrame(
        [_doc(1, 10), _doc(2, 64), _doc(3, 112)], DOC_SCHEMA
    ).write.parquet(str(tmp_path / "documents.parquet"))
    fn, _ = REGISTRY["doc_chunk_overlap_plan"]
    r = fn(spark, str(tmp_path)).collect()
    assert len(r) == 1
    row = r[0]
    assert (row.n_docs, row.n_chunks) == (3, 6)
    assert row.chunk_tokens == 10 + (64 + 16) + (64 + 64 + 16)
    assert row.overlap_tokens == 0 + 16 + 32
    assert row.full_chunks == 3


def test_vocab_coverage_top10_of_12(spark, tmp_path):
    # 12 distinct tokens, freq(tok_i) = 13 - i for i in 1..12 (no ties).
    # top-10 by frequency = tok_1..tok_10 -> coverage@10 = (sum 13-i, i<=10)/total
    docs = [
        (i, " ".join([f"tok_{i:02d}"] * (13 - i)), "en", "s0", 0)
        for i in range(1, 13)
    ]
    spark.createDataFrame(docs, DOC_SCHEMA).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    fn, _ = REGISTRY["vocab_coverage_curve"]
    got = {r.k: r.coverage for r in fn(spark, str(tmp_path)).collect()}
    total = sum(13 - i for i in range(1, 13))
    top10 = sum(13 - i for i in range(1, 11))
    assert got[10] == round(top10 / total, 6)
    assert got[25] == 1.0 and got[250] == 1.0


def test_regr_slope_two_points(spark, tmp_path):
    # x in megaseconds: points (0 s, 1.0) and (1e6 s, 3.0)
    # -> slope 2.0 per megasec, intercept 1.0
    t0 = dt.datetime(2024, 1, 1)
    t1 = t0 + dt.timedelta(seconds=1_000_000)
    spark.createDataFrame(
        [(1, t0, 1, "view", 1.0, "{}"), (2, t1, 1, "view", 3.0, "{}")],
        EV_SCHEMA,
    ).write.parquet(str(tmp_path / "events.parquet"))
    fn, _ = REGISTRY["event_value_regr_slope"]
    row = fn(spark, str(tmp_path)).collect()[0]
    assert (row.event_type, row.n) == ("view", 2)
    assert row.slope_per_megasec == 2.0
    assert row.intercept == 1.0


def test_regr_slope_degenerate_x_is_null(spark, tmp_path):
    # both points at the same instant -> denominator 0 -> NULL slope
    t0 = dt.datetime(2024, 1, 2)
    spark.createDataFrame(
        [(1, t0, 1, "view", 1.0, "{}"), (2, t0, 1, "view", 3.0, "{}")],
        EV_SCHEMA,
    ).write.parquet(str(tmp_path / "events.parquet"))
    fn, _ = REGISTRY["event_value_regr_slope"]
    row = fn(spark, str(tmp_path)).collect()[0]
    assert row.slope_per_megasec is None and row.intercept is None
