"""MMR diversified top-k (ext115): a planted corpus where pure
relevance ranking picks near-duplicates and MMR must diversify."""

from __future__ import annotations

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

DIM = 8


def _vec(*pairs: tuple[int, float]) -> list[float]:
    v = [0.0] * DIM
    for i, x in pairs:
        v[i] = x
    return v


def test_mmr_diversifies_near_duplicates(spark, tmp_path):
    """Query along axis 0. Candidates: three clones hugging the query
    (rel ~0.99) and one moderately relevant orthogonal vector (rel 0.6).
    Relevance-only top-3 = the three clones; MMR round 2 must instead
    jump to the orthogonal vector because the clones' mutual similarity
    wipes out their relevance edge."""
    rows = [
        (0, _vec((0, 1.0)), 0),  # the query itself
        (1, _vec((0, 0.99), (1, 0.10)), 0),  # clone a
        (2, _vec((0, 0.99), (1, 0.11)), 0),  # clone b
        (3, _vec((0, 0.99), (1, 0.12)), 0),  # clone c
        (4, _vec((0, 0.60), (2, 0.80)), 1),  # diverse, lower rel
        (5, _vec((3, 1.0)), 1),  # irrelevant
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label long"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    reg = load_all()
    out = reg["mmr_diversified_topk"][0](spark, str(tmp_path)).collect()
    by_round = {r["round"]: r for r in out}

    # round 1: highest relevance wins (clone c has the largest dot)
    assert by_round[1]["vec_id"] in (1, 2, 3)
    first = by_round[1]["vec_id"]
    # round 2: the other clones are suppressed by their similarity to the
    # first pick — the diverse vector 4 must win despite lower relevance
    assert by_round[2]["vec_id"] == 4, [
        (r["round"], r["vec_id"], r["mmr_score"]) for r in out
    ]
    # penalties are real: round-2 winner carries a positive max_sim
    assert by_round[2]["max_sim"] > 0
    # no vector selected twice
    picked = [r["vec_id"] for r in out]
    assert len(set(picked)) == len(picked)
    # mmr_score is rel - max_sim, and the first pick has zero penalty
    for r in out:
        assert r["mmr_score"] == r["rel"] - r["max_sim"]
    assert by_round[1]["max_sim"] == 0
    assert first not in picked[1:]


def test_mmr_pool_smaller_than_k(spark, tmp_path):
    """ADVICE r8: with fewer candidates than MMR_K the greedy loop must
    terminate cleanly (no IndexError, no leaked persisted frames) and
    return one row per available candidate."""
    rows = [
        (0, _vec((0, 1.0)), 0),  # query
        (1, _vec((0, 0.9), (1, 0.2)), 0),
        (2, _vec((2, 1.0)), 1),
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label long"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

    out = load_all()["mmr_diversified_topk"][0](spark, str(tmp_path)).collect()
    assert len(out) == 2  # only 2 candidates exist; loop stopped early
    assert [r["round"] for r in sorted(out, key=lambda r: r["round"])] == [1, 2]
