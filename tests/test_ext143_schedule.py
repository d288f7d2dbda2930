"""Planted fixtures for the ext143 training-run planning lanes."""

from __future__ import annotations

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REG = load_all()


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def test_curriculum_phases_and_offsets(spark, tmp_path):
    """8 docs with token counts 1..8 -> phases of 2 docs each (shortest
    first); offsets are exact prefix sums."""
    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(i)), "xx", "s", i)
        for i in range(1, 9)
    ]
    _write_docs(spark, tmp_path, rows)
    out = {
        r.phase: r
        for r in REG["curriculum_phase_schedule"][0](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    assert [out[p].phase_tokens for p in (1, 2, 3, 4)] == [3, 7, 11, 15]
    assert [out[p].stream_offset_tokens for p in (1, 2, 3, 4)] == [
        0, 3, 10, 21,
    ]
    assert out[1].min_tokens == 1 and out[4].max_tokens == 8


def test_epoch_allocation_greedy_cap_and_exhaustion(spark, tmp_path):
    """Two sources: high-quality (all-distinct tokens) and low-quality
    (one token repeated). Budget = 2x corpus; the high-quality source
    takes its 4-epoch cap first, the rest goes to the low one."""
    hi = " ".join(f"h{j}" for j in range(10))  # 10 tokens, all distinct
    lo = " ".join(["rep"] * 30)  # 30 tokens, 1 distinct
    rows = [(1, hi, "xx", "hi", 1), (2, lo, "xx", "lo", 1)]
    _write_docs(spark, tmp_path, rows)
    out = {
        r.source: r
        for r in REG["epoch_allocation_budget"][0](
            spark, str(tmp_path)
        ).collect()
    }
    # budget = 2 * 40 = 80; hi capped at 4*10 = 40 -> 4.0 epochs;
    # lo gets the remaining 40 of its 120 cap -> 40/30 epochs
    assert out["hi"].tokens_taken == 40
    assert out["hi"].epochs_micro == 4_000_000
    assert out["lo"].tokens_taken == 40
    assert out["lo"].epochs_micro == 40 * 1_000_000 // 30
    assert out["hi"].quality_micro == 1_000_000
    assert out["lo"].quality_micro == 1_000_000 // 30
