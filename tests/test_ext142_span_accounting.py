"""Planted fixtures for the ext142 span-accounting lanes: expected
values known by construction, independent of the DuckDB oracle."""

from __future__ import annotations

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REG = load_all()


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def _toks(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_removal_interval_union_no_double_count(spark, tmp_path):
    """Doc 1 shares a 10-token span with doc 2: union = 10 tokens per
    doc, NOT 3 windows x 8 = 24; disjoint doc 3 contributes zero."""
    shared = _toks("s", 10)
    rows = [
        (1, _toks("a", 5) + " " + shared, "xx", "p", 1),
        (2, shared + " " + _toks("b", 5), "xx", "q", 1),
        (3, _toks("z", 30), "xx", "p", 1),
    ]
    _write_docs(spark, tmp_path, rows)
    out = {
        r.source: r
        for r in REG["exact_substring_removal"][0](
            spark, str(tmp_path)
        ).collect()
    }
    assert out["p"].n_docs == 2 and out["p"].total_tokens == 45
    assert out["p"].n_docs_with_dups == 1
    assert out["p"].dup_tokens == 10  # union, not 24
    assert out["p"].dup_token_micro == 10 * 1_000_000 // 45
    assert out["q"].dup_tokens == 10 and out["q"].n_docs_with_dups == 1


def test_removal_two_close_runs_merge_in_token_space(spark, tmp_path):
    """Two 8-token shared spans separated by ONE unshared token: the
    covered position runs are distinct islands but their token windows
    overlap — union must count 17 tokens, not 16 or 24."""
    s1, s2 = _toks("m", 8), _toks("n", 8)
    rows = [
        (1, s1 + " gap0 " + s2, "xx", "p", 1),
        (2, _toks("x", 4) + " " + s1, "xx", "q", 1),
        (3, s2 + " " + _toks("y", 4), "xx", "q", 1),
    ]
    _write_docs(spark, tmp_path, rows)
    out = {
        r.source: r
        for r in REG["exact_substring_removal"][0](
            spark, str(tmp_path)
        ).collect()
    }
    # doc 1: spans at positions 1 and 10 -> windows [1,8] and [10,17]
    # over 17 tokens total: union 16 of 17 tokens
    assert out["p"].dup_tokens == 16
    assert out["p"].total_tokens == 17


def test_provenance_matrix_cells(spark, tmp_path):
    """Cross cell for the pair sharing a gram; diagonal only for the
    source with an internal 2-doc repeat."""
    g = _toks("g", 8)
    rows = [
        (1, g + " " + _toks("a", 3), "xx", "s1", 1),
        (2, g + " " + _toks("b", 3), "xx", "s2", 1),  # cross s1-s2
        (3, _toks("h", 8), "xx", "s3", 1),
        (4, _toks("h", 8) + " tail0", "xx", "s3", 1),  # diagonal s3
    ]
    _write_docs(spark, tmp_path, rows)
    out = {
        (r.source_a, r.source_b): r.shared_grams
        for r in REG["span_provenance_matrix"][0](
            spark, str(tmp_path)
        ).collect()
    }
    assert out[("s1", "s2")] == 1
    assert out[("s3", "s3")] == 1
    assert ("s1", "s3") not in out and ("s1", "s1") not in out


def test_self_repetition_templated_doc(spark, tmp_path):
    """A doc that is one 8-gram repeated has TTR far below 0.5; a
    no-repeat doc has TTR exactly 1.0."""
    unit = _toks("r", 8)
    templated = " ".join([unit] * 4)  # 32 tokens, heavy self-repeat
    rows = [
        (1, templated, "xx", "tpl", 1),
        (2, _toks("u", 20), "xx", "clean", 1),
    ]
    _write_docs(spark, tmp_path, rows)
    out = {
        r.source: r
        for r in REG["doc_self_repetition"][0](
            spark, str(tmp_path)
        ).collect()
    }
    assert out["clean"].mean_ttr_micro == 1_000_000
    assert out["clean"].n_templated == 0
    assert out["tpl"].n_templated == 1
    # 32 tokens -> 25 grams; distinct: tokens repeat with period 8 so
    # every 8-gram is one of 8 rotations -> 8/25
    assert out["tpl"].mean_ttr_micro == 8 * 1_000_000 // 25
