"""Closed-form fixture for the corpus curation funnel capstone: one doc
engineered to fall at each stage."""

from __future__ import annotations

import hashlib

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars int"


def _hash_bucket(doc_id: int) -> int:
    h = hashlib.md5(str(doc_id).encode()).hexdigest()[:15]
    return int(h, 16) % 10


def _words(prefix: str, n4: int = 13, n5: int = 12) -> list[str]:
    # distinct words, 13x4 + 12x5 chars -> mean 4.48 in the [4,5] band,
    # TTR 1.0, top fraction 1/25 — passes every Gopher flag
    out = [f"{prefix}{i:02d}"[:4].ljust(4, "x") for i in range(n4)]
    out += [f"{prefix}{i:02d}y"[:5].ljust(5, "y") for i in range(n4, n4 + n5)]
    assert len(set(out)) == n4 + n5
    return out


def test_funnel_one_drop_per_stage(spark, tmp_path):
    non_hold = [i for i in range(1, 60) if _hash_bucket(i) != 9][:6]
    hold_id = next(i for i in range(1, 60) if _hash_bucket(i) == 9)
    a, b, c, d, e, f = non_hold

    good = " ".join(_words("al"))
    good2_tokens = _words("be")
    shared8 = _words("ce")[:8]
    doc_keep = (a, good, "en", "s0", 0)                       # survives all
    doc_lang = (b, " ".join(_words("da")), "fr", "s0", 0)     # language drop
    doc_short = (c, "tiny text here", "en", "s0", 0)          # quality drop
    doc_exact = (d, good, "en", "s0", 0)                      # exact-dup drop
    near_tokens = list(_words("al"))
    near_tokens[-1] = "zzzz"                                  # 1 word changed
    doc_near = (e, " ".join(near_tokens), "en", "s0", 0)      # near-dup drop
    doc_contam = (f, " ".join(good2_tokens + shared8), "en", "s0", 0)
    doc_holdout = (
        hold_id,
        " ".join(_words("fe") + shared8),
        "en",
        "s0",
        0,
    )
    spark.createDataFrame(
        [doc_keep, doc_lang, doc_short, doc_exact, doc_near, doc_contam, doc_holdout],
        DOC_SCHEMA,
    ).write.parquet(str(tmp_path / "documents.parquet"))
    fn, _ = REGISTRY["corpus_curation_funnel"]
    got = {r.stage: r.n_docs for r in fn(spark, str(tmp_path)).collect()}
    assert got["raw"] == 7
    assert got["language"] == 6          # fr doc out
    assert got["quality"] == 5           # short doc out
    assert got["exact_dedup"] == 4       # exact duplicate out (min id kept)
    assert got["near_dedup"] == 3        # near-dup out
    # holdout doc leaves the train pool AND poisons the gram-sharing doc
    assert got["decontaminated"] == 1    # only doc_keep survives
