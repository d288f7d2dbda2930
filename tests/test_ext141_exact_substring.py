"""exact_substring_spans (ext141): planted fixtures where the maximal
repeated spans are known by construction, plus property tests of the
suffix-array kernels against brute force."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from shortvideohybridanalyticslakehouse_spark.functions.suffixes import (
    bucket_covered_positions,
    cross_doc_match_lengths,
    lcp_array,
    partition_covered_positions,
    suffix_array,
)
from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REG = load_all()


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def _toks(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_planted_copied_span(spark, tmp_path):
    """Doc 2 copies a 10-token span from doc 1 (one maximal span, 3
    covered 8-gram positions each); doc 3 is disjoint (absent)."""
    shared = _toks("s", 10)
    rows = [
        (1, _toks("a", 5) + " " + shared + " " + _toks("b", 5), "xx", "p", 1),
        (2, _toks("c", 3) + " " + shared + " " + _toks("d", 7), "xx", "p", 1),
        (3, _toks("z", 30), "xx", "p", 1),
    ]
    _write_docs(spark, tmp_path, rows)
    out = {
        r.doc_id: r
        for r in REG["exact_substring_spans"][0](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(out) == {1, 2}
    # a 10-token repeat = 10 - 8 + 1 = 3 consecutive covered positions
    for d in (1, 2):
        assert out[d].n_spans == 1
        assert out[d].covered_positions == 3
        assert out[d].max_span_tokens == 10
    # doc 1: span starts after the 5-token prefix -> positions 6..8;
    # doc 2: after 3 tokens -> positions 4..6 (checked via island math)


def test_two_disjoint_spans_in_one_doc(spark, tmp_path):
    """Doc 1 shares two separate 8-token spans with docs 2 and 3 —
    two spans, each exactly one covered position."""
    s1, s2 = _toks("m", 8), _toks("n", 8)
    rows = [
        (1, s1 + " " + _toks("x", 9) + " " + s2, "xx", "p", 1),
        (2, _toks("q", 4) + " " + s1, "xx", "p", 1),
        (3, s2 + " " + _toks("r", 4), "xx", "p", 1),
    ]
    _write_docs(spark, tmp_path, rows)
    out = {
        r.doc_id: r
        for r in REG["exact_substring_spans"][0](
            spark, str(tmp_path)
        ).collect()
    }
    assert out[1].n_spans == 2
    assert out[1].covered_positions == 2
    assert out[1].max_span_tokens == 8
    assert out[2].n_spans == 1 and out[3].n_spans == 1


def test_exact_duplicate_docs_fully_covered(spark, tmp_path):
    """Verbatim copies: every 8-gram position covered, one doc-length
    span in each copy."""
    body = _toks("w", 20)
    rows = [
        (1, body, "xx", "p", 1),
        (2, body, "xx", "p", 1),
    ]
    _write_docs(spark, tmp_path, rows)
    out = {
        r.doc_id: r
        for r in REG["exact_substring_spans"][0](
            spark, str(tmp_path)
        ).collect()
    }
    for d in (1, 2):
        assert out[d].n_spans == 1
        assert out[d].covered_positions == 13  # 20 - 8 + 1
        assert out[d].max_span_tokens == 20


def test_within_doc_repeat_not_counted(spark, tmp_path):
    """A doc repeating ITS OWN 8-gram twice with no cross-doc sharer
    produces nothing — coverage is strictly cross-document."""
    s = _toks("k", 8)
    rows = [
        (1, s + " " + _toks("u", 5) + " " + s, "xx", "p", 1),
        (2, _toks("v", 25), "xx", "p", 1),
    ]
    _write_docs(spark, tmp_path, rows)
    assert (
        REG["exact_substring_spans"][0](spark, str(tmp_path)).count() == 0
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_sa_lcp_kernels_vs_bruteforce(seed):
    rng = np.random.RandomState(seed)
    for _ in range(60):
        n = rng.randint(2, 40)
        ids = rng.randint(0, 5, n).astype(np.int64)
        sa = suffix_array(ids)
        assert list(sa) == sorted(range(n), key=lambda i: tuple(ids[i:]))
        lcp = lcp_array(ids, sa)
        for i in range(1, n):
            a, b = ids[sa[i - 1]:], ids[sa[i]:]
            ln = 0
            while ln < len(a) and ln < len(b) and a[ln] == b[ln]:
                ln += 1
            assert lcp[i] == ln
        docs = rng.randint(0, 3, n).astype(np.int64)
        best = cross_doc_match_lengths(ids, docs)
        for i in range(n):
            bb = 0
            for j in range(n):
                if docs[j] == docs[i]:
                    continue
                ln = 0
                while i + ln < n and j + ln < n and ids[i + ln] == ids[j + ln]:
                    ln += 1
                bb = max(bb, ln)
            assert best[i] == bb


def test_bucket_kernel_positions():
    """Kernel emits global positions of cross-doc >=L matches only;
    same-doc snippets never certify each other."""
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 1],
            "start": [10, 5, 50],
            "snip": [
                ["a", "b", "c", "d", "e", "f", "g", "h", "x"],
                ["z", "a", "b", "c", "d", "e", "f", "g", "h"],
                ["a", "b", "c", "d", "e", "f", "g", "h", "y"],
            ],
        }
    )
    out = bucket_covered_positions(pdf, 8)
    got = set(zip(out["doc_id"], out["pos"]))
    # 8-token match abcdefgh: doc1@10, doc2@6, doc1@50 (certified by
    # doc2's copy, NOT by doc1's own other snippet alone)
    assert got == {(1, 10), (2, 6), (1, 50)}
    # single-doc bucket: nothing
    assert bucket_covered_positions(pdf[pdf.doc_id == 1], 8).empty


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_partition_kernel_equals_per_bucket(seed):
    """The partition-level mapInPandas kernel (one suffix array over all
    co-partitioned buckets) must emit EXACTLY the union of the old
    per-bucket applyInPandas kernel's outputs: cross-bucket matches it
    additionally sees are true >=L matches the per-bucket pass certifies
    in the matching rows' own bucket, and same-doc rows never certify
    each other either way."""
    rng = np.random.RandomState(seed)
    vocab = [f"t{i}" for i in range(6)]
    buckets = []
    for b in range(8):
        rows = []
        for _ in range(rng.randint(1, 5)):
            doc = int(rng.randint(1, 5))
            start = int(rng.randint(1, 200))
            ln = int(rng.randint(8, 14))
            snip = [vocab[v] for v in rng.randint(0, len(vocab), ln)]
            rows.append({"doc_id": doc, "start": start, "snip": snip})
        buckets.append(pd.DataFrame(rows))
    per_bucket = set()
    for bdf in buckets:
        out = bucket_covered_positions(bdf, 8)
        per_bucket |= set(zip(out["doc_id"], out["pos"]))
    whole = pd.concat(buckets, ignore_index=True)[
        ["doc_id", "start", "snip"]
    ]
    # Decomposed equivalence: (a) partition output ⊇ per-bucket union
    # (nothing an in-bucket pass certifies is lost), and (b) every extra
    # hit is a real cross-doc >=8-gram equality (brute-forced below).
    # Query-level set equality then follows from winnowing co-location:
    # all rows sharing an anchor land in one bucket, so every true match
    # is certified by SOME bucket, and the final distinct absorbs the
    # partition kernel's extra (true) certifications.
    part_out = list(partition_covered_positions(iter(buckets), 8))
    part = (
        set(zip(part_out[0]["doc_id"], part_out[0]["pos"]))
        if part_out
        else set()
    )
    assert part >= per_bucket
    # brute-force soundness check of every partition-kernel hit
    tok_at = {}  # (doc, gpos) -> token
    for r in whole.itertuples(index=False):
        for i, t in enumerate(r.snip):
            tok_at[(int(r.doc_id), int(r.start) + i)] = t
    def gram(doc, pos):
        g = tuple(
            tok_at.get((doc, pos + i)) for i in range(8)
        )
        return None if any(x is None for x in g) else g
    for doc, pos in part:
        g = gram(doc, pos)
        assert g is not None
        assert any(
            gram(d2, p2) == g
            for (d2, p2) in tok_at
            if d2 != doc and gram(d2, p2) is not None
        )
