"""Property tests for the winnowing guarantee (queries_ext95).

The winnowing paper's coverage lemma, which the COVERAGE ledger cites as
the deterministic recall floor: any shared substring of length
>= k + w - 1 (= 8 normalized chars here) between two documents yields at
least one SHARED fingerprint. Hypothesis drives random documents with
planted shared runs; a pure-Python reference implementation checks the
Spark/SQL pipeline's selection rule itself."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from shortvideohybridanalyticslakehouse_spark.plans.queries_ext95 import (
    _B,
    _K,
    _M,
    _POS_PACK,
    _W,
)


def _norm(text: str) -> str:
    return "".join(c for c in text.lower() if c.isalnum() and c.isascii())


def _hashes(s: str) -> list[tuple[int, int]]:
    """(pos 1-based, hash) for every k-gram — the ext95 polynomial."""
    out = []
    for i in range(len(s) - _K + 1):
        h = 0
        for c in s[i : i + _K]:
            h = (h * _B + ord(c)) % _M
        out.append((i + 1, h))
    return out


def winnow(text: str) -> set[tuple[int, int]]:
    """Reference winnowing: distinct (hash, pos) minima of every full
    w-window over packed keys — mirrors the SQL exactly."""
    s = _norm(text)
    if len(s) < _K + _W - 1:
        return set()
    keyed = [(h * _POS_PACK + i, h, i) for i, h in _hashes(s)]
    sel = set()
    for start in range(len(keyed) - _W + 1):
        key, h, i = min(keyed[start : start + _W])
        sel.add((h, i))
    return sel


_ALPHA = string.ascii_lowercase + "  "


@settings(max_examples=30, deadline=None)
@given(
    left=st.text(_ALPHA, min_size=0, max_size=40),
    right=st.text(_ALPHA, min_size=0, max_size=40),
    shared=st.text(string.ascii_lowercase, min_size=8, max_size=20),
    mid_a=st.text(_ALPHA, min_size=0, max_size=30),
    mid_b=st.text(_ALPHA, min_size=0, max_size=30),
)
def test_shared_run_guarantees_shared_fingerprint(
    left, right, shared, mid_a, mid_b
):
    """Plant the same >= (k+w-1)-char alphanumeric run in two otherwise
    arbitrary docs: their fingerprint HASH sets must intersect."""
    doc_a = left + " " + shared + " " + mid_a
    doc_b = mid_b + " " + shared + " " + right
    fps_a = {h for h, _ in winnow(doc_a)}
    fps_b = {h for h, _ in winnow(doc_b)}
    assert fps_a & fps_b, (
        f"no shared fingerprint despite shared run {shared!r}"
    )


@settings(max_examples=30, deadline=None)
@given(doc=st.text(_ALPHA + string.digits, min_size=12, max_size=120))
def test_density_and_coverage_invariants(doc):
    """Structural invariants of the selection: every full window
    contributes a selected position (coverage), selected positions are
    valid k-gram starts, and density can't exceed the window count."""
    s = _norm(doc)
    sel = winnow(doc)
    if len(s) < _K + _W - 1:
        assert sel == set()
        return
    n_windows = (len(s) - _K + 1) - _W + 1
    assert 1 <= len(sel) <= n_windows
    positions = sorted(i for _, i in sel)
    assert positions[0] <= _W  # the first window is covered
    assert positions[-1] >= n_windows  # so is the last
    # no gap between consecutive selections exceeds the window span
    for a, b in zip(positions, positions[1:]):
        assert b - a <= _W


@settings(max_examples=20, deadline=None)
@given(
    doc=st.text(_ALPHA, min_size=10, max_size=80),
    prefix=st.text(_ALPHA, min_size=0, max_size=20),
)
def test_selection_is_local(doc, prefix):
    """Winnowing is LOCAL: fingerprints more than one window past the
    prefix boundary are identical whether or not the prefix is present
    (the property that makes shared-run detection position-independent)."""
    plain = winnow(doc)
    shifted = winnow(prefix + doc)
    off = len(_norm(prefix))
    deep_plain = {(h, i) for h, i in plain if i > _W + _K}
    remapped = {(h, i - off) for h, i in shifted if i - off > _W + _K}
    assert deep_plain <= remapped
    # and hash-wise the deep interior survives the shift entirely
    assert {h for h, _ in deep_plain} <= {h for h, _ in shifted}


def test_reference_matches_spark_pipeline(spark):
    """Bind the pure-Python reference the properties above exercise to
    the ACTUAL Spark pipeline: identical (hash, pos) fingerprint sets on
    a mixed corpus (short doc below threshold, punctuation, repeats)."""
    from shortvideohybridanalyticslakehouse_spark.plans.queries_ext95 import (
        winnowing_fingerprints_df,
    )

    docs = [
        (1, "The quick brown fox; jumps OVER the lazy dog!"),
        (2, "aaaa aaaa aaaa aaaa aaaa"),
        (3, "tiny"),
        (4, "Numbers 12345 mixed WITH text and 12345 again 12345"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in winnowing_fingerprints_df(df).collect():
        got.setdefault(r.doc_id, set()).add(
            (r.wmin // _POS_PACK, r.wmin % _POS_PACK)
        )
    for d, text in docs:
        assert got.get(d, set()) == winnow(text), f"doc {d}"
