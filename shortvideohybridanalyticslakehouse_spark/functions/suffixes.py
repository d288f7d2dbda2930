"""Suffix-array kernels for exact-substring (span-level) deduplication.

The Lee et al. ExactSubstr shape (arXiv:2107.06499 "Deduplicating
Training Data Makes Language Models Better") finds maximal substrings of
length >= L shared across documents with one global suffix array. A
global suffix array does not distribute; the bounded variant here runs a
SMALL suffix array per winnowed-anchor bucket over fixed-size snippets:

- Every token position i whose L-gram also occurs in ANOTHER document
  is "covered". By the winnowing guarantee (Schleimer et al., SIGMOD'03:
  every window of W consecutive k-gram hashes selects an anchor, and
  identical windows select the identical anchor), a shared L-gram with
  L = k + W - 1 contains one full window in BOTH documents, so both
  share an anchor VALUE inside the match — bucketing by anchor value
  therefore certifies every covered position in at least one bucket.
- The anchor's k-gram sits at most W - 1 k-gram positions after the
  L-gram start, so a snippet of L + k - 1 + (W - 1) = L + W + k - 2
  tokens starting W - 1 tokens before the anchor contains every L-gram
  that the anchor can certify: shuffle is O(anchor occurrences x
  snippet), never O(doc x shared anchors).

Per bucket: concatenate member snippets with per-snippet unique
separators, build a prefix-doubling suffix array (O(n log^2 n),
numpy-vectorized), Kasai LCP, then the classic two-sweep
nearest-different-document pass gives each suffix its best cross-doc
match length; positions with best >= L are covered. Gaps-and-islands
over the distinct covered positions then reconstructs the maximal
repeated spans — identical to the global definition, and expressible in
ANSI SQL for the DuckDB oracle twin.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def suffix_array(ids: np.ndarray) -> np.ndarray:
    """Suffix array by prefix doubling (numpy argsort per round,
    O(n log^2 n) total). ``ids`` is any integer array; ties broken by
    position implicitly through rank doubling."""
    n = len(ids)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    # initial ranks: dense-rank the token ids
    rank = np.unique(ids, return_inverse=True)[1].astype(np.int64)
    sa = np.argsort(rank, kind="stable").astype(np.int64)
    k = 1
    tmp = np.empty(n, dtype=np.int64)
    while True:
        # sort by (rank[i], rank[i+k]) — second key first for stability
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        order = np.argsort(second, kind="stable")
        order = order[np.argsort(rank[order], kind="stable")]
        # recompute dense ranks for the pair keys in sorted order
        r1 = rank[order]
        r2 = second[order]
        changed = np.empty(n, dtype=bool)
        changed[0] = True
        changed[1:] = (r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])
        tmp[order] = np.cumsum(changed) - 1
        rank, tmp = tmp.copy(), rank
        sa = order
        if rank[sa[-1]] == n - 1:
            return sa.astype(np.int64)
        k *= 2


def lcp_array(ids: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai LCP: lcp[i] = LCP(suffix sa[i-1], suffix sa[i]); lcp[0]=0."""
    n = len(ids)
    lcp = np.zeros(n, dtype=np.int64)
    if n == 0:
        return lcp
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    h = 0
    for i in range(n):
        r = rank[i]
        if r == 0:
            h = 0
            continue
        j = sa[r - 1]
        while i + h < n and j + h < n and ids[i + h] == ids[j + h]:
            h += 1
        lcp[r] = h
        if h:
            h -= 1
    return lcp


def cross_doc_match_lengths(
    ids: np.ndarray, doc_of: np.ndarray
) -> np.ndarray:
    """best[pos] = length of the longest common prefix between the
    suffix at ``pos`` and ANY suffix starting in a different document.

    Two sweeps over suffix-array order: the nearest earlier (resp.
    later) suffix from a different document is optimal because the
    running min-LCP only shrinks with distance."""
    n = len(ids)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    sa = suffix_array(ids)
    lcp = lcp_array(ids, sa)
    docs_sa = doc_of[sa]
    left = np.zeros(n, dtype=np.int64)
    for i in range(1, n):
        if docs_sa[i - 1] != docs_sa[i]:
            left[i] = lcp[i]
        else:
            left[i] = min(left[i - 1], lcp[i])
    right = np.zeros(n, dtype=np.int64)
    for i in range(n - 2, -1, -1):
        if docs_sa[i + 1] != docs_sa[i]:
            right[i] = lcp[i + 1]
        else:
            right[i] = min(right[i + 1], lcp[i + 1])
    best_sa = np.maximum(left, right)
    best = np.empty(n, dtype=np.int64)
    best[sa] = best_sa
    return best


def partition_covered_positions(batches, min_len: int):
    """mapInPandas kernel: ALL anchor buckets co-partitioned here (hash
    on ahash) -> covered (doc_id, pos), one suffix array per PARTITION.

    Matching does not need bucket boundaries — only CO-LOCATION does.
    Completeness: a shared L-gram's two occurrences carry a common
    winnowed anchor, so their snippets hash to the same partition and
    the partition-wide suffix array finds the match. Soundness: every
    certified match is a real >=L cross-doc token equality (separators
    are per-snippet-unique, so matches never leak across snippets),
    which is exactly the direct L-gram-join definition — matches found
    across DIFFERENT buckets of the same partition are true matches the
    per-bucket pass would have certified in their own bucket. Hence the
    output set is identical to applyInPandas(bucket_covered_positions)
    per bucket, at ~1 numpy suffix array per partition instead of one
    Python call per bucket (profiled r12: ~10k tiny-group calls were
    ~5 s of pure per-group overhead at sf0.1; guide §4.2)."""
    frames = [b for b in batches]
    if frames:
        pdf = pd.concat(frames, ignore_index=True)
        out = bucket_covered_positions(pdf, min_len)
        if len(out):
            yield out


def partition_covered_positions_capped(batches, min_len: int, max_tokens: int):
    """Memory-bounded variant (VERDICT r12 #3): the input partition is
    SORTED by ahash (so anchor groups are contiguous) and carries the
    ahash column; chunks of WHOLE anchor groups are flushed whenever the
    buffered token count exceeds ``max_tokens`` — per-task memory is
    O(max_tokens + largest single group) instead of O(partition).

    Output identity: a certified match's two occurrences share an anchor
    value, so both rows live in the SAME group and groups are never
    split — every per-partition match is found in some chunk, and any
    cross-group match a chunk certifies is a true match the per-group
    pass would also certify (the same argument as the un-capped kernel;
    downstream .distinct() absorbs cross-chunk duplicates)."""

    def flush(frames, final: bool):
        pdf = pd.concat(frames, ignore_index=True)
        if final:
            head, tail = pdf, None
        else:
            last = pdf["ahash"].iloc[-1]
            keep = pdf["ahash"] != last
            head, tail = pdf[keep], pdf[~keep]
        out = (
            bucket_covered_positions(head, min_len) if len(head) else None
        )
        return out, tail

    buf: list[pd.DataFrame] = []
    buf_tokens = 0
    for b in batches:
        if not len(b):
            continue
        buf.append(b)
        buf_tokens += int(b["snip"].map(len).sum())
        if buf_tokens >= max_tokens:
            out, tail = flush(buf, final=False)
            if out is not None and len(out):
                yield out
            buf = [tail] if tail is not None and len(tail) else []
            buf_tokens = (
                int(tail["snip"].map(len).sum()) if buf else 0
            )
    if buf:
        out, _ = flush(buf, final=True)
        if out is not None and len(out):
            yield out


def bucket_covered_positions(
    pdf: pd.DataFrame, min_len: int
) -> pd.DataFrame:
    """applyInPandas kernel: one winnowed-anchor bucket of snippets ->
    the (doc_id, pos) token positions whose ``min_len``-gram provably
    occurs in another document of the bucket.

    Input columns: doc_id (int64), start (int64, 1-based global token
    position of the snippet's first token), snip (list<str> tokens).
    Snippets from the same document never certify each other (the sweep
    keys on doc_id), and per-snippet unique separators stop matches from
    leaking across snippet boundaries."""
    out_empty = pd.DataFrame(
        {"doc_id": pd.Series(dtype="int64"), "pos": pd.Series(dtype="int64")}
    )
    if len(pdf) < 2 or pdf["doc_id"].nunique() < 2:
        return out_empty
    toks: list[str] = []
    doc_of: list[int] = []
    gpos: list[int] = []
    for row_i, r in enumerate(pdf.itertuples(index=False)):
        snip = list(r.snip)
        toks.extend(snip)
        doc_of.extend([int(r.doc_id)] * len(snip))
        gpos.extend(range(int(r.start), int(r.start) + len(snip)))
        # unique separator per snippet: never equals any real token
        toks.append(f"\x00sep{row_i}")
        doc_of.append(-1)
        gpos.append(-1)
    ids = np.unique(np.array(toks, dtype=object), return_inverse=True)[1]
    best = cross_doc_match_lengths(
        ids.astype(np.int64), np.array(doc_of, dtype=np.int64)
    )
    mask = best >= min_len
    if not mask.any():
        return out_empty
    doc_arr = np.array(doc_of, dtype=np.int64)[mask]
    pos_arr = np.array(gpos, dtype=np.int64)[mask]
    keep = doc_arr >= 0
    return pd.DataFrame(
        {"doc_id": doc_arr[keep], "pos": pos_arr[keep]}
    ).drop_duplicates()
