"""Bigram-LM surprise (ext92): hand-computed tiny corpus + the ordering
property (a scrambled document must score MORE surprising than the
fluent one under the corpus-trained bigram model, even when both share
the exact same unigram bag — the separation a unigram LM cannot make)."""

from __future__ import annotations

import math

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all


def _surprise(docs_tokens, target):
    """Pure-python replica of the model for one doc."""
    toks = [t for d in docs_tokens for t in d]
    n = len(toks)
    uni = {}
    for t in toks:
        uni[t] = uni.get(t, 0) + 1
    bigc = {}
    for d in docs_tokens:
        for v, w in zip(d, d[1:]):
            bigc[(v, w)] = bigc.get((v, w), 0) + 1
    s = 0.0
    tgt = docs_tokens[target]
    for v, w in zip(tgt, tgt[1:]):
        p = 0.75 * (bigc[(v, w)] / uni[v]) + 0.25 * (uni[w] / n)
        s += math.log(p)
    nb = len(tgt) - 1
    return math.floor(1_000_000 * -s / nb)


def test_bigram_lm_hand_and_ordering(spark, tmp_path):
    fluent = "the cat sat on the mat".split()
    fluent2 = "the cat sat on the rug".split()
    scrambled = "mat the on sat cat the".split()  # same bag as fluent
    docs_tokens = [fluent, fluent2, scrambled]
    rows = [
        (0, "fluent", " ".join(fluent)),
        (1, "fluent", " ".join(fluent2)),
        (2, "scrambled", " ".join(scrambled)),
    ]
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    reg = load_all()
    got = {
        r.source: (r.n_docs, r.n_bigrams, r.total_surprise_micro,
                   r.mean_surprise_micro)
        for r in reg["bigram_lm_surprise"][0](spark, str(tmp_path)).collect()
    }
    want_fluent = _surprise(docs_tokens, 0) + _surprise(docs_tokens, 1)
    want_scram = _surprise(docs_tokens, 2)
    assert got["fluent"] == (2, 10, want_fluent, want_fluent // 2)
    assert got["scrambled"] == (1, 5, want_scram, want_scram)
    # the separation property: same unigram bag, wildly different score
    assert got["scrambled"][3] > got["fluent"][3]
