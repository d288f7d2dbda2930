"""TextRank keywords (ext123): pure-Python replay of the 3-iteration
weighted push on a planted corpus where centrality disagrees with raw
frequency."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all


def _round12(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("1e-12"), ROUND_HALF_UP))


def textrank_reference(docs: list[str], iters: int = 3):
    from collections import defaultdict

    w = defaultdict(int)
    for text in docs:
        t = text.lower().strip().split()
        for x, y in zip(t, t[1:]):
            if x != y:
                w[(min(x, y), max(x, y))] += 1
    und = defaultdict(dict)
    for (a, b), n in w.items():
        und[a][b] = n
        und[b][a] = n
    wdeg = {s: sum(nb.values()) for s, nb in und.items()}
    rank = {t: 1.0 for t in und}
    for _ in range(iters):
        acc = defaultdict(float)
        for s, nb in und.items():
            for d, n in nb.items():
                acc[d] += _round12(rank[s] * n / wdeg[s])
        rank = {t: _round12(0.15 + 0.85 * acc.get(t, 0.0)) for t in und}
    return {t: round(r, 9) for t, r in rank.items()}


def test_textrank_planted_hub(spark, tmp_path):
    """'hub' touches three distinct spokes (freq 3); 'loop'/'pool'
    co-occur 12 times between themselves. Frequency ranks loop/pool
    first; TextRank must put the hub on top."""
    docs = [
        "hub spoke1",
        "hub spoke2",
        "hub spoke3",
        "loop pool " * 6,
    ]
    spark.createDataFrame(
        [(i, t.strip(), "en", "s0", len(t)) for i, t in enumerate(docs)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    reg = load_all()
    out = reg["textrank_keywords"][0](spark, str(tmp_path)).collect()
    got = {r.term: r.textrank for r in out}
    exp = textrank_reference(docs)
    assert got == exp, (got, exp)
    top_term = max(got.items(), key=lambda kv: (kv[1], kv[0]))[0]
    assert top_term == "hub"
    # centrality beats frequency: loop/pool co-occur 4x as often but
    # rank strictly below the hub
    assert got["hub"] > got["loop"] and got["hub"] > got["pool"]
