"""Hot-bucket re-band: the last named scale-killer from the round-3 verdict.

A band bucket must fit one task; these tests PLANT a bucket far beyond the
cap and assert (a) the capped plan's output is bit-identical to the
uncapped plan (every top-k pair sits within the pigeonhole radius, so the
recursive re-band may not drop it), (b) the Spark-side split really bounds
every post-split bucket at <= cap where fingerprint entropy allows, and
(c) the blocked tile/GEMM backstop is output-equivalent to the one-shot
m x m tile (so a residual giant bucket is merely slower, never wrong, and
never allocates an m^2 array).

Reference parity note: the reference engine never dedups, so the bar here
is our own 100-TB design rule (PLANS.md "What we check"): no task may
buffer an unbounded group.
"""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions import dedupfns, similarity


def _simhash_fixture(spark):
    """430 distinct fingerprints + 200 exact duplicates, all sharing band-0
    value V (bits 0-14) -> one planted level-0 bucket of 630 members."""
    rng = random.Random(42)
    V = 0x3A5C  # shared 15-bit band-0 value
    rows = []
    seen = set()
    fps = []
    while len(fps) < 400:
        upper = rng.getrandbits(45)
        fp = (upper << 15) | V
        if fp not in seen:
            seen.add(fp)
            fps.append(fp)
    doc_id = 0
    for fp in fps:
        rows.append((doc_id, fp))
        doc_id += 1
    # 30 planted near-dup partners: 1-3 bit flips within bits 15..59 so the
    # pair stays inside the pigeonhole radius (hamming <= n_bands-1 = 3)
    # AND inside the planted band-0 bucket.
    for i in range(30):
        base = fps[i]
        flips = rng.sample(range(15, 60), rng.randint(1, 3))
        fp = base
        for b in flips:
            fp ^= 1 << b
        if fp in seen:
            continue
        seen.add(fp)
        rows.append((doc_id, fp))
        doc_id += 1
    # 200 exact duplicates of one center (mass-duplicate cluster: collapse
    # must shrink it to k+1 before banding).
    center = fps[399]
    for _ in range(200):
        rows.append((doc_id, center))
        doc_id += 1
    # 100 random background fingerprints.
    for _ in range(100):
        fp = rng.getrandbits(60)
        if fp in seen:
            continue
        seen.add(fp)
        rows.append((doc_id, fp))
        doc_id += 1
    return spark.createDataFrame(rows, "doc_id long, simhash long")


def test_simhash_planted_giant_bucket_identical_output(spark):
    fp = _simhash_fixture(spark)
    capped = dedupfns.simhash_bucket_topk_pairs(
        fp, "doc_id", "simhash", k=20, bucket_cap=64, max_extra_levels=3
    ).collect()
    uncapped = dedupfns.simhash_bucket_topk_pairs(
        fp, "doc_id", "simhash", k=20, bucket_cap=None
    ).collect()
    assert [tuple(r) for r in capped] == [tuple(r) for r in uncapped]
    # Defense in depth: replay the banded-candidate top-k in pure Python.
    data = [(r["doc_id"], r["simhash"]) for r in fp.collect()]
    pairs = {}
    by_band = {}
    for i, h in data:
        for b in range(4):
            by_band.setdefault((b, (h >> (15 * b)) & 32767), []).append((i, h))
    for members in by_band.values():
        members.sort()
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                (ia, ha), (ib, hb) = members[x], members[y]
                pairs[(ia, ib)] = bin(ha ^ hb).count("1")
    expect = sorted(((d, a, b) for (a, b), d in pairs.items()))[:20]
    assert [(r["hamming"], r["doc_a"], r["doc_b"]) for r in capped] == expect


def test_simhash_rebanded_keys_bound_bucket_size(spark):
    fp = _simhash_fixture(spark)
    banded = dedupfns.simhash_rebanded_keys(
        fp, "doc_id", "simhash", k=20, bucket_cap=64, max_extra_levels=3
    )
    sizes = banded.groupBy("bkey").count()
    max_size = sizes.agg(F.max("count")).first()[0]
    assert max_size <= 64, f"post-split bucket of {max_size} members"
    # The uncapped plan really had a giant bucket (the test is not vacuous).
    raw = dedupfns.simhash_rebanded_keys(
        fp, "doc_id", "simhash", k=20, bucket_cap=None
    )
    raw_max = raw.groupBy("bkey").count().agg(F.max("count")).first()[0]
    assert raw_max > 64


def test_simhash_blocked_tile_equivalent(spark, monkeypatch):
    """The blocked tile backstop (m > _PAIR_TILE in one bucket) returns the
    same pairs as the one-shot triu tile."""
    fp = _simhash_fixture(spark)
    base = dedupfns.simhash_bucket_topk_pairs(
        fp, "doc_id", "simhash", k=20, bucket_cap=None
    ).collect()
    monkeypatch.setattr(dedupfns, "_PAIR_TILE", 37)
    blocked = dedupfns.simhash_bucket_topk_pairs(
        fp, "doc_id", "simhash", k=20, bucket_cap=None
    ).collect()
    assert [tuple(r) for r in blocked] == [tuple(r) for r in base]


def _vec_fixture(spark, n=400, dim=64, n_dups=60):
    rng = random.Random(7)
    rows = []
    vid = 0
    for _ in range(n):
        rows.append((vid, [rng.gauss(0, 1) for _ in range(dim)]))
        vid += 1
    dup = rows[0][1]
    for _ in range(n_dups):
        rows.append((vid, list(dup)))
        vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_lsh_planted_dup_bucket_identical_output(spark):
    """60 exact-duplicate vectors -> a mass-dup bucket; collapse bounds it
    and the capped output matches the uncapped one bit-for-bit."""
    emb = _vec_fixture(spark)
    capped = similarity.lsh_bucket_topk_pairs(
        emb, n_planes=16, band_size=2, k=20, bucket_cap=48, max_extra_levels=8
    ).collect()
    uncapped = similarity.lsh_bucket_topk_pairs(
        emb, n_planes=16, band_size=2, k=20, bucket_cap=None
    ).collect()
    assert [tuple(r) for r in capped] == [tuple(r) for r in uncapped]
    # top-20 must be cosine-1.0 duplicate pairs among the 21 smallest dup ids
    assert all(r["cosine_sim"] == pytest.approx(1.0) for r in capped)


def test_lsh_rebanded_keys_bound_bucket_size(spark):
    """With only distinct random vectors (enough sketch entropy), every
    post-split bucket is <= cap."""
    emb = _vec_fixture(spark, n=500, n_dups=0)
    banded = similarity.lsh_rebanded_keys(
        emb, n_planes=16, band_size=2, k=20, bucket_cap=48, max_extra_levels=8
    )
    max_size = banded.groupBy("bkey").count().agg(F.max("count")).first()[0]
    assert max_size <= 48, f"post-split bucket of {max_size} members"
    raw = similarity.lsh_rebanded_keys(
        emb, n_planes=16, band_size=2, k=20, bucket_cap=None
    )
    raw_max = raw.groupBy("bkey").count().agg(F.max("count")).first()[0]
    assert raw_max > 48


def test_lsh_blocked_gemm_equivalent(spark, monkeypatch):
    emb = _vec_fixture(spark, n=200, n_dups=0)
    base = similarity.lsh_bucket_topk_pairs(
        emb, n_planes=16, band_size=2, k=20, bucket_cap=None
    ).collect()
    monkeypatch.setattr(similarity, "_VEC_TILE", 17)
    blocked = similarity.lsh_bucket_topk_pairs(
        emb, n_planes=16, band_size=2, k=20, bucket_cap=None
    ).collect()
    assert [tuple(r) for r in blocked] == [tuple(r) for r in base]


def test_lsh_terminal_unsplittable_bucket_blocked_gemm(spark, monkeypatch):
    """Adversarial terminal case: many DISTINCT vectors sharing one full
    sketch (all on one ray + tiny noise) — no sketch bits can split them,
    so the bucket exceeds the cap all the way down and the blocked GEMM
    backstop must score it correctly (and identically to the uncapped
    one-shot tile)."""
    rng = random.Random(3)
    base = [rng.gauss(0, 1) for _ in range(64)]
    rows = []
    for i in range(120):
        scale = 1.0 + 0.01 * i
        noise = [rng.gauss(0, 1e-4) for _ in range(64)]
        rows.append((i, [base[d] * scale + noise[d] for d in range(64)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    monkeypatch.setattr(similarity, "_VEC_TILE", 32)
    capped = similarity.lsh_bucket_topk_pairs(
        emb, n_planes=16, band_size=2, k=20, bucket_cap=16, max_extra_levels=4
    ).collect()
    uncapped = similarity.lsh_bucket_topk_pairs(
        emb, n_planes=16, band_size=2, k=20, bucket_cap=None
    ).collect()
    assert [tuple(r) for r in capped] == [tuple(r) for r in uncapped]
    assert len(capped) == 20 and all(r.cosine_sim > 0.99 for r in capped)
