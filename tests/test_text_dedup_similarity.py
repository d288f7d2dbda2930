"""Extension-operator tests: text analysis, MinHash/SimHash/Jaccard dedup,
cosine similarity — semantic properties, not just oracle parity.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions import dedupfns, similarity, text
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),  # near-dup of 0
    (2, "completely different words entirely unrelated content here now"),
    (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_fingerprint_exact_dup(spark, docs):
    fp = docs.select("doc_id", text.doc_fingerprint(F.col("text")).alias("f"))
    vals = {r.doc_id: r.f for r in fp.collect()}
    assert vals[0] == vals[3]
    assert vals[0] != vals[1]
    assert len(vals[0]) == 32  # md5 hex


def test_quality_and_counts(spark, docs):
    out = text.with_text_stats(docs).collect()
    row0 = next(r for r in out if r.doc_id == 0)
    assert row0.n_tokens == 9
    assert row0.n_punct == 0
    assert 0.0 <= row0.quality <= 1.0
    # 'the' appears twice -> en stopword signal
    assert row0.lang_guess == "en"
    row2 = next(r for r in out if r.doc_id == 2)
    assert row2.lang_guess == "und"  # no stopwords from any profile


def test_minhash_near_dup_ranks_above_unrelated(spark, docs):
    sig = dedupfns.with_minhash(docs, num_hashes=32)
    rows = {r.doc_id: r.minhash for r in sig.collect()}
    assert rows[0] == rows[3]  # identical docs -> identical signatures

    def est(a, b):
        return sum(x == y for x, y in zip(a, b)) / 32

    assert est(rows[0], rows[1]) > est(rows[0], rows[2])


def test_exact_jaccard_pairs(spark, docs):
    pairs = dedupfns.exact_jaccard_pairs(docs, min_jaccard=0.0)
    got = {(r.doc_a, r.doc_b): r.jaccard for r in pairs.collect()}
    assert got[(0, 3)] == 1.0  # exact dup
    assert got[(0, 1)] > got.get((0, 2), 0.0)


def test_simhash_properties(spark, docs):
    f = docs.select("doc_id", dedupfns.simhash64(F.col("text")).alias("s"))
    vals = {r.doc_id: r.s for r in f.collect()}
    assert vals[0] == vals[3]
    h01 = bin(vals[0] ^ vals[1]).count("1")
    h02 = bin(vals[0] ^ vals[2]).count("1")
    assert h01 < h02  # near-dup closer in hamming space
    assert all(0 <= v < 2 ** 60 for v in vals.values())


def test_cosine_identical_and_orthogonal(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [2.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    q = F.array(F.lit(1.0), F.lit(0.0))
    out = similarity.cosine_topk(df, q, k=3)
    rows = out.collect()
    assert [r.vec_id for r in rows] == [1, 3, 2]
    assert rows[0].cosine_sim == 1.0 and rows[1].cosine_sim == 1.0
    assert rows[2].cosine_sim == 0.0


def test_pairwise_topk_deterministic_ordering(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0]), (4, [1.0, 0.1])],
        "vec_id long, embedding array<float>",
    )
    out = similarity.pairwise_cosine_topk(df, k_pairs=2).collect()
    assert (out[0].id_a, out[0].id_b) == (1, 2)  # cosine 1.0 first
    assert out[0].cosine_sim == 1.0


def test_simhash_banded_pairs_guarantee_and_exactness(spark):
    """Banded blocking vs the brute-force small-N oracle: every pair within
    hamming <= n_bands-1 MUST be a candidate (pigeonhole), and surfaced
    hammings must equal the brute-force values."""
    emb = load_table(spark, "/root/testdata/sf0.001", "documents")
    f = dedupfns.simhash_df(emb, "doc_id", "text")
    vals = {r.doc_id: r.simhash for r in f.collect()}
    brute = {
        (a, b): bin(vals[a] ^ vals[b]).count("1")
        for a in vals
        for b in vals
        if a < b
    }
    banded = {
        (r.doc_a, r.doc_b): r.hamming
        for r in dedupfns.simhash_banded_pairs(f, "doc_id", "simhash")
        .select(
            "doc_a",
            "doc_b",
            dedupfns.hamming_distance64(F.col("sh_a"), F.col("sh_b"))
            .cast("bigint")
            .alias("hamming"),
        )
        .collect()
    }
    guaranteed = {p for p, h in brute.items() if h <= 3}
    assert guaranteed <= set(banded)
    for p, h in banded.items():
        assert brute[p] == h


def test_embedding_lsh_band2_recovers_brute_force_top_pairs(spark):
    """band_size=2 blocking (8 bands) must recover the brute-force top
    pairs on the clustered fixture, with exact cosine values."""
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    brute = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in similarity.pairwise_cosine_topk(emb, k_pairs=10).collect()
    }
    cand = similarity.lsh_candidate_pairs(emb, n_planes=16, band_size=2)
    blocked = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in cand.withColumn(
            "cosine_sim",
            F.round(similarity.cosine(F.col("vec_a"), F.col("vec_b")), 6),
        )
        .select("id_a", "id_b", "cosine_sim")
        .collect()
    }
    hits = set(brute) & set(blocked)
    assert len(hits) >= 8  # >=80% recall of the true top-10 at 2-bit bands
    for p in hits:
        assert abs(blocked[p] - brute[p]) < 1e-9


def test_hyperplane_sketch_deterministic(spark):
    df = spark.createDataFrame(
        [(1, [0.5] * 64), (2, [0.5] * 64), (3, [-0.5] * 64)],
        "vec_id long, embedding array<float>",
    )
    out = df.select(
        "vec_id", similarity.hyperplane_sketch(F.col("embedding")).alias("sk")
    )
    vals = {r.vec_id: r.sk for r in out.collect()}
    assert vals[1] == vals[2]  # identical vectors -> identical sketch
    assert vals[1] != vals[3]  # opposite vectors -> different sketch
