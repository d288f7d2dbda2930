"""Closed-form fixture for perplexity-bucket mixture (round 42)."""

from __future__ import annotations

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars int"


def test_perplexity_buckets_order_and_balance(spark, tmp_path):
    # 10 docs: 5 made of one SHARED common token (low surprise) and 5 of a
    # unique-per-doc token (high surprise). Quintiles of 10 docs -> 2 docs
    # each; the common docs must fill the LOW buckets, unique docs the HIGH.
    rows = [(i, "common common common", "en", "s0", 0) for i in range(5)]
    rows += [(10 + i, f"rare{i} rare{i} rare{i}", "en", "s0", 0) for i in range(5)]
    spark.createDataFrame(rows, DOC_SCHEMA).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    fn, _ = REGISTRY["perplexity_bucket_mixture"]
    out = fn(spark, str(tmp_path)).collect()
    assert [r.bucket for r in out] == [1, 2, 3, 4, 5]
    assert all(r.n_docs == 2 and r.n_tokens == 6 for r in out)
    # common-token docs: p = 15/30 -> 1 bit; rare docs: p = 3/30 -> log2(10)
    assert out[0].avg_bits_per_token == 1.0
    assert out[4].avg_bits_per_token == round(3.321928, 6)
    # buckets 1-2 low-surprise, 4-5 high; bucket 3 straddles (one of each)
    bits = [r.avg_bits_per_token for r in out]
    assert bits == sorted(bits)


def test_arrow_topk_agrees_with_hof(spark):
    from pyspark.sql import functions as F

    from shortvideohybridanalyticslakehouse_spark.functions import similarity
    from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()[1]]
    corpus = emb.filter(F.col("vec_id") != 0)
    arrow = [
        (r.vec_id, r.cosine_sim)
        for r in similarity.cosine_topk_arrow(corpus, qvec, k=7).collect()
    ]
    hof = [
        (r.vec_id, r.cosine_sim)
        for r in similarity.cosine_topk(
            corpus, F.array(*[F.lit(x) for x in qvec]), k=7
        ).collect()
    ]
    assert arrow == hof
