"""Batched multi-query ANN: agreement with the per-query brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions import similarity
from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()


def test_batch_topk_matches_per_query_bruteforce(spark):
    sf = "/root/testdata/sf0.001"
    from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

    emb = load_table(spark, sf, "embeddings")
    qrows = (
        emb.filter(F.col("vec_id") < 3)
        .select("vec_id", F.col("embedding").cast("array<double>"))
        .orderBy("vec_id")
        .collect()
    )
    queries = [(r[0], list(r[1])) for r in qrows]
    batch = similarity.cosine_topk_batch(emb, queries, k=5).collect()
    got = {}
    for r in batch:
        got.setdefault(r.query_id, []).append((r.vec_id, r.cosine_sim))
    for qid, qvec in queries:
        solo = [
            (r.vec_id, r.cosine_sim)
            for r in similarity.cosine_topk(
                emb.filter(F.col("vec_id") != qid),
                F.array(*[F.lit(x) for x in qvec]),
                k=5,
            ).collect()
        ]
        assert got[qid] == solo, f"query {qid} diverged from brute force"


def test_batch_topk_excludes_self(spark):
    emb = spark.createDataFrame(
        [(i, [float(i == j) for j in range(8)], 0) for i in range(4)],
        "vec_id long, embedding array<float>, label int",
    )
    queries = [(0, [1.0] + [0.0] * 7)]
    rows = similarity.cosine_topk_batch(emb, queries, k=10).collect()
    assert all(r.vec_id != 0 for r in rows)
    assert len(rows) == 3
