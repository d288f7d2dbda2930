"""Tests for queries_ext12 helpers: vectorized ANN correctness/tie-break
and agreement with the HOF baseline."""

from __future__ import annotations

from shortvideohybridanalyticslakehouse_spark.functions import similarity
from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()


def test_vectorized_topk_known_corpus_and_ties(spark):
    # query (1,0): ids 1,2 both cosine 1.0 (tie -> id asc), id 3 cosine 0,
    # id 4 cosine ~0.7071. k=3 keeps [1, 2, 4].
    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [2.0, 0.0]),
            (3, [0.0, 5.0]),
            (4, [1.0, 1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    got = similarity.cosine_topk_vectorized(corpus, [1.0, 0.0], k=3).collect()
    assert [(r["vec_id"], r["cosine_sim"]) for r in got] == [
        (1, 1.0),
        (2, 1.0),
        (4, round(2 ** -0.5, 6)),
    ]


def test_vectorized_matches_hof_baseline_on_fixture(spark):
    fn_v, _ = REGISTRY["embedding_cosine_topk_vectorized"]
    fn_h, _ = REGISTRY["embedding_cosine_topk"]
    sf = "/root/testdata/sf0.001"
    v = [(r["vec_id"], r["cosine_sim"]) for r in fn_v(spark, sf).collect()]
    h = [(r["vec_id"], r["cosine_sim"]) for r in fn_h(spark, sf).collect()]
    assert v == h
