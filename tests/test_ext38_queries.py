"""Closed-form fixture for similarity-graph PageRank (round 38)."""

from __future__ import annotations

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars int"


def test_pagerank_pair_and_isolated(spark, tmp_path):
    # docs 1 and 2 identical -> guaranteed LSH edge (signatures equal in
    # every band, est agreement 16/16); doc 3 shares no vocabulary -> no
    # edge. Closed form: the 2-cycle is a fixpoint of r = 0.15 + 0.85*r
    # at r=1.0 (each node receives the other's full rank); the isolated
    # node holds the base rank 0.15 from iteration 1 on.
    same = "alpha beta gamma delta epsilon zeta eta theta"
    other = "one two three four five six seven eight nine"
    spark.createDataFrame(
        [
            (1, same, "en", "s0", 0),
            (2, same, "en", "s0", 0),
            (3, other, "en", "s0", 0),
        ],
        DOC_SCHEMA,
    ).write.parquet(str(tmp_path / "documents.parquet"))
    fn, _ = REGISTRY["doc_similarity_pagerank"]
    got = {r.doc_id: r.pagerank for r in fn(spark, str(tmp_path)).collect()}
    assert got == {1: 1.0, 2: 1.0, 3: 0.15}


def test_triangles_clique_closed_form(spark, tmp_path):
    # three identical docs -> a 3-clique (1 triangle, 3 wedges,
    # clustering 1.0); one unrelated doc contributes nothing.
    same = "alpha beta gamma delta epsilon zeta eta theta"
    other = "one two three four five six seven eight nine"
    spark.createDataFrame(
        [
            (1, same, "en", "s0", 0),
            (2, same, "en", "s0", 0),
            (3, same, "en", "s0", 0),
            (4, other, "en", "s0", 0),
        ],
        DOC_SCHEMA,
    ).write.parquet(str(tmp_path / "documents.parquet"))
    fn, _ = REGISTRY["similarity_graph_triangles"]
    r = fn(spark, str(tmp_path)).collect()[0]
    assert (r.n_edges, r.n_triangles, r.n_wedges, r.global_clustering) == (
        3,
        1,
        3,
        1.0,
    )
