"""Recall floors for the ANN lane family (VERDICT r6 #7): the committed
contract behind tools/ann_recall_curve.py's table. Asserted on the
UNSTRUCTURED sf0.01 corpus (no planted clone structure), 4 fixed
queries, so the floors measure the honest recall-for-scan trade."""

from __future__ import annotations

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions import similarity
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table
from tools.ann_recall_curve import lsh_topk

SF_DIR = "/root/testdata/sf0.01"
K = 10
QUERY_IDS = [0, 7, 33, 101]


def _corpus(spark):
    return load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding", "label"
    )


def _recalls(spark):
    emb = _corpus(spark).cache()
    n = emb.count()
    qvecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id").isin(QUERY_IDS)).collect()
    }
    truth = {}
    for q, v in qvecs.items():
        truth[q] = {
            r[0]
            for r in similarity.cosine_topk(
                emb, F.array(*[F.lit(x) for x in v]), k=K
            ).collect()
        }

    def recall(fn):
        hits = sum(len(truth[q] & {r[0] for r in fn(q).collect()}) for q in qvecs)
        return hits / (K * len(qvecs))

    out = {
        "gemm": recall(
            lambda q: similarity.cosine_topk_vectorized(emb, qvecs[q], k=K)
        ),
        "medoid_p1": recall(
            lambda q: similarity.medoid_ivf_topk(emb, query_id=q, k=K, nprobe=1)
        ),
        "medoid_p3": recall(
            lambda q: similarity.medoid_ivf_topk(emb, query_id=q, k=K, nprobe=3)
        ),
    }
    emb_sk = similarity.with_hyperplane_sketch(emb).cache()
    fracs = []

    def _lsh(q):
        res, cand = lsh_topk(emb_sk, qvecs[q], n_bands=4)
        fracs.append(cand.count() / n)
        return res

    out["lsh_b4"] = recall(_lsh)
    out["lsh_b4_cand_frac"] = sum(fracs) / len(fracs)
    emb_sk.unpersist()
    emb.unpersist()
    return out


def test_recall_floors(spark):
    r = _recalls(spark)
    # exact lanes are exact
    assert r["gemm"] == 1.0
    # pruning lanes: committed floors from the curve artifact (observed
    # sf0.01 values 0.29/0.58/0.41 across the 8-query harness; floors
    # leave margin for the 4-query CI subset)
    assert r["medoid_p1"] >= 0.15
    assert r["medoid_p3"] >= 0.40
    assert r["medoid_p3"] >= r["medoid_p1"]  # monotone in nprobe
    assert r["lsh_b4"] >= 0.30
    # and LSH must actually PRUNE while doing it
    assert r["lsh_b4_cand_frac"] < 0.5
