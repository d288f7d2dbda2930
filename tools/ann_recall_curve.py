"""ANN recall-vs-cost curve harness (VERDICT r6 #7).

One run produces the which-lane-at-what-scale table: for each corpus
scale factor, every search lane's mean recall@k against the brute-force
ground truth over the same Q query vectors, with mean per-query wall and
(for pruning lanes) the scanned-candidate fraction.

Lanes:
  brute      cosine_topk            exact HOF linear scan (ground truth)
  gemm       cosine_topk_vectorized exact Arrow/numpy scan (recall 1.0
                                    by construction — sanity row)
  medoid-pN  medoid_ivf_topk        deterministic-medoid IVF, nprobe=N
                                    of 8 cells (scan ~ N/8)
  kmeans-p3  kmeans_ivf_topk        trained quantizer, nprobe=3 of 8
                                    (train time amortized: index_build)
  lsh-bB     hyperplane sketch, B bands x (16/B) bits, OR-of-bands
             candidate filter, exact cosine over candidates

Usage:
    python tools/ann_recall_curve.py [sf_dir] [factors...]   # default sf0.1, 1 10

Prints one JSON line per (factor, lane) and a paste-ready markdown table
at the end. The recall floors asserted by tests/test_ann_recall_floors.py
are the committed contract derived from this harness.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + (
    os.pathsep + os.environ["PYTHONPATH"] if os.environ.get("PYTHONPATH") else ""
)

import numpy as np

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions import similarity
from shortvideohybridanalyticslakehouse_spark.session import get_spark

K = 10
QUERY_IDS = [0, 7, 33, 101, 250, 311, 404, 499]
N_PLANES = 16


def query_sketch(qvec: list[float], n_planes: int = N_PLANES) -> int:
    """Driver-side sketch of a query vector — SAME fold order as
    with_hyperplane_sketch so bucket routing is bit-identical."""
    signs = np.array(similarity.plane_signs(n_planes, len(qvec)), dtype=np.float64)
    v = np.array(qvec, dtype=np.float64)
    bits = 0
    for p in range(n_planes):
        acc = 0.0
        for d in range(len(qvec)):
            acc = acc + v[d] * signs[p, d]
        if acc > 0:
            bits |= 1 << p
    return bits


def lsh_topk(emb_sk, qvec: list[float], n_bands: int, k: int = K):
    """OR-of-bands candidate filter + exact cosine over candidates.
    Returns (result_df, candidate_count_df) — candidates evaluated lazily
    so the filter fuses into one scan."""
    band_bits = N_PLANES // n_bands
    mask = (1 << band_bits) - 1
    q_sk = query_sketch(qvec)
    cond = None
    for b in range(n_bands):
        qband = (q_sk >> (b * band_bits)) & mask
        c = (
            F.shiftright(F.col("_sk"), b * band_bits).bitwiseAND(F.lit(mask))
            == F.lit(qband)
        )
        cond = c if cond is None else (cond | c)
    cand = emb_sk.filter(cond)
    return (
        similarity.cosine_topk(
            cand.select("vec_id", "embedding"),
            F.array(*[F.lit(float(x)) for x in qvec]),
            k=k,
        ),
        cand,
    )


def run_factor(spark, sf_dir: str, factor: int, include_kmeans: bool) -> list[dict]:
    from tools.scale_probe_ann import scaled_embeddings

    emb = scaled_embeddings(spark, sf_dir, factor).cache()
    n = emb.count()

    qvecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id").isin(QUERY_IDS)).collect()
    }
    qids = [q for q in QUERY_IDS if q in qvecs]

    truth: dict[int, set] = {}
    rows: list[dict] = []

    def lane(name, fn, index_build=0.0, cand_frac=None):
        hits, t0 = 0, time.time()
        for q in qids:
            got = [r[0] for r in fn(q).collect()]
            if name == "brute":
                truth[q] = set(got)
            hits += len(truth[q] & set(got))
        wall = (time.time() - t0) / len(qids)
        rec = round(hits / (K * len(qids)), 4)
        row = {
            "factor": factor,
            "n_vectors": n,
            "lane": name,
            "recall_at_10": rec,
            "mean_query_sec": round(wall, 3),
            "index_build_sec": round(index_build, 2),
            **({"candidate_fraction": cand_frac} if cand_frac is not None else {}),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    lane(
        "brute",
        lambda q: similarity.cosine_topk(
            emb, F.array(*[F.lit(x) for x in qvecs[q]]), k=K
        ),
    )
    lane("gemm", lambda q: similarity.cosine_topk_vectorized(emb, qvecs[q], k=K))
    for nprobe in (1, 2, 3, 4):
        lane(
            f"medoid-p{nprobe}",
            lambda q, np_=nprobe: similarity.medoid_ivf_topk(
                emb, query_id=q, k=K, n_cells=8, nprobe=np_
            ),
            cand_frac=round(nprobe / 8, 3),
        )
    if include_kmeans:
        lane(
            "kmeans-p3",
            lambda q: similarity.kmeans_ivf_topk(
                emb, query_id=q, k=K, n_clusters=8, nprobe=3
            ),
            cand_frac=round(3 / 8, 3),
        )

    t0 = time.time()
    emb_sk = similarity.with_hyperplane_sketch(emb, n_planes=N_PLANES).cache()
    emb_sk.count()
    sketch_build = time.time() - t0
    for n_bands in (2, 4):
        fracs = []
        def _lsh(q, nb=n_bands):
            res, cand = lsh_topk(emb_sk, qvecs[q], nb)
            fracs.append(cand.count() / n)
            return res
        lane(f"lsh-b{n_bands}", _lsh, index_build=sketch_build)
        rows[-1]["candidate_fraction"] = round(sum(fracs) / len(fracs), 4)
    emb_sk.unpersist()
    emb.unpersist()
    return rows


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factors = [int(a) for a in sys.argv[2:]] or [1, 10]
    spark = get_spark("svh-ann-recall")
    spark.sparkContext.setLogLevel("ERROR")
    all_rows = []
    for f in factors:
        all_rows += run_factor(spark, sf_dir, f, include_kmeans=(f == factors[0]))

    print("\n| factor | n | lane | recall@10 | mean query s | cand frac | index s |")
    print("|---|---|---|---|---|---|---|")
    for r in all_rows:
        print(
            f"| {r['factor']} | {r['n_vectors']:,} | {r['lane']} "
            f"| {r['recall_at_10']} | {r['mean_query_sec']} "
            f"| {r.get('candidate_fraction', '—')} | {r['index_build_sec']} |"
        )


if __name__ == "__main__":
    main()
