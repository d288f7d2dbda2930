"""Integer-exact Lloyd k-means (ext91): the Spark training loop must
replay a pure-python reference exactly (same quantization, truncated
integer means, ties-to-lowest-k), and planted well-separated clusters
must be recovered perfectly."""

from __future__ import annotations

import numpy as np

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

_D = 64
_K = 4
_ROUNDS = 3
_SCALE = 1_000_000


def _py_lloyd(mat):
    q = np.floor(mat.astype(np.float32).astype(np.float64) * _SCALE + 0.5
                 ).astype(np.int64)
    cents = [q[k].copy() for k in range(_K)]

    def trunc_div(s, n):
        return -((-s) // n) if s < 0 else s // n

    assign = None
    for _ in range(_ROUNDS):
        dists = np.stack(
            [((q - c) ** 2).sum(axis=1) for c in cents], axis=1
        )
        assign = dists.argmin(axis=1)  # argmin ties -> lowest index
        new = []
        for k in range(_K):
            members = q[assign == k]
            if len(members):
                sums = members.sum(axis=0)
                new.append(
                    np.array(
                        [trunc_div(int(s), len(members)) for s in sums],
                        dtype=np.int64,
                    )
                )
            else:
                new.append(cents[k])
        cents = new
    out = {}
    for k in range(_K):
        members = q[assign == k]
        inertia = int(((members - cents[k]) ** 2).sum())
        out[k] = (
            len(members),
            inertia,
            int(np.abs(cents[k]).sum()),
        )
    return out


def test_lloyd_matches_python_reference(spark, tmp_path):
    rng = np.random.default_rng(3)
    # planted: 4 well-separated centers; first K vectors are one per
    # cluster so the id-based init starts in distinct basins
    centers = rng.normal(0, 1.0, size=(_K, _D))
    rows = []
    mat = []
    vid = 0
    for k in range(_K):
        mat.append(centers[k] + rng.normal(0, 0.02, _D))
        rows.append((vid, [float(x) for x in mat[-1]], k))
        vid += 1
    for i in range(200):
        k = i % _K
        mat.append(centers[k] + rng.normal(0, 0.05, _D))
        rows.append((vid, [float(x) for x in mat[-1]], k))
        vid += 1
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    reg = load_all()
    got = {
        r.cluster: (r.n_members, r.inertia, r.centroid_abs_sum)
        for r in reg["kmeans_lloyd_integer"][0](spark, str(tmp_path)).collect()
    }
    want = _py_lloyd(np.stack(mat))
    assert got == want
    # well-separated fixture: every cluster recovered 51 members
    assert sorted(n for n, _, _ in got.values()) == [51, 51, 51, 51]
