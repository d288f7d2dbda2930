"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a narrow per-row higher-order
expression (zip_with dot product) + TakeOrderedAndProject; scales linearly
and parallelizes perfectly, the right baseline even at 100 TB when the
query set is small.

Scale paths:
- IVF: restrict the scan to the query's cluster partition(s). Here the
  fixture's `label` column stands in for a trained coarse quantizer (at
  production scale: KMeans from pyspark.ml, centroid assignment at write
  time, partitioned/bucketed storage by cluster id -> partition pruning
  turns top-k into a fraction-of-corpus scan).
- Random-hyperplane LSH: sign-bit sketches give Hamming pre-filtering
  (simhash-style); deterministic hyperplanes derived from md5 of
  (plane_id, dim) so plans replay identically.

All dot products are computed in array order with double accumulation —
bit-identical across engines that do the same (DuckDB list_* functions do).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two float arrays (double accumulation, array order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    query_vec: Column,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Brute-force cosine top-k of ``query_vec`` against the corpus.

    Deterministic ordering: (cosine DESC rounded, id ASC).
    """
    scored = corpus.withColumn(
        "cosine_sim", F.round(cosine(F.col(vec_col), query_vec), round_to)
    )
    return (
        scored.orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "cosine_sim")
    )


def ivf_topk(
    corpus: DataFrame,
    query_vec: Column,
    query_cluster: Column,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "label",
    round_to: int = 6,
) -> DataFrame:
    """IVF-style search: scan only the query's coarse cluster.

    With cluster-partitioned storage the filter becomes partition pruning —
    the scan reads |corpus|/n_clusters. (nprobe>1 = filter on a cluster set.)
    """
    return cosine_topk(
        corpus.filter(F.col(cluster_col) == query_cluster),
        query_vec,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        round_to=round_to,
    )


def pairwise_cosine_topk(
    corpus: DataFrame,
    k_pairs: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Top-k most-similar embedding PAIRS (near-dup detection by cosine).

    Brute-force all-pairs — correct baseline at fixture scale; the scale
    path is LSH/IVF blocking to bound the candidate set (see
    dedupfns.minhash_candidate_pairs for the blocking pattern).
    """
    a = corpus.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a")
    )
    b = corpus.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b")
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    scored = pairs.withColumn(
        "cosine_sim", F.round(cosine(F.col("vec_a"), F.col("vec_b")), round_to)
    )
    return (
        scored.orderBy(
            F.col("cosine_sim").desc(), F.col("id_a").asc(), F.col("id_b").asc()
        )
        .limit(k_pairs)
        .select("id_a", "id_b", "cosine_sim")
    )


def kmeans_ivf_topk(
    corpus: DataFrame,
    query_id: int = 0,
    k: int = 10,
    n_clusters: int = 8,
    seed: int = 42,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF with a TRAINED coarse quantizer (pyspark.ml KMeans) instead of a
    precomputed label: fit centroids, assign every vector, search the
    ``nprobe`` cells whose centroids are nearest the query by squared
    Euclidean distance (the quantizer's own assignment metric), always
    including the query's assigned cell.

    The production shape: train once offline, write cluster ids into the
    table (partition/bucket by them), and the per-query filter becomes
    partition pruning over nprobe cells. Multi-probe matters: k-means||
    initialization depends on the input partition layout, so single-cell
    recall is fragile — probing the 3 nearest of 8 cells keeps recall
    stable across layouts at ~3/8 of the scan. Not oracle-checked
    (k-means|| is not SQL-reproducible) — correctness is asserted by
    recall-vs-brute-force tests.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    featured = corpus.withColumn(
        "_features", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    model = KMeans(
        featuresCol="_features", k=n_clusters, seed=seed, maxIter=10
    ).fit(featured)
    assigned = model.transform(featured).withColumnRenamed("prediction", "_cell")

    # One-row driver fetch of the query vector; centroid ranking is a few
    # dozen dot products driver-side (the IVF routing table is tiny by
    # construction — this is what an ANN index stores in memory).
    row = (
        assigned.filter(F.col(id_col) == query_id)
        .select(F.col(vec_col).cast("array<double>"), F.col("_cell"))
        .first()
    )
    if row is None:  # absent query id: empty result, not a TypeError
        return corpus.sparkSession.createDataFrame(
            [], f"{id_col} long, cosine_sim double"
        )
    qv, q_cell = row[0], row[1]

    def _sq_l2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    # Probe cells ranked by SQUARED EUCLIDEAN distance — the same metric
    # KMeans uses for assignment (cosine ranking could skip the query's own
    # cell for unnormalized vectors); the model-assigned cell is always
    # force-included so recall never silently drops to zero.
    centers = [list(c) for c in model.clusterCenters()]
    ranked = sorted(range(len(centers)), key=lambda i: _sq_l2(qv, centers[i]))
    probe_cells = list(
        dict.fromkeys([q_cell, *ranked[: max(1, nprobe)]])
    )[: max(1, nprobe)]

    query = assigned.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("query_vec")
    )
    cand = (
        assigned.filter(F.col(id_col) != query_id)
        .filter(F.col("_cell").isin(probe_cells))
        .crossJoin(F.broadcast(query))
    )
    scored = cand.withColumn(
        "cosine_sim", F.round(cosine(F.col(vec_col), F.col("query_vec")), 6)
    )
    return (
        scored.orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "cosine_sim")
    )


def medoid_ivf_topk(
    corpus: DataFrame,
    query_id: int = 0,
    k: int = 10,
    n_cells: int = 8,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """IVF with a DETERMINISTIC hash-seeded medoid quantizer — the
    SQL-reproducible split of quantization from search.

    Cells are the ``n_cells`` corpus vectors with the lexicographically
    smallest ``md5(cast(id as string))`` (a deterministic uniform sample —
    the k-medoid stand-in for a trained coarse quantizer, which k-means||
    cannot reproduce in SQL). Every vector is assigned to the medoid
    minimizing squared Euclidean distance (ties -> smaller medoid id); the
    query probes its ``nprobe`` nearest cells by the same metric, which by
    construction always includes its own assigned cell.

    Scale shape: the medoid set is a TakeOrderedAndProject (top-8 by hash),
    collected driver-side as the ANN routing table (8x64 floats — what any
    IVF index keeps in memory); assignment is a per-row codegen expression
    against literal centroids (no join, no shuffle); the probe filter prunes
    the scan to ~nprobe/n_cells of the corpus (partition pruning once the
    table is written bucketed by cell); top-k is TakeOrderedAndProject.

    All distances accumulate doubles in array index order on every engine
    (Spark fold, DuckDB list_sum, driver-side Python loop), so argmin ties
    and probe routing are bit-identical — the DuckDB oracle replays the
    exact arithmetic.
    """
    sess = corpus.sparkSession
    empty_schema = f"{id_col} long, cosine_sim double"

    medoids = [
        (r[0], list(r[1]))
        for r in corpus.select(
            F.col(id_col), F.col(vec_col).cast("array<double>")
        )
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_cells)
        .collect()
    ]
    qrow = (
        corpus.filter(F.col(id_col) == query_id)
        .select(F.col(vec_col).cast("array<double>"))
        .first()
    )
    if qrow is None or not medoids:
        return sess.createDataFrame([], empty_schema)
    qv = list(qrow[0])

    def _sq_l2(a, b):
        acc = 0.0  # plain left fold in index order — matches both engines
        for x, y in zip(a, b):
            d = x - y
            acc += d * d
        return acc

    probe_cells = [
        cid
        for cid, _ in sorted(
            ((cid, _sq_l2(qv, mv)) for cid, mv in medoids),
            key=lambda t: (t[1], t[0]),
        )[: max(1, nprobe)]
    ]

    def _dist_expr(mv: list[float]) -> Column:
        diff2 = F.zip_with(
            F.col(vec_col),
            F.array(*[F.lit(x) for x in mv]),
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        )
        return F.aggregate(diff2, F.lit(0.0), lambda acc, v: acc + v)

    cell_structs = F.array(
        *[
            F.struct(
                _dist_expr(mv).alias("dist"),
                F.lit(cid).cast("long").alias("cell_id"),
            )
            for cid, mv in medoids
        ]
    )
    # array_min on (dist, cell_id) structs = argmin with the id tie-break
    assigned = corpus.withColumn(
        "_cell", F.array_min(cell_structs).getField("cell_id")
    )
    q_lit = F.array(*[F.lit(x) for x in qv])
    scored = (
        assigned.filter(F.col(id_col) != query_id)
        .filter(F.col("_cell").isin(probe_cells))
        .withColumn(
            "cosine_sim", F.round(cosine(F.col(vec_col), q_lit), round_to)
        )
    )
    return (
        scored.orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "cosine_sim")
    )


def hyperplane_sketch(vec: Column, n_planes: int = 16, dim: int = 64) -> Column:
    """Random-hyperplane LSH sign sketch as a BIGINT (deterministic planes).

    Plane p's component d is +1 if bit0 of md5(p|d) is set else -1 —
    reproducible everywhere, no RNG state. At scale, precompute planes as a
    literal array once (driver-side) instead of hashing per row.
    """
    plane_signs = [
        [
            1 if int(_md5_hex(f"{p}|{d}")[0], 16) % 2 == 1 else -1
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]
    bits = []
    for p, signs in enumerate(plane_signs):
        signed = F.zip_with(
            vec,
            F.array(*[F.lit(s) for s in signs]),
            lambda x, s: x.cast("double") * s.cast("double"),
        )
        proj = F.aggregate(signed, F.lit(0.0), lambda acc, v: acc + v)
        bits.append(F.when(proj > 0, F.lit(2 ** p)).otherwise(F.lit(0)).cast("bigint"))
    total = bits[0]
    for extra in bits[1:]:
        total = total + extra
    return total


def _md5_hex(s: str) -> str:
    import hashlib

    return hashlib.md5(s.encode()).hexdigest()


def plane_signs(n_planes: int = 16, dim: int = 64) -> list[list[int]]:
    """The deterministic hyperplane sign matrix (shared with SQL oracles)."""
    return [
        [1 if int(_md5_hex(f"{p}|{d}")[0], 16) % 2 == 1 else -1 for d in range(dim)]
        for p in range(n_planes)
    ]


def with_hyperplane_sketch(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 16,
    out_col: str = "_sk",
    dim: int = 64,
) -> Column:
    """Arrow-lane twin of :func:`hyperplane_sketch`: appends the sketch
    column via one mapInPandas pass instead of 16 interpreted HOF
    aggregates per row.

    BIT-IDENTICAL to the HOF (and to the DuckDB list_sum oracles) because
    the projection accumulates in the SAME dimension order — one
    vectorized add per d, sequential over d — so the IEEE rounding
    sequence of every row's dot product matches the per-row fold exactly;
    a pairwise/numpy-dot summation would round differently and could flip
    near-zero signs. Measured: the 100k-vector hot-bucket probe's sketch
    cost drops from minutes (16 x 64 interpreted lambda evals per row) to
    sub-second.
    """
    import numpy as np
    import pandas as pd  # noqa: F401  (mapInPandas contract)

    from pyspark.sql.types import LongType, StructField, StructType

    signs = np.array(plane_signs(n_planes, dim), dtype=np.float64)
    out_schema = StructType(list(df.schema.fields) + [StructField(out_col, LongType())])

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bits = np.zeros(len(pdf), dtype=np.int64)
            for p in range(n_planes):
                acc = np.zeros(len(pdf), dtype=np.float64)
                for d in range(dim):
                    acc = acc + mat[:, d] * signs[p, d]  # HOF fold order
                bits |= (acc > 0).astype(np.int64) << p
            pdf = pdf.copy()
            pdf[out_col] = bits
            yield pdf

    return df.mapInPandas(run, out_schema)


def lsh_candidate_pairs(
    corpus: DataFrame,
    n_planes: int = 16,
    band_size: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-blocked embedding pairs: same sketch band in >=1 of the bands.

    The scale path for embedding near-dup: shuffle ∝ vectors x n_bands on
    uniformly distributed band keys (never vectors²); exact cosine runs on
    candidates only. Recall tunes with band_size (smaller bands = higher
    recall, more candidates).
    """
    n_bands = n_planes // band_size
    sketched = with_hyperplane_sketch(
        corpus.select(F.col(id_col), F.col(vec_col)), vec_col, n_planes, "_sk"
    )
    mask = (1 << band_size) - 1
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.shiftright(F.col("_sk"), b * band_size)
                .bitwiseAND(F.lit(mask))
                .alias("band_val"),
            )
            for b in range(n_bands)
        ]
    )
    banded = sketched.select(
        id_col, F.explode(bands).alias("band")
    ).select(id_col, "band.band_id", "band.band_val")
    a = banded.alias("a")
    b = banded.alias("b")
    # dedupe candidate (id_a, id_b) pairs BEFORE attaching vectors: the
    # dropDuplicates shuffle then carries 16 bytes/row instead of two
    # embeddings (|candidates| >> |corpus|, so vectors join back cheaper)
    ids = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    # AQE sizes the post-dedup stage by BYTES (16-byte id pairs → 1-3
    # partitions) but the downstream per-pair cosine is CPU-bound (64-dim
    # HOF arithmetic) — measured 11 s on 3 tasks at sf0.1. A cheap
    # round-robin of the skinny pairs restores full-width parallelism; at
    # real scale candidate volume keeps the stage wide and this is a
    # no-op-sized shuffle either way.
    ids = ids.repartition(ids.sparkSession.sparkContext.defaultParallelism)
    vecs = corpus.select(F.col(id_col), F.col(vec_col))
    return (
        ids.join(
            vecs.select(
                F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a")
            ),
            "id_a",
        ).join(
            vecs.select(
                F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b")
            ),
            "id_b",
        )
    )


def cosine_topk_vectorized(
    corpus: DataFrame,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Arrow-vectorized brute-force cosine top-k: mapInPandas batches the
    corpus through numpy matmul (one BLAS GEMV per Arrow batch) instead of
    the per-element higher-order-function fold. Same output contract as
    cosine_topk — (id, cosine_sim rounded) ordered (sim DESC, id ASC).

    This is the UDF-guideline fast path from the brief: when Python is
    unavoidable (or, as here, when the JVM expression is interpreted
    per-element), Arrow-batched beats row-at-a-time by orders of
    magnitude. Each batch emits only its local top-k (bounded output per
    task — the reduce side handles k·n_batches rows, never the corpus),
    then TakeOrderedAndProject picks the global winners with the same
    rounded-sim/id tie-break, so ties at the boundary resolve identically
    to the HOF plan and the DuckDB oracle.

    ``query_vec`` is a host-side float sequence (the query point is a
    scalar parameter of the search, like KMeans centers — not distributed
    state).
    """
    import numpy as np
    import pandas as pd

    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.sqrt((q * q).sum()))

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            sims = (mat @ q) / (np.sqrt((mat * mat).sum(axis=1)) * qn)
            out = pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "cosine_sim": np.round(sims, round_to)}
            )
            yield out.sort_values(
                ["cosine_sim", id_col], ascending=[False, True]
            ).head(k)

    scored = corpus.select(id_col, vec_col).mapInPandas(
        score, f"{id_col} long, cosine_sim double"
    )
    return scored.orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc()).limit(k)


def semdedup_prune(
    corpus: DataFrame,
    n_cells: int = 16,
    tau: float = 0.30,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public
    arXiv:2303.09540): cluster the embedding space with a coarse
    quantizer, then WITHIN each cluster drop every vector that has a
    higher-priority near-duplicate (cosine >= tau, priority = smaller id).
    Returns per-cell accounting: cell_id, n_members, n_kept, n_dropped.

    Quantizer: the same deterministic hash-seeded medoids as
    medoid_ivf_topk (n_cells corpus vectors with smallest md5(id)), so the
    whole pipeline — assignment, pairing, threshold — replays in SQL for
    the DuckDB oracle; a production run would swap in trained KMeans
    centers without touching the shape.

    Scale shape: assignment is a scan-side codegen argmin against literal
    centroids (no join); the candidate-pair stage is a SELF-JOIN ON CELL
    ID — shuffle and quadratic work are both per-cell, and SemDeDup's own
    recipe scales n_cells with corpus size (~sqrt n) so cell populations
    stay bounded; the drop rule is one distinct over the pair output.
    The fixture's synthetic embeddings top out at pair cosine ~0.51, so
    tau=0.30 sits inside the observed range to exercise the prune path
    (real text-embedding deployments use ~0.9+).
    """
    sess = corpus.sparkSession
    medoids = [
        (r[0], list(r[1]))
        for r in corpus.select(
            F.col(id_col), F.col(vec_col).cast("array<double>")
        )
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_cells)
        .collect()
    ]
    if not medoids:
        return sess.createDataFrame(
            [], "cell_id long, n_members bigint, n_kept bigint, n_dropped bigint"
        )

    if os.environ.get("SVH_SEMDEDUP_ARROW", "1") == "1":
        # r13 (guide §4.2): assignment + within-cell prune as two numpy
        # kernels instead of a K-medoid HOF argmin per row plus an
        # O(m^2)-row self-join with a per-pair HOF cosine (the r12
        # profile shows 24 s executorRunTime in the pair stage and 13 s
        # in assignment at sf0.1). Assignment distances replicate the
        # Catalyst fold's operation order exactly (elementwise
        # (x-y)*(x-y), left-to-right accumulation, medoids visited in
        # ascending cell_id with strict < — same argmin tie-break as
        # array_min over struct(dist, cell_id)). The pair cosine uses
        # one blocked GEMM per cell with round-to-6 before the tau
        # comparison — the same rounding contract (and the same GEMM
        # precedent) as cosine_topk_vectorized; oracle hash equality at
        # all three SFs gates it. SVH_SEMDEDUP_ARROW=0 keeps the old
        # plan for A/B.
        med = sorted(medoids)  # ascending cell_id for first-wins argmin

        def assign_kernel(it):
            import numpy as np  # noqa: PLC0415
            import pandas as pd  # noqa: PLC0415

            mvs = [np.asarray(mv, dtype=np.float64) for _, mv in med]
            cids = np.array([cid for cid, _ in med], dtype=np.int64)
            for pdf in it:
                if not len(pdf):
                    continue
                X = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
                best_d = None
                best_c = None
                for j, mv in enumerate(mvs):
                    a = np.zeros(len(X), dtype=np.float64)
                    for d in range(X.shape[1]):
                        t = X[:, d] - mv[d]
                        a = a + t * t
                    if best_d is None:
                        best_d, best_c = a, np.full(
                            len(X), cids[j], dtype=np.int64
                        )
                    else:
                        upd = a < best_d
                        best_d = np.where(upd, a, best_d)
                        best_c = np.where(upd, cids[j], best_c)
                yield pd.DataFrame(
                    {
                        "cell_id": best_c,
                        "_id": pdf["_id"].to_numpy(),
                        "_v": pdf["_v"].to_numpy(),
                    }
                )

        def cell_kernel(pdf):
            import numpy as np  # noqa: PLC0415
            import pandas as pd  # noqa: PLC0415

            order = np.argsort(pdf["_id"].to_numpy(), kind="stable")
            X = np.stack(pdf["_v"].to_numpy()[order]).astype(np.float64)
            m = len(X)
            cell = int(pdf["cell_id"].iloc[0])
            if m < 2:
                return pd.DataFrame(
                    {"cell_id": [cell], "n_members": [m], "n_dropped": [0]}
                )
            norms = np.sqrt((X * X).sum(axis=1))
            dropped = np.zeros(m, dtype=bool)
            block = max(1, min(4096, (64 << 20) // (8 * m)))
            col = np.arange(m)
            for lo in range(0, m, block):
                hi = min(lo + block, m)
                sims = (X[lo:hi] @ X.T) / (
                    norms[lo:hi, None] * norms[None, :]
                )
                q = np.round(sims, 6) >= tau
                q &= col[None, :] > np.arange(lo, hi)[:, None]
                dropped |= q.any(axis=0)
            return pd.DataFrame(
                {
                    "cell_id": [cell],
                    "n_members": [m],
                    "n_dropped": [int(dropped.sum())],
                }
            )

        assigned = corpus.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        ).mapInPandas(
            assign_kernel, "cell_id long, _id long, _v array<double>"
        )
        out = assigned.groupBy("cell_id").applyInPandas(
            cell_kernel, "cell_id long, n_members long, n_dropped long"
        )
        return out.select(
            F.col("cell_id").cast("long").alias("cell_id"),
            F.col("n_members"),
            (F.col("n_members") - F.col("n_dropped")).alias("n_kept"),
            F.col("n_dropped"),
        ).orderBy("cell_id")

    def _dist_expr(mv: list[float]) -> Column:
        diff2 = F.zip_with(
            F.col(vec_col),
            F.array(*[F.lit(x) for x in mv]),
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        )
        return F.aggregate(diff2, F.lit(0.0), lambda acc, v: acc + v)

    cell_structs = F.array(
        *[
            F.struct(
                _dist_expr(mv).alias("dist"),
                F.lit(cid).cast("long").alias("cell_id"),
            )
            for cid, mv in medoids
        ]
    )
    assigned = corpus.select(id_col, vec_col).withColumn(
        "cell_id", F.array_min(cell_structs).getField("cell_id")
    )
    a = assigned.select(
        F.col("cell_id"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
    )
    b = assigned.select(
        F.col("cell_id").alias("cell_b"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
    )
    dropped = (
        a.join(b, (a.cell_id == b.cell_b) & (F.col("id_a") < F.col("id_b")))
        .filter(
            F.round(cosine(F.col("vec_a"), F.col("vec_b")), round_to)
            >= F.lit(tau)
        )
        .select("cell_id", "id_b")
        .distinct()
        .groupBy("cell_id")
        .agg(F.count(F.lit(1)).alias("n_dropped"))
    )
    members = assigned.groupBy("cell_id").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    return (
        members.join(dropped, "cell_id", "left")
        .select(
            F.col("cell_id").cast("long").alias("cell_id"),
            "n_members",
            (
                F.col("n_members") - F.coalesce(F.col("n_dropped"), F.lit(0))
            ).alias("n_kept"),
            F.coalesce(F.col("n_dropped"), F.lit(0)).alias("n_dropped"),
        )
        .orderBy("cell_id")
    )



_VEC_TILE = 1024  # numpy block edge for the pair GEMM (8 MB float64 tile)


def lsh_rebanded_keys(
    corpus: DataFrame,
    n_planes: int = 16,
    band_size: int = 2,
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_cap: int | None = 8192,
    max_extra_levels: int = 6,
) -> DataFrame:
    """(id, vec, bkey) for the banded pair scorer with every bucket bounded
    where the sketch entropy allows — duplicate-vector collapse, level-0
    contiguous sketch bands, then recursive hot-bucket re-band on fresh
    bit partitions. Exposed separately so tests can assert the post-split
    bucket-size distribution directly."""
    from shortvideohybridanalyticslakehouse_spark.functions.dedupfns import (
        collapse_to_smallest_ids,
        reband_hot_buckets,
    )

    if n_planes % band_size != 0:
        raise ValueError(
            f"n_planes ({n_planes}) must be divisible by band_size "
            f"({band_size}): the re-band levels partition ALL sketch bits "
            "into equal groups (the pigeonhole invariant)."
        )
    n_bands = n_planes // band_size
    mask = (1 << band_size) - 1
    base = corpus.select(F.col(id_col), F.col(vec_col))
    if bucket_cap is not None:
        # Lossless duplicate-vector pre-shrink: only the k+1 smallest ids
        # per identical embedding can appear in the (cos, id_a, id_b)-ordered
        # top-k (any later id is dominated by k same-cosine smaller-lex
        # pairs). Keyed on xxhash64 of the raw vector — a 2^-64 collision
        # would wrongly co-collapse two distinct vectors; acceptable against
        # the mass-duplicate OOM it prevents.
        base = collapse_to_smallest_ids(
            base, F.xxhash64(F.col(vec_col)), id_col, k + 1
        )
    sketched = with_hyperplane_sketch(
        base.select(F.col(id_col), F.col(vec_col)), vec_col, n_planes, "_sk"
    )
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.shiftright(F.col("_sk"), b * band_size)
                .bitwiseAND(F.lit(mask))
                .alias("band_val"),
            )
            for b in range(n_bands)
        ]
    )
    banded = (
        sketched.select(id_col, vec_col, "_sk", F.explode(bands).alias("band"))
        .withColumn(
            "bkey",
            F.concat_ws(
                "", F.lit("B"), F.col("band.band_id"), F.lit(":"), F.col("band.band_val")
            ),
        )
        .select(id_col, vec_col, "_sk", "bkey")
    )
    if bucket_cap is None:
        return banded.drop("_sk")

    def sub_val(sk: Column, lvl: int, g: int) -> Column:
        # Level lvl groups sketch bit p by (p * s) % n_planes // band_size
        # with s odd. When gcd(s, n_planes) == 1 this is a bijection on
        # Z_{n_planes}, so each level is a FRESH partition of all n_planes
        # bits into n_bands equal groups — pigeonhole holds per level, and
        # chains of levels constrain fresh bits. For n_planes sharing a
        # factor with s (e.g. n_planes=15 at lvl=1) some groups receive no
        # bits; those degrade safely to a constant 0 sub-key (no split from
        # that group, never an invalid Column).
        s = 2 * lvl + 1
        bits = [
            p for p in range(n_planes) if ((p * s) % n_planes) // band_size == g
        ]
        if not bits:
            return F.lit(0)
        val = None
        for j, p in enumerate(bits):
            term = F.shiftleft(
                F.shiftright(sk, p).bitwiseAND(F.lit(1)), j
            )
            val = term if val is None else val.bitwiseOR(term)
        return val

    out = reband_hot_buckets(
        banded, "_sk", sub_val, n_bands, bucket_cap, max_extra_levels
    )
    return out.drop("_sk")


def lsh_bucket_topk_pairs(
    corpus: DataFrame,
    n_planes: int = 16,
    band_size: int = 2,
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    bucket_cap: int | None = 8192,
    max_extra_levels: int = 6,
) -> DataFrame:
    """Top-k most-similar pairs over LSH band buckets WITHOUT materializing
    the candidate pair set: one applyInPandas per bucket runs the bucket
    through a numpy GEMM and emits only its local top-k pairs under the
    global total order (cos DESC, id_a, id_b).

    Same output contract as scoring lsh_candidate_pairs pair-by-pair (a
    global-top-k pair is by definition inside the top-k of every bucket
    that contains it, so per-bucket pruning is lossless), but the plan
    never shuffles |candidates| rows: the only wide exchange is the
    banded corpus itself (vectors x n_bands rows), and Python sees each
    bucket once as an Arrow batch. Measured at sf0.1/band_size=2 this
    replaces an 11.6 s pair-join + per-element HOF cosine plan with a
    sub-second GEMM.

    Hot buckets are bounded by three composed mechanisms (see the
    dedupfns hot-bucket block comment): a lossless duplicate-vector
    collapse to the k+1 smallest ids per identical embedding, a
    Spark-side recursive re-band of buckets past ``bucket_cap`` onto
    fresh sketch-bit partitions (a pair differing in <= n_bands-1 sketch
    bits keeps an intact group every level; pairs beyond that radius in
    an over-cap bucket may drop — standard LSH behavior), and a blocked
    GEMM so a residual giant bucket (many distinct vectors sharing one
    full sketch — raise n_planes if this dominates) never allocates an
    m x m tile. ``bucket_cap=None`` disables all three (exact legacy
    behavior for the equivalence tests); default cap 8192 > every oracle
    fixture, so driver-checked results are bit-identical either way.
    """
    import numpy as np
    import pandas as pd

    banded = lsh_rebanded_keys(
        corpus,
        n_planes,
        band_size,
        k,
        id_col,
        vec_col,
        bucket_cap,
        max_extra_levels,
    )

    out_schema = "id_a long, id_b long, cosine_sim double"
    empty = {"id_a": "int64", "id_b": "int64", "cosine_sim": "float64"}

    def bucket_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        if m < 2:
            return pd.DataFrame({c: [] for c in empty}).astype(empty)
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        mat = np.stack(pdf[vec_col].to_numpy()[order]).astype(np.float64)
        normed = mat / np.sqrt((mat * mat).sum(axis=1, keepdims=True))
        if m <= _VEC_TILE:
            sims = np.round(normed @ normed.T, round_to)
            ia, ib = np.triu_indices(m, 1)  # ids sorted asc => id_a < id_b
            sa, id_a, id_b = sims[ia, ib], ids[ia], ids[ib]
            top = np.lexsort((id_b, id_a, -sa))[:k]
            return pd.DataFrame(
                {"id_a": id_a[top], "id_b": id_b[top], "cosine_sim": sa[top]}
            )
        # Residual over-cap bucket: blocked GEMM tiles with a running
        # top-k — peak extra memory is one _VEC_TILE^2 float64 tile.
        t = _VEC_TILE
        nb = (m + t - 1) // t
        cand = []
        for bi in range(nb):
            si, ei = bi * t, min((bi + 1) * t, m)
            blk = np.round(normed[si:ei] @ normed[si:ei].T, round_to)
            ia, ib = np.triu_indices(ei - si, 1)
            sa = blk[ia, ib]
            top = np.lexsort((ids[si:ei][ib], ids[si:ei][ia], -sa))[:k]
            cand.append((sa[top], ids[si:ei][ia][top], ids[si:ei][ib][top]))
            for bj in range(bi + 1, nb):
                sj, ej = bj * t, min((bj + 1) * t, m)
                tile = np.round(normed[si:ei] @ normed[sj:ej].T, round_to)
                flat = tile.ravel()
                a2 = np.repeat(ids[si:ei], ej - sj)
                b2 = np.tile(ids[sj:ej], ei - si)
                top = np.lexsort((b2, a2, -flat))[:k]
                cand.append((flat[top], a2[top], b2[top]))
        sa = np.concatenate([c[0] for c in cand])
        a2 = np.concatenate([c[1] for c in cand])
        b2 = np.concatenate([c[2] for c in cand])
        top = np.lexsort((b2, a2, -sa))[:k]
        return pd.DataFrame(
            {"id_a": a2[top], "id_b": b2[top], "cosine_sim": sa[top]}
        )

    local = banded.groupBy("bkey").applyInPandas(bucket_topk, out_schema)
    return (
        local.dropDuplicates(["id_a", "id_b"])
        .orderBy(F.col("cosine_sim").desc(), F.col("id_a").asc(), F.col("id_b").asc())
        .limit(k)
    )



def cosine_topk_batch(
    corpus: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Multi-query brute-force cosine top-k: ONE corpus pass serves the
    whole query set. The scale-probe finding this implements: the Arrow
    GEMM loses to the JVM fold on a single query because shipping the
    corpus through Arrow costs more than the numpy win — but the shipment
    amortizes over queries, and the per-batch work becomes one
    (batch x dim) @ (dim x n_queries) matmul instead of n_queries
    separate scans. This is the production ANN shape (search traffic
    arrives in batches), and the exact-scan baseline for recall checks.

    Each Arrow batch emits only its local top-k PER QUERY (bounded output:
    k x n_queries x n_batches rows); the global winners come from a tiny
    per-query window. Self-matches (corpus id == query id) are excluded.
    Output: (query_id, vec_id, cosine_sim) ordered per query by
    (sim DESC rounded, id ASC) — ties resolve identically to the
    per-query HOF/oracle plans.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window

    qids = np.array([q[0] for q in queries], dtype=np.int64)
    Q = np.stack([np.asarray(q[1], dtype=np.float64) for q in queries])
    Qn = Q / np.sqrt((Q * Q).sum(axis=1, keepdims=True))

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            normed = mat / np.sqrt((mat * mat).sum(axis=1, keepdims=True))
            sims = np.round(normed @ Qn.T, round_to)  # (batch, n_queries)
            outs = []
            for j, qid in enumerate(qids):
                col = sims[:, j]
                keep = ids != qid
                cids, csims = ids[keep], col[keep]
                top = np.lexsort((cids, -csims))[:k]
                outs.append(
                    pd.DataFrame(
                        {
                            "query_id": np.full(len(top), qid, dtype=np.int64),
                            id_col: cids[top],
                            "cosine_sim": csims[top],
                        }
                    )
                )
            yield pd.concat(outs, ignore_index=True)

    local = corpus.select(id_col, vec_col).mapInPandas(
        score, f"query_id long, {id_col} long, cosine_sim double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    )
    return (
        local.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
        .orderBy("query_id", F.col("cosine_sim").desc(), F.col(id_col).asc())
    )


def cosine_topk_arrow(
    corpus: DataFrame,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Brute-force cosine top-k via ``mapInArrow`` (Spark 4's pandas-free
    Arrow path): each RecordBatch is consumed as pyarrow buffers and
    scored with one numpy GEMV — no pandas Series materialization, no
    per-row Python objects, the lowest-overhead Python lane Spark offers.
    Same output contract (and DuckDB oracle) as cosine_topk /
    cosine_topk_vectorized: (id, cosine_sim rounded) by (sim DESC, id ASC).
    """
    import numpy as np
    import pyarrow as pa

    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.sqrt((q * q).sum()))

    def score(batches):
        for rb in batches:
            if rb.num_rows == 0:
                continue
            ids = rb.column(0).to_numpy(zero_copy_only=False)
            lists = rb.column(1)
            # fixed-width 64-dim vectors: flatten once, reshape — no
            # per-row list objects
            flat = lists.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            mat = flat.reshape(rb.num_rows, -1)
            sims = np.round(
                (mat @ q) / (np.sqrt((mat * mat).sum(axis=1)) * qn), round_to
            )
            top = np.lexsort((ids, -sims))[:k]
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids[top], type=pa.int64()),
                 pa.array(sims[top], type=pa.float64())],
                names=[id_col, "cosine_sim"],
            )

    scored = corpus.select(id_col, vec_col).mapInArrow(
        score, f"{id_col} long, cosine_sim double"
    )
    return scored.orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc()).limit(k)


def int_gram_stats(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    scale: int = 1_000_000,
) -> DataFrame:
    """EXACT integer second-moment sums for covariance/PCA over an
    embedding column: quantize each component to x_q = round(x * scale)
    (int64), then emit per-partition partial sums via one numpy GEMM —
    rows (i, j, s) with s = sum(x_qi * x_qj) for the full dim x dim grid,
    (i, -1, s) marginals s = sum(x_qi), and one (-1, -1, n) count row —
    reduced by a single groupBy(i, j) SUM.

    Integer quantization is the cross-engine determinism hinge: int64
    partial sums reassociate losslessly, so Spark's partition order and
    DuckDB's scan order produce the SAME covariance numerators, unlike
    float accumulation. Overflow headroom: |x_q| <= scale, so
    |sum x_qi x_qj| <= n * scale^2 — at scale 1e6 that caps n at ~9e6
    rows per full-precision build; larger corpora drop scale to 1e4-1e5.
    The cap is enforced in two layers: each partition raises past
    n_max = (2**63-1) // scale**2 local rows (partial sums would wrap
    first there), and the final cross-partition SUM runs under Spark 4's
    default ANSI mode, where int64 overflow raises instead of wrapping.

    Quantization is floor(x * scale + 0.5) — half-up, NOT banker's
    rounding — to match the DuckDB oracle's CAST(FLOOR(x*scale + 0.5) AS
    BIGINT) exactly on .5 ties (see queries_ext83 docstring).
    """
    import numpy as np
    import pandas as pd

    n_max = (2**63 - 1) // (scale * scale)

    def stats(batches):
        seen = 0
        for pdf in batches:
            if not len(pdf):
                continue
            seen += len(pdf)
            if seen > n_max:
                raise ValueError(
                    f"int_gram_stats overflow headroom exceeded: partition has "
                    f"{seen} rows > n_max={n_max} at scale={scale}; lower scale"
                )
            mat = np.floor(
                np.stack(pdf[vec_col].to_numpy()).astype(np.float64) * scale
                + 0.5
            ).astype(np.int64)
            gram = mat.T @ mat  # dim x dim int64 — exact
            marg = mat.sum(axis=0)
            ii, jj = np.meshgrid(np.arange(dim), np.arange(dim), indexing="ij")
            yield pd.DataFrame(
                {
                    "i": np.concatenate([ii.ravel(), np.arange(dim), [-1]]),
                    "j": np.concatenate(
                        [jj.ravel(), np.full(dim, -1), [-1]]
                    ),
                    "s": np.concatenate(
                        [gram.ravel(), marg, [len(pdf)]]
                    ).astype(np.int64),
                }
            )

    parts = df.select(id_col, vec_col).mapInPandas(
        stats, "i int, j int, s long"
    )
    return parts.groupBy("i", "j").agg(F.sum("s").alias("s"))


# ---------------------------------------------------------------------------
# IVF as a STORAGE LAYOUT: cells become parquet partitions, the probe
# filter becomes partition pruning (round 7 — the 100 TB path the
# medoid_ivf_topk docstring promises, made literal)
# ---------------------------------------------------------------------------


def ivf_medoids(
    corpus: DataFrame,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """The deterministic hash-seeded medoid routing table (same rule as
    medoid_ivf_topk): the n_cells vectors with the smallest
    md5(cast(id as string)), collected driver-side — the in-memory index
    any IVF implementation keeps (n_cells x dim floats)."""
    return [
        (r[0], list(r[1]))
        for r in corpus.select(
            F.col(id_col), F.col(vec_col).cast("array<double>")
        )
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_cells)
        .collect()
    ]


def ivf_cell_expr(
    medoids: list[tuple[int, list[float]]], vec_col: str = "embedding"
) -> Column:
    """Per-row nearest-medoid id (squared L2, smaller-id tie-break) as a
    codegen expression against literal centroids — no join, no shuffle."""
    cell_structs = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        F.col(vec_col),
                        F.array(*[F.lit(x) for x in mv]),
                        lambda x, y: (x.cast("double") - y)
                        * (x.cast("double") - y),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ).alias("dist"),
                F.lit(cid).cast("long").alias("cell_id"),
            )
            for cid, mv in medoids
        ]
    )
    return F.array_min(cell_structs).getField("cell_id")


def ivf_probe_cells(
    qv: list[float], medoids: list[tuple[int, list[float]]], nprobe: int
) -> list[int]:
    """The nprobe nearest cells to the query — a driver-side walk of the
    routing table, same index-order fold as the engine expressions."""

    def _sq_l2(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            d = x - y
            acc += d * d
        return acc

    return [
        cid
        for cid, _ in sorted(
            ((cid, _sq_l2(qv, mv)) for cid, mv in medoids),
            key=lambda t: (t[1], t[0]),
        )[: max(1, nprobe)]
    ]


def write_ivf_partitioned(
    corpus: DataFrame,
    path: str,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Publish the corpus PARTITIONED BY its IVF cell
    (``path/_cell=<medoid_id>/``). A probe-time filter on _cell then
    reaches the scan as a PartitionFilter: Spark lists and reads ONLY the
    probed cells' files — candidate fraction becomes I/O pruning, not
    post-scan filtering. Returns the routing table the reader needs."""
    medoids = ivf_medoids(corpus, n_cells, id_col, vec_col)
    assigned = corpus.withColumn("_cell", ivf_cell_expr(medoids, vec_col))
    # one file per cell: align writer tasks with the partition value
    assigned.repartition(n_cells, F.col("_cell")).write.mode(
        "overwrite"
    ).partitionBy("_cell").parquet(path)
    return medoids


def ivf_partition_pruned_topk(
    spark,
    path: str,
    medoids: list[tuple[int, list[float]]],
    qv: list[float],
    k: int = 10,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    exclude_id: int | None = None,
) -> DataFrame:
    """Top-k cosine over ONLY the probed cells of an IVF-partitioned
    layout. The isin(_cell) predicate prunes partitions at file-listing
    time (assert `PartitionFilters` in the scan, see
    tests/test_ivf_partition_pruning.py) — the plan any 100 TB ANN
    serving path wants: I/O ∝ nprobe/n_cells."""
    probe = ivf_probe_cells(qv, medoids, nprobe)
    df = spark.read.parquet(path).filter(F.col("_cell").isin(probe))
    if exclude_id is not None:
        df = df.filter(F.col(id_col) != exclude_id)
    q_lit = F.array(*[F.lit(float(x)) for x in qv])
    scored = df.withColumn(
        "cosine_sim", F.round(cosine(F.col(vec_col), q_lit), round_to)
    )
    return (
        scored.orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "cosine_sim")
    )
