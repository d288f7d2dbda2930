"""IVF as a storage layout: the probe filter must reach the scan as a
PARTITION filter — I/O proportional to nprobe/n_cells — and return the
same top-k as the in-memory medoid path."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions.similarity import (
    ivf_partition_pruned_topk,
    ivf_probe_cells,
    medoid_ivf_topk,
    write_ivf_partitioned,
)
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

SF_DIR = "/root/testdata/sf0.01"


def _scan_metrics(df):
    """(numFiles, partition-filter present) from the executed scan."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()
    found = {"numFiles": None, "has_part_filter": False}

    def walk(node):
        s = node.toString().split("\n")[0]
        if "FileScan" in node.getClass().getSimpleName() or "Scan" in s:
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == "numFiles":
                    found["numFiles"] = int(kv._2().value())
        if "PartitionFilters: [" in node.toString() and "_cell" in node.toString():
            # non-empty partition filter list mentioning the cell column
            frag = node.toString().split("PartitionFilters: [", 1)[1]
            if not frag.startswith("]"):
                found["has_part_filter"] = True
        if node.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
        elif node.getClass().getSimpleName().endswith("QueryStageExec"):
            walk(node.plan())
        ch = node.children()
        for i in range(ch.length()):
            walk(ch.apply(i))

    walk(plan)
    return found


def test_partition_pruned_topk_matches_and_prunes(spark, tmp_path):
    corpus = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    path = os.path.join(str(tmp_path), "ivf_layout")
    medoids = write_ivf_partitioned(corpus, path, n_cells=8)
    # layout: one dir per cell, one data file per dir
    cells = [d for d in os.listdir(path) if d.startswith("_cell=")]
    assert len(cells) == 8
    for c in cells:
        files = [
            f for f in os.listdir(os.path.join(path, c)) if f.endswith(".parquet")
        ]
        assert len(files) == 1

    qv = [
        float(x)
        for x in corpus.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    pruned = ivf_partition_pruned_topk(
        spark, path, medoids, qv, k=10, nprobe=3, exclude_id=0
    )
    m = _scan_metrics(pruned)
    assert m["has_part_filter"], "probe filter must be a PartitionFilter"
    assert m["numFiles"] == 3, f"expected 3 of 8 cell files read, got {m}"

    # identical results to the in-memory medoid path (same routing rule)
    want = [
        (r[0], r[1])
        for r in medoid_ivf_topk(
            corpus, query_id=0, k=10, n_cells=8, nprobe=3
        ).collect()
    ]
    got = [(r[0], r[1]) for r in pruned.collect()]
    assert got == want

    # nprobe=8 reads everything — the pruning is really the probe set
    full = ivf_partition_pruned_topk(
        spark, path, medoids, qv, k=10, nprobe=8, exclude_id=0
    )
    assert _scan_metrics(full)["numFiles"] == 8


def test_probe_cells_deterministic(spark):
    corpus = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    from shortvideohybridanalyticslakehouse_spark.functions.similarity import (
        ivf_medoids,
    )

    medoids = ivf_medoids(corpus, 8)
    qv = [
        float(x)
        for x in corpus.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    p3 = ivf_probe_cells(qv, medoids, 3)
    assert len(p3) == 3 == len(set(p3))
    assert p3 == ivf_probe_cells(qv, medoids, 3)  # stable
    assert set(p3) <= {cid for cid, _ in medoids}
