"""Streaming incremental triangle maintenance == batch census
(VERDICT r6 #6).

The foreachBatch maintainer (streaming/graph.py) must converge to the
EXACT triangle count of the full edge set — across duplicate edges,
reversed duplicates, cross-batch triangle completion (two edges early,
closer late), and crash-restart replay — with per-batch edge storage
that only ever writes the batch's own partition.
"""

from __future__ import annotations

import itertools
import os
import time

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.streaming.graph import (
    canonical_edges,
    count_triangles,
    merge_triangle_batch,
    start_triangle_job,
    total_triangles,
)

_SCHEMA = "src long, dst long"

# deterministic scraggly graph: ring + chords + some duplicates/reversals;
# sliced into 4 arrival files so several triangles COMPLETE in a later
# batch than their first edge
_N = 13


def _all_edges():
    edges = [(i, (i + 1) % _N) for i in range(_N)]  # ring
    edges += [(i, (i + 4) % _N) for i in range(0, _N, 2)]  # chords
    edges += [(i, (i * 3 + 1) % _N) for i in range(_N)]  # scramble
    edges = [e for e in edges if e[0] != e[1]]
    edges += [(b, a) for a, b in edges[::3]]  # reversed duplicates
    edges += edges[::4]  # exact duplicates
    return edges


def _files(n_files=4):
    edges = _all_edges()
    per = (len(edges) + n_files - 1) // n_files
    return [edges[i * per : (i + 1) * per] for i in range(n_files)]


def _brute_triangles():
    adj = set()
    for a, b in _all_edges():
        if a != b:
            adj.add((min(a, b), max(a, b)))
    return sum(
        1
        for x, y, z in itertools.combinations(range(_N), 3)
        if (x, y) in adj and (y, z) in adj and (x, z) in adj
    )


def _write_files(src_dir):
    os.makedirs(src_dir, exist_ok=True)
    t0 = time.time() - 600
    for i, chunk in enumerate(_files()):
        p = os.path.join(src_dir, f"e{i:04d}.csv")
        with open(p, "w") as f:
            for a, b in chunk:
                f.write(f"{a},{b}\n")
        os.utime(p, (t0 + i, t0 + i))  # pin FileStreamSource arrival order


def test_stream_equals_batch_and_brute(spark, tmp_path):
    src = os.path.join(str(tmp_path), "in")
    _write_files(src)
    store = os.path.join(str(tmp_path), "tri_store")
    stream = (
        spark.readStream.schema(_SCHEMA).option("maxFilesPerTrigger", 1).csv(src)
    )
    q = start_triangle_job(
        spark, stream, store, os.path.join(str(tmp_path), "ckpt")
    )
    q.awaitTermination(120)

    got = total_triangles(spark, store)
    all_df = spark.createDataFrame(_all_edges(), _SCHEMA)
    want = count_triangles(canonical_edges(all_df))
    assert got == want == _brute_triangles()
    assert got > 0  # the fixture must actually exercise the counters

    # edge store holds exactly the canonical edge set, split by arrival
    stored = spark.read.parquet(os.path.join(store, "edges"))
    canon = canonical_edges(all_df)
    assert stored.select("a", "b").distinct().count() == canon.count()
    assert stored.count() == canon.count()  # no duplicate across batches


def test_replay_is_idempotent(spark, tmp_path):
    """Re-running a committed batch id rewrites only its own partitions
    with the SAME content — counts and store unchanged."""
    store = os.path.join(str(tmp_path), "tri_store")
    files = _files()
    for i, chunk in enumerate(files[:3]):
        merge_triangle_batch(
            spark, spark.createDataFrame(chunk, _SCHEMA), store, i
        )
    before = total_triangles(spark, store)
    edges_before = sorted(
        (r.a, r.b, r.batch)
        for r in spark.read.parquet(os.path.join(store, "edges")).collect()
    )
    # crash-replay batch 1 (its delta must be recomputed against batch<1)
    merge_triangle_batch(
        spark, spark.createDataFrame(files[1], _SCHEMA), store, 1
    )
    assert total_triangles(spark, store) == before
    edges_after = sorted(
        (r.a, r.b, r.batch)
        for r in spark.read.parquet(os.path.join(store, "edges")).collect()
    )
    assert edges_after == edges_before
    # finish the stream: final total still equals batch
    merge_triangle_batch(
        spark, spark.createDataFrame(files[3], _SCHEMA), store, 3
    )
    want = count_triangles(canonical_edges(spark.createDataFrame(_all_edges(), _SCHEMA)))
    assert total_triangles(spark, store) == want


def test_cross_batch_completion_attribution(spark, tmp_path):
    """A triangle whose edges span three batches is counted exactly once,
    in the batch its LAST edge arrives."""
    store = os.path.join(str(tmp_path), "tri_store")
    merge_triangle_batch(
        spark, spark.createDataFrame([(1, 2)], _SCHEMA), store, 0
    )
    assert total_triangles(spark, store) == 0
    merge_triangle_batch(
        spark, spark.createDataFrame([(2, 3)], _SCHEMA), store, 1
    )
    assert total_triangles(spark, store) == 0
    merge_triangle_batch(
        spark, spark.createDataFrame([(3, 1), (1, 2)], _SCHEMA), store, 2
    )
    assert total_triangles(spark, store) == 1
    # the duplicate (1,2) must not have re-entered the store
    stored = spark.read.parquet(os.path.join(store, "edges"))
    assert stored.count() == 3
