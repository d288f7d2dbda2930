"""Marker retention (streaming/markers.py): old applied-batch markers
are pruned, recent ones survive, and recent-batch replay stays a no-op
after a vacuum."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.streaming.markers import (
    vacuum_markers,
)
from shortvideohybridanalyticslakehouse_spark.streaming.mv import (
    MvSpec,
    counting,
    merge_mv_batch,
    read_mv,
    summing,
)

_SCHEMA = "k long, v long"


def _spec():
    return MvSpec(
        key_cols=("k",), measures=(counting("n"), summing(F.col("v"), "s"))
    )


def _markers(store):
    out = []
    for root, _d, files in os.walk(store):
        for f in files:
            if f.startswith("_applied_batch_"):
                out.append(int(f[len("_applied_batch_") :]))
    return sorted(set(out))


def test_vacuum_prunes_old_keeps_recent_and_replay_safe(spark, tmp_path):
    store = os.path.join(str(tmp_path), "mv")
    spec = _spec()
    for i in range(6):
        merge_mv_batch(
            spark,
            spark.createDataFrame([(1, i), (2, 10 * i)], _SCHEMA),
            store,
            i,
            spec,
            n_buckets=4,
        )
    assert _markers(store) == [0, 1, 2, 3, 4, 5]
    removed = vacuum_markers(store, keep_last=2)
    assert removed > 0
    assert _markers(store) == [4, 5]
    before = sorted((r.k, r.n, r.s) for r in read_mv(spark, store, spec).collect())
    # a replay of the most recent batch (the only one the checkpoint can
    # still re-enter) is STILL a no-op
    merge_mv_batch(
        spark,
        spark.createDataFrame([(1, 5), (2, 50)], _SCHEMA),
        store,
        5,
        spec,
        n_buckets=4,
    )
    after = sorted((r.k, r.n, r.s) for r in read_mv(spark, store, spec).collect())
    assert after == before


def test_vacuum_noop_under_threshold_and_validates(spark, tmp_path):
    import pytest

    store = os.path.join(str(tmp_path), "mv")
    spec = _spec()
    for i in range(3):
        merge_mv_batch(
            spark,
            spark.createDataFrame([(1, i)], _SCHEMA),
            store,
            i,
            spec,
            n_buckets=2,
        )
    assert vacuum_markers(store, keep_last=64) == 0
    assert _markers(store) == [0, 1, 2]
    assert vacuum_markers(os.path.join(str(tmp_path), "absent")) == 0
    with pytest.raises(ValueError):
        vacuum_markers(store, keep_last=0)
