"""Versioned-snapshot tables: commit / time travel / rollback / vacuum."""

from __future__ import annotations

import os

import pytest

from shortvideohybridanalyticslakehouse_spark.plans import snapshots


def _df(spark, vals):
    return spark.createDataFrame([(i,) for i in vals], "x long")


def _vals(df):
    return sorted(r.x for r in df.collect())


def test_commit_and_time_travel(spark, tmp_path):
    base = str(tmp_path / "tbl")
    v0 = snapshots.commit_snapshot(_df(spark, [1, 2]), base)
    v1 = snapshots.commit_snapshot(_df(spark, [1, 2, 3]), base)
    assert (v0, v1) == (0, 1)
    assert _vals(snapshots.read_snapshot(spark, base)) == [1, 2, 3]
    assert _vals(snapshots.read_snapshot(spark, base, version=0)) == [1, 2]
    with pytest.raises(FileNotFoundError):
        snapshots.read_snapshot(spark, base, version=2)


def test_rollback_restores_and_continues(spark, tmp_path):
    base = str(tmp_path / "tbl")
    snapshots.commit_snapshot(_df(spark, [1]), base)
    snapshots.commit_snapshot(_df(spark, [1, 2]), base)
    snapshots.rollback(base, 0)
    assert _vals(snapshots.read_snapshot(spark, base)) == [1]
    # a new commit after rollback advances from the restored pointer but
    # must not clobber the surviving v=1 directory
    v = snapshots.commit_snapshot(_df(spark, [9]), base)
    assert v == 2  # advances past the surviving v=1, never reuses a dir
    assert _vals(snapshots.read_snapshot(spark, base)) == [9]
    # pre-rollback history is still readable (Delta RESTORE keeps history)
    assert _vals(snapshots.read_snapshot(spark, base, version=1)) == [1, 2]


def test_uncommitted_version_invisible(spark, tmp_path):
    # simulate a crashed commit: data dir exists, pointer never swapped
    base = str(tmp_path / "tbl")
    snapshots.commit_snapshot(_df(spark, [1]), base)
    _df(spark, [42]).write.parquet(os.path.join(base, "v=7"))
    assert _vals(snapshots.read_snapshot(spark, base)) == [1]
    with pytest.raises(FileNotFoundError):
        snapshots.read_snapshot(spark, base, version=7)
    # vacuum collects the orphan
    dropped = snapshots.vacuum(base, keep_last=5)
    assert 7 in dropped
    assert not os.path.isdir(os.path.join(base, "v=7"))


def test_vacuum_keeps_committed_and_recent(spark, tmp_path):
    base = str(tmp_path / "tbl")
    for i in range(4):
        snapshots.commit_snapshot(_df(spark, list(range(i + 1))), base)
    dropped = snapshots.vacuum(base, keep_last=2)
    assert dropped == [0, 1]
    assert _vals(snapshots.read_snapshot(spark, base)) == [0, 1, 2, 3]
    with pytest.raises(FileNotFoundError):
        snapshots.read_snapshot(spark, base, version=0)
    assert _vals(snapshots.read_snapshot(spark, base, version=2)) == [0, 1, 2]


def test_snapshot_diff_changelog(spark, tmp_path):
    base = str(tmp_path / "tbl")
    v0 = snapshots.commit_snapshot(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
        ),
        base,
    )
    v1 = snapshots.commit_snapshot(
        spark.createDataFrame(
            [(2, "b"), (3, "C"), (4, "d")], "k long, v string"
        ),
        base,
    )
    rows = {
        (r.k, r.v, r._change_type)
        for r in snapshots.snapshot_diff(spark, base, v0, v1, ["k"]).collect()
    }
    assert rows == {
        (1, "a", "delete"),
        (3, "c", "update_preimage"),
        (3, "C", "update_postimage"),
        (4, "d", "insert"),
    }  # unchanged key 2 emits nothing


def test_audited_commit_blocks_bad_publish(spark, tmp_path):
    import pytest as _pytest

    base = str(tmp_path / "tbl")
    snapshots.commit_snapshot(_df(spark, [1, 2, 3]), base)

    def non_empty(d):
        return d.count() > 0

    def no_negatives(d):
        return d.filter("x < 0").count() == 0

    # good data publishes
    v = snapshots.audited_commit(_df(spark, [4, 5]), base, [non_empty, no_negatives])
    assert _vals(snapshots.read_snapshot(spark, base)) == [4, 5]
    # bad data: audit fails -> pointer UNMOVED, staged dir left as orphan
    with _pytest.raises(AssertionError, match="no_negatives"):
        snapshots.audited_commit(_df(spark, [-1]), base, [non_empty, no_negatives])
    assert _vals(snapshots.read_snapshot(spark, base)) == [4, 5]
    dropped = snapshots.vacuum(base, keep_last=5)
    assert v + 1 in dropped  # the failed stage collected as an orphan


def test_compaction_preserves_data_and_reduces_files(spark, tmp_path):
    import glob

    base = str(tmp_path / "tbl")
    # a fragmented commit: 8 partitions -> 8 parquet files
    frag = spark.range(100).repartition(8).selectExpr("id AS x")
    snapshots.commit_snapshot(frag, base)
    v0_files = glob.glob(os.path.join(base, "v=0", "*.parquet"))
    assert len(v0_files) == 8
    v = snapshots.compact_snapshot(spark, base, target_files=1)
    v1_files = glob.glob(os.path.join(base, f"v={v}", "*.parquet"))
    assert len(v1_files) == 1
    # data identical, old layout still time-travelable
    assert _vals(snapshots.read_snapshot(spark, base)) == list(range(100))
    assert _vals(snapshots.read_snapshot(spark, base, version=0)) == list(range(100))


def test_vacuum_between_rollback_and_next_commit_keeps_history(spark, tmp_path):
    """Round-4 advice fix: rolled-back versions are restorable HISTORY, not
    crashed-commit orphans — vacuum between rollback and the next commit
    must keep them (within keep_last)."""
    base = str(tmp_path / "t_rbvac")
    for i in range(3):  # v0, v1, v2
        snapshots.commit_snapshot(
            spark.createDataFrame([(i,)], "x int"), base
        )
    snapshots.rollback(base, 0)
    dropped = snapshots.vacuum(base, keep_last=2)
    # v1, v2 sit above the pointer but below the recorded high-water mark:
    # they are history, not orphans; keep_last=2 retains both
    assert dropped == []
    # roll-forward still possible: a later commit makes them readable again
    v3 = snapshots.commit_snapshot(spark.createDataFrame([(9,)], "x int"), base)
    assert v3 == 3
    assert [r.x for r in snapshots.read_snapshot(spark, base, 2).collect()] == [2]
    # a genuinely crashed commit above the high-water mark is still collected
    import os

    os.makedirs(os.path.join(base, "v=7"))
    assert 7 in snapshots.vacuum(base, keep_last=10)


def test_snapshot_diff_null_first_key_column(spark, tmp_path):
    """Round-4 advice fix: rows whose FIRST key column is NULL must appear
    in the changelog (presence is detected by sentinel, not key nullness)."""
    base = str(tmp_path / "t_nullkey")
    old = spark.createDataFrame(
        [(None, 1, "a"), (2, 2, "b")], "k1 int, k2 int, v string"
    )
    new = spark.createDataFrame(
        [(None, 1, "a2"), (None, 3, "c")], "k1 int, k2 int, v string"
    )
    snapshots.commit_snapshot(old, base)
    snapshots.commit_snapshot(new, base)
    diff = snapshots.snapshot_diff(spark, base, 0, 1, ["k1", "k2"]).collect()
    by_type = {}
    for r in diff:
        by_type.setdefault(r["_change_type"], []).append((r.k1, r.k2, r.v))
    # NULL-keyed update is visible (eqNullSafe matches NULL keys)
    assert by_type["update_preimage"] == [(None, 1, "a")]
    assert by_type["update_postimage"] == [(None, 1, "a2")]
    # NULL-keyed insert and non-null delete both visible
    assert by_type["insert"] == [(None, 3, "c")]
    assert by_type["delete"] == [(2, 2, "b")]
