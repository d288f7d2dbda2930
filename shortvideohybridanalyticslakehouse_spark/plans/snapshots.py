"""Versioned-snapshot tables on plain parquet: commit / time travel / rollback.

The reference runs on a lakehouse (Iceberg/Delta), whose storage layer
provides snapshot isolation, time travel and rollback for free. Plain
parquet has none of that, so this module emulates the essential contract
the way those formats do it internally: IMMUTABLE data versions plus an
atomically-swapped pointer.

Layout:

    <base>/v=N/...parquet     immutable snapshot data (never rewritten)
    <base>/_latest            text file holding "N" — the commit pointer

Commit protocol: write the new version directory fully, then atomically
rename a temp pointer file over `_latest` (os.replace — atomic on POSIX).
Readers resolve the pointer first, then read only `v=N/`, so a reader can
never observe a half-written version: either the swap happened (fully
written data, by write-then-swap ordering) or it didn't (previous version).
This is exactly Delta's _delta_log "last checkpoint" / Iceberg's
version-hint indirection, minus manifests.

Reference analog: the MERGE-target gold/dim tables
(rt_video_cdc_upsert_sql.py:113-172) whose lakehouse versions are queried
with VERSION AS OF; here `read_snapshot(path, version=...)` is that
surface, and `rollback` is `RESTORE TABLE ... TO VERSION AS OF`.

At scale: versions are directories of parquet written by the cluster
(any partitioning inside `v=N/` is allowed); only the tiny pointer file is
driver-side. Old versions are retained for time travel until `vacuum`
drops those older than `keep_last`.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

_VERSION_RE = re.compile(r"^v=(\d+)$")
_POINTER = "_latest"
_HWM = "_rollback_hwm"


def _rollback_hwm(base: str) -> int:
    """Highest version that was ever committed before a rollback (-1 if no
    rollback recorded) — the vacuum boundary between rolled-back history
    and crashed-commit orphans."""
    try:
        with open(os.path.join(base, _HWM)) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return -1


def _versions(base: str) -> list[int]:
    if not os.path.isdir(base):
        return []
    out = []
    for name in os.listdir(base):
        m = _VERSION_RE.match(name)
        if m and os.path.isdir(os.path.join(base, name)):
            out.append(int(m.group(1)))
    return sorted(out)


def _committed_version(base: str) -> int | None:
    ptr = os.path.join(base, _POINTER)
    try:
        with open(ptr) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return None


def commit_snapshot(df: DataFrame, base: str, partition_by: list[str] | None = None) -> int:
    """Write ``df`` as the next immutable version and atomically publish it.

    Returns the committed version number. Data lands under ``v=N/`` first;
    the pointer swap (os.replace) is the commit point — a crash before the
    swap leaves an orphan directory that `vacuum` collects, never a
    half-visible table.
    """
    os.makedirs(base, exist_ok=True)
    current = _committed_version(base)
    existing = _versions(base)
    # advance past BOTH the pointer and any surviving directory (post-
    # rollback commits and crashed-commit orphans must never be reused)
    version = max([current if current is not None else -1, *existing, -1]) + 1
    vdir = os.path.join(base, f"v={version}")
    writer = df.write.mode("errorifexists")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(vdir)
    tmp = os.path.join(base, f"{_POINTER}.tmp.{version}")
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, os.path.join(base, _POINTER))  # atomic commit point
    return version


def read_snapshot(
    spark: SparkSession, base: str, version: int | None = None
) -> DataFrame:
    """Read the committed snapshot (default) or `VERSION AS OF version`.

    Raises FileNotFoundError for a version that was never committed or was
    vacuumed — same contract as Delta's time travel.
    """
    committed = _committed_version(base)
    if committed is None:
        raise FileNotFoundError(f"no committed snapshot under {base}")
    target = committed if version is None else version
    if target > committed or target < 0:
        raise FileNotFoundError(f"version {target} not committed (latest {committed})")
    vdir = os.path.join(base, f"v={target}")
    if not os.path.isdir(vdir):
        raise FileNotFoundError(f"version {target} vacuumed from {base}")
    return spark.read.parquet(vdir)


def rollback(base: str, version: int) -> int:
    """RESTORE TO VERSION AS OF: re-point `_latest` at an older version.

    The restored version becomes the committed state. Newer version dirs
    stay on disk but are NOT readable while above the pointer (readers
    refuse versions beyond the commit point — they are indistinguishable
    from crashed commits without a log); once a later commit advances the
    pointer past them they become history again. Subsequent
    commit_snapshot calls always allocate a fresh directory above every
    existing one, so no version is ever rewritten.
    """
    if not os.path.isdir(os.path.join(base, f"v={version}")):
        raise FileNotFoundError(f"version {version} missing under {base}")
    # Record the pre-rollback high-water mark so vacuum can tell rolled-back
    # HISTORY (committed once, restorable by a later roll-forward) from
    # crashed-commit ORPHANS (never committed). Without it, a vacuum run
    # between rollback and the next commit would permanently delete the
    # rolled-back versions. The mark covers versions up to the PRE-rollback
    # pointer only — dirs above it were never committed (crash debris) and
    # must stay eligible for vacuum's orphan collection.
    committed = _committed_version(base)
    hwm = max(_rollback_hwm(base), committed if committed is not None else -1)
    tmp_h = os.path.join(base, f"{_HWM}.tmp.rb{version}")
    with open(tmp_h, "w") as f:
        f.write(str(hwm))
    os.replace(tmp_h, os.path.join(base, _HWM))
    tmp = os.path.join(base, f"{_POINTER}.tmp.rb{version}")
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, os.path.join(base, _POINTER))
    return version


def vacuum(base: str, keep_last: int = 2) -> list[int]:
    """Drop version directories older than the newest ``keep_last``, never
    the committed one. Also collects orphan (crashed, never-committed)
    directories NEWER than the pointer — but NOT rolled-back history:
    versions at or below the high-water mark `rollback` records were
    committed once and stay restorable, so they age out under the normal
    ``keep_last`` rule instead of being treated as crash debris. Returns
    dropped versions."""
    committed = _committed_version(base)
    if committed is None:
        return []
    versions = _versions(base)
    keep = set(versions[-keep_last:]) | {committed}
    # orphans: dirs above BOTH the pointer and the rollback high-water mark
    # were never published (crashed commit)
    hwm = _rollback_hwm(base)
    orphans = {v for v in versions if v > committed and v > hwm}
    dropped = []
    for v in versions:
        if v in orphans or v not in keep:
            if v == committed:
                continue
            shutil.rmtree(os.path.join(base, f"v={v}"))
            dropped.append(v)
    return dropped


def snapshot_diff(
    spark: SparkSession,
    base: str,
    v_from: int,
    v_to: int,
    key_cols: list[str],
) -> DataFrame:
    """Row-level changelog between two committed versions — the Delta CDF /
    Iceberg changelog surface: one row per changed key with
    ``_change_type`` in {insert, delete, update_preimage, update_postimage}.

    Plan: FULL OUTER join of the two snapshots on the key (one
    co-partitioned shuffle per side; at scale both versions share the
    write-time layout, so bucketed snapshot writes make this
    exchange-free), non-key columns compared null-safely via eqNullSafe.
    Unchanged keys drop out before the union doubles update rows.
    """
    from pyspark.sql import functions as F

    old = read_snapshot(spark, base, v_from)
    new = read_snapshot(spark, base, v_to)
    val_cols = [c for c in new.columns if c not in key_cols]
    if set(old.columns) != set(new.columns):
        raise ValueError(
            f"schema changed between v{v_from} and v{v_to}: "
            f"{sorted(old.columns)} vs {sorted(new.columns)} — diff requires "
            "aligned schemas (run the align.ensure_contract migration first)"
        )
    # Side presence via sentinel marker columns, NOT key nullness: the join
    # matches keys with eqNullSafe, so a legitimately-NULL key column must
    # not make a row vanish from the changelog (a row absent from one side
    # of the full outer join has a NULL marker there; a present row never
    # does, whatever its key values).
    o = old.withColumn("_in_old", F.lit(True)).alias("o")
    n = new.withColumn("_in_new", F.lit(True)).alias("n")
    on = [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in key_cols]
    cond = on[0]
    for c in on[1:]:
        cond = cond & c
    j = o.join(n, cond, "full_outer")
    in_old = F.col("o._in_old").isNotNull()
    in_new = F.col("n._in_new").isNotNull()
    same = None
    for c in val_cols:
        eq = F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
        same = eq if same is None else (same & eq)
    if same is None:
        same = F.lit(True)

    def _side(keep, side: str, change: str) -> DataFrame:
        cols = [F.col(f"{side}.{c}").alias(c) for c in new.columns]
        return j.filter(keep).select(*cols, F.lit(change).alias("_change_type"))

    upd = in_old & in_new & ~same
    return (
        _side(in_new & ~in_old, "n", "insert")
        .unionByName(_side(in_old & ~in_new, "o", "delete"))
        .unionByName(_side(upd, "o", "update_preimage"))
        .unionByName(_side(upd, "n", "update_postimage"))
    )


def audited_commit(
    df: DataFrame,
    base: str,
    checks: "list",
    partition_by: list[str] | None = None,
) -> int:
    """Write-Audit-Publish: stage the new version, run every audit against
    the STAGED files (what readers would actually see), and swap the
    pointer only if all pass. On failure the staged directory is left
    unpublished (an orphan `vacuum` collects) and AssertionError raises —
    the committed table never moves. This is the WAP pattern Iceberg
    ships as branch+publish, on the same pointer mechanics as
    commit_snapshot.

    ``checks``: callables DataFrame -> bool, each applied to the staged
    data re-read from disk (not the input plan — audits must see
    post-serialization reality: dropped columns, type coercions, file
    corruption).
    """
    os.makedirs(base, exist_ok=True)
    current = _committed_version(base)
    existing = _versions(base)
    version = max([current if current is not None else -1, *existing, -1]) + 1
    vdir = os.path.join(base, f"v={version}")
    writer = df.write.mode("errorifexists")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(vdir)
    staged = df.sparkSession.read.parquet(vdir)
    for i, check in enumerate(checks):
        if not check(staged):
            raise AssertionError(
                f"audit {i} ({getattr(check, '__name__', 'check')}) failed for "
                f"staged v={version} of {base}; table remains at "
                f"v={current} (staged dir left for inspection/vacuum)"
            )
    tmp = os.path.join(base, f"{_POINTER}.tmp.{version}")
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, os.path.join(base, _POINTER))
    return version


def compact_snapshot(
    spark: SparkSession,
    base: str,
    target_files: int = 1,
    sort_by: list[str] | None = None,
) -> int:
    """OPTIMIZE / small-file compaction as a snapshot commit: read the
    committed version, rewrite it as ``target_files`` files (optionally
    re-sorted for clustering), and publish the rewrite as a NEW version —
    data-identical, layout-improved, with the old layout still
    time-travelable. This is the maintenance half of a lakehouse the
    streaming upsert path needs: micro-batch commits accrete small files
    until scan cost is dominated by file-open overhead; compaction folds
    them without blocking readers (the pointer swap is the only moment of
    change, and it's atomic).
    """
    df = read_snapshot(spark, base)
    compacted = df.repartition(target_files)
    if sort_by:
        compacted = compacted.sortWithinPartitions(*sort_by)
    return commit_snapshot(compacted, base)
