"""Marker retention for the bucketed merge stores (scd2 / mv / search
index): every committed batch leaves an ``_applied_batch_<id>`` file in
each bucket it touched, and without retention the marker count grows
with stream lifetime — the same unbounded-metadata failure mode
checkpoint compaction exists for.

Safety argument for deleting old markers: Structured Streaming replays
AT MOST the batches after the last checkpoint commit — once batch N's
checkpoint offset is committed, no batch with id < N is ever re-entered
through foreachBatch. Keeping the trailing ``keep_last`` marker ids per
bucket therefore preserves idempotence for every batch that can still
replay, provided ``keep_last`` exceeds the replay window (1 under
default semantics; the default 64 is a wide margin). Vacuuming is
crash-safe: deleting a marker never touches data files, and a crash
mid-vacuum just leaves some prunable markers for the next pass.
"""

from __future__ import annotations

import os


def vacuum_markers(store: str, keep_last: int = 64) -> int:
    """Delete applied-batch markers older than the newest ``keep_last``
    ids WITHIN EACH bucket directory (a per-bucket cut, so a bucket
    untouched for many batches keeps its newest markers regardless of
    how far the rest of the store has advanced). Returns the number of
    files removed."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    if not os.path.isdir(store):
        return 0
    by_dir: dict[str, list[tuple[int, str]]] = {}
    for root, _dirs, files in os.walk(store):
        for f in files:
            if f.startswith("_applied_batch_"):
                try:
                    bid = int(f[len("_applied_batch_") :])
                except ValueError:
                    continue
                by_dir.setdefault(root, []).append(
                    (bid, os.path.join(root, f))
                )
    removed = 0
    for _root, found in by_dir.items():
        ids = sorted({bid for bid, _ in found})
        if len(ids) <= keep_last:
            continue
        cutoff = ids[-keep_last]  # keep ids >= cutoff within this bucket
        for bid, path in found:
            if bid < cutoff:
                try:
                    os.remove(path)
                    removed += 1
                except FileNotFoundError:
                    pass
    return removed
