"""CUPED moments are a monoid — so the generic MV maintainer
(streaming/mv.py) can keep them incrementally, and the theta/lift
computed from the streamed store must equal the batch estimator exactly
(integer moments: no float drift to hide behind)."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.streaming.mv import (
    MvSpec,
    counting,
    read_mv,
    start_mv_job,
    summing,
)

_SCHEMA = "user_id long, variant string, x_c long, y_c long"

# (user, variant, pre-cents, post-cents) — the per-user frame CUPED
# aggregates; arrival is split across 3 files
_ROWS = [
    (u, "treatment" if u % 2 else "control", (u * 13) % 500, (u * 29) % 700)
    for u in range(1, 91)
]


def _spec():
    return MvSpec(
        key_cols=("variant",),
        measures=(
            counting("n"),
            summing(F.col("x_c"), "sx"),
            summing(F.col("y_c"), "sy"),
            summing(F.col("x_c") * F.col("x_c"), "sxx"),
            summing(F.col("x_c") * F.col("y_c"), "sxy"),
        ),
    )


def _theta_and_lift(rows):
    # pooled theta over both variants from the merged per-variant moments
    n = sum(r["n"] for r in rows)
    sx = sum(r["sx"] for r in rows)
    sy = sum(r["sy"] for r in rows)
    sxx = sum(r["sxx"] for r in rows)
    sxy = sum(r["sxy"] for r in rows)
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    by = {r["variant"]: r for r in rows}
    mean_x = sx / n

    def adj(v):
        r = by[v]
        return r["sy"] / r["n"] - theta * (r["sx"] / r["n"] - mean_x)

    return theta, adj("treatment") - adj("control")


def test_streamed_moments_reproduce_batch_cuped(spark, tmp_path):
    src = os.path.join(str(tmp_path), "in")
    os.makedirs(src)
    t0 = time.time() - 600
    per = (len(_ROWS) + 2) // 3
    for i in range(3):
        p = os.path.join(src, f"f{i:04d}.csv")
        with open(p, "w") as f:
            for u, v, x, y in _ROWS[i * per : (i + 1) * per]:
                f.write(f"{u},{v},{x},{y}\n")
        os.utime(p, (t0 + i, t0 + i))

    store = os.path.join(str(tmp_path), "cuped_mv")
    stream = (
        spark.readStream.schema(_SCHEMA).option("maxFilesPerTrigger", 1).csv(src)
    )
    q = start_mv_job(
        spark, stream, store, os.path.join(str(tmp_path), "ckpt"), _spec()
    )
    q.awaitTermination(120)

    streamed = [r.asDict() for r in read_mv(spark, store, _spec()).collect()]
    batch = [
        r.asDict()
        for r in _spec()
        .partials(spark.createDataFrame(_ROWS, _SCHEMA))
        .collect()
    ]
    assert sorted(map(tuple, (sorted(d.items()) for d in streamed))) == sorted(
        map(tuple, (sorted(d.items()) for d in batch))
    )
    th_s, lift_s = _theta_and_lift(streamed)
    th_b, lift_b = _theta_and_lift(batch)
    assert th_s == th_b and lift_s == lift_b  # EXACT: integer moments
