"""Ridge linear probe on the embedding table: the standard
label-quality check (PCA/k-means/Fisher's supervised sibling).

Shape: the Gram matrix and per-class moment vectors come from EXACT
integer sums (functions/similarity.int_gram_stats — partition-order
invariant), the 64x64 ridge solve happens driver-side (the bounded
"routing table" class of driver work), and scoring runs IN-PLAN against
literal weight columns — argmax over 10 linear scores per row, one scan,
no Python in the scoring path. The test asserts the probe beats chance
by a wide margin on the real corpus and hits ~100% on a linearly
separable planted fixture."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions.similarity import (
    int_gram_stats,
)
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

SF_DIR = "/root/testdata/sf0.01"
DIM = 64
SCALE = 1_000_000
RIDGE = 1e-3


def _gram_and_counts(df, n_classes):
    """Exact integer moments: Gram (dim x dim), per-class sums X^T 1_c,
    and class counts — all from int_gram_stats plus one conditional
    aggregation pass."""
    parts = int_gram_stats(df, id_col="vec_id", vec_col="embedding", dim=DIM)
    rows = parts.collect()  # (dim+1)^2 bounded rows
    gram = np.zeros((DIM, DIM))
    for r in rows:
        if r["i"] >= 0 and r["j"] >= 0:
            gram[r["i"], r["j"]] = r["s"]
    gram /= SCALE * SCALE

    qcol = F.floor(F.col("x").cast("double") * SCALE + 0.5).cast("bigint")
    sums = (
        df.select("label", F.posexplode("embedding").alias("d", "x"))
        .groupBy("label", "d")
        .agg(F.sum(qcol).alias("s"))
        .collect()
    )  # bounded: classes x dim
    xty = np.zeros((DIM, n_classes))
    for r in sums:
        xty[r["d"], r["label"]] = r["s"]
    xty /= SCALE
    return gram, xty


def _probe_weights(df, n_classes):
    gram, xty = _gram_and_counts(df, n_classes)
    return np.linalg.solve(gram + RIDGE * np.eye(DIM), xty)  # dim x classes


def _in_plan_accuracy(df, w):
    """argmax_c (w_c . x) == label, computed with literal weights inside
    the plan (array_position of the max score — smallest class wins
    ties)."""
    scores = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    F.col("embedding"),
                    F.array(*[F.lit(float(v)) for v in w[:, c]]),
                    lambda x, wv: x.cast("double") * wv,
                ),
                F.lit(0.0),
                lambda a, b: a + b,
            )
            for c in range(w.shape[1])
        ]
    )
    pred = (F.array_position(scores, F.array_max(scores)) - 1).cast("int")
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(pred == F.col("label"), 1).otherwise(0)).alias("ok"),
    ).first()
    return row["ok"] / row["n"]


def test_probe_beats_chance_on_real_corpus(spark):
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    w = _probe_weights(emb, 10)
    acc = _in_plan_accuracy(emb, w)
    # 10 classes => chance 0.10; the one-vs-rest indicator regression must
    # clear it decisively if `label` carries any linear signal
    assert acc > 0.2, f"probe accuracy {acc:.3f} barely beats chance"


def test_probe_is_exact_on_separable_fixture(spark):
    """Planted fixture: class c concentrates on coordinate c — the probe
    must recover it (train) at ~100%."""
    rng = np.random.default_rng(7)
    rows = []
    for i in range(300):
        c = i % 3
        v = rng.normal(0, 0.05, DIM)
        v[c] += 3.0
        rows.append((i, [float(x) for x in v], c))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    w = _probe_weights(df, 3)
    acc = _in_plan_accuracy(df, w)
    assert acc >= 0.99
    # and the weights point where they should: each class's own planted
    # coordinate dominates its weight vector
    for c in range(3):
        assert int(np.argmax(w[:, c])) == c
