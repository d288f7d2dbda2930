"""Streaming image near-dup firewall == the ext144 batch pairing on the
same closed corpus: incoming re-encoded images are flagged against the
frozen dHash index; clean images pass; one emission per doc."""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions import multimodal
from shortvideohybridanalyticslakehouse_spark.streaming.image_firewall import (
    dhash_firewall,
    dhash_index,
)


def _payload_rows(spark, ids, dup_of=None):
    """Real BMP/PPM payloads: id -> deterministic pixels; dup_of maps an
    id to the id whose pixels it re-encodes (the other container)."""
    import pandas as pd

    dup_of = dup_of or {}
    rows = []
    for d in ids:
        e = dup_of.get(d, d)
        import numpy as np

        w, h = 8 + e % 9, 6 + e % 7
        i = np.arange(3 * w * h, dtype=np.int64)
        rgb = (((e + 1) * 7919 * (i + 1) * (i + 3)) % 256).astype(
            np.uint8
        ).tobytes()
        payload = (
            multimodal.encode_bmp(w, h, rgb)
            if d % 2
            else multimodal.encode_ppm(w, h, rgb)
        )
        rows.append((d, f"src{d % 2}", bytearray(payload)))
    return spark.createDataFrame(
        rows, "doc_id long, source string, payload binary"
    )


def test_firewall_flags_reencodes_once(spark, tmp_path):
    # frozen index: images 1..20
    index_df = dhash_index(_payload_rows(spark, range(1, 21)))
    index_df = index_df.cache()
    assert index_df.count() == 80  # 20 images x 4 bands

    # stream: 101..110 clean; 111 re-encodes index image 5; 112
    # re-encodes index image 8 (other container)
    batch = _payload_rows(
        spark,
        list(range(101, 113)),
        dup_of={111: 5, 112: 8},
    )
    src = os.path.join(str(tmp_path), "in")
    os.makedirs(src)
    staged = os.path.join(str(tmp_path), "_stage")
    batch.coalesce(1).write.mode("overwrite").parquet(staged)
    part = next(f for f in os.listdir(staged) if f.endswith(".parquet"))
    shutil.move(
        os.path.join(staged, part), os.path.join(src, "b0.parquet")
    )
    t = time.time() - 60
    os.utime(os.path.join(src, "b0.parquet"), (t, t))

    stream = spark.readStream.schema(
        "doc_id long, source string, payload binary"
    ).parquet(src)
    q = (
        dhash_firewall(stream, index_df)
        .writeStream.format("memory")
        .queryName("img_fw")
        .outputMode("update")
        .option(
            "checkpointLocation", os.path.join(str(tmp_path), "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.doc_id: r.source
        for r in spark.sql("SELECT * FROM img_fw").collect()
    }
    index_df.unpersist()
    # exactly the two re-encodes, once each, with their stream source
    assert got == {111: "src1", 112: "src0"}


def test_batch_plan_matches_ext144_pairing(spark):
    """The firewall's per-batch plan (run in batch mode) finds the same
    matches the ext144 band-pairing would for stream-vs-index pairs."""
    index_df = dhash_index(_payload_rows(spark, range(1, 31)))
    batch = _payload_rows(spark, [201, 202], dup_of={201: 13})
    out = dhash_firewall(batch, index_df).collect()
    assert {r.doc_id for r in out} == {201}
