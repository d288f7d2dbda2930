"""Synthetic scale-up probe for the multimodal decode lanes (round 5).

Method: replicate the sf0.1 documents ids 1x/10x/100x (payloads are
generated in-lane from the id, so replication scales the DECODE work
exactly), run each lane's registry composition end-to-end
(encode fixture -> decode -> features), and report wall seconds +
per-payload microseconds per factor. The lanes are embarrassingly
parallel mapInPandas passes with no shuffle (PLANS.md audit rows), so
per-payload cost should be FLAT-to-falling as the fixed Python-worker
spin-up amortizes; growth would mean a batch-shape problem (e.g. decoded
frames outgrowing executor memory — the maxPartitionBytes knob).

Usage: python tools/scale_probe_multimodal.py [sf_dir] [factors...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions import multimodal
from shortvideohybridanalyticslakehouse_spark.session import get_spark
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

N_BASE = 10_000_000


def scaled_ids(spark, sf_dir: str, factor: int):
    base = load_table(spark, sf_dir, "documents", ensure_parallelism=True).select(
        "doc_id"
    )
    if factor == 1:
        return base
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    return base.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * N_BASE).alias("doc_id")
    )


LANES = {
    "raster_decode": lambda ids: multimodal.raster_decode_stats(
        multimodal.synthetic_raster_payloads(ids, "doc_id"), "doc_id"
    ),
    "raster_resize": lambda ids: multimodal.raster_decode_stats(
        multimodal.resize_raster(
            multimodal.synthetic_raster_payloads(ids, "doc_id"), 16, 12, "doc_id"
        ),
        "doc_id",
    ),
    "wav_decode": lambda ids: multimodal.wav_decode_stats(
        multimodal.synthetic_wav_payloads(ids, "doc_id"), "doc_id"
    ),
    "avi_framesample": lambda ids: multimodal.avi_frame_sample(
        multimodal.synthetic_avi_payloads(ids, "doc_id"), every=2, id_col="doc_id"
    ),
    "png_decode": lambda ids: multimodal.png_decode_stats(
        multimodal.synthetic_png_payloads(ids, "doc_id"), "doc_id"
    ),
    "jpeg_decode": lambda ids: multimodal.jpeg_decode_stats(
        multimodal.synthetic_jpeg_payloads(ids, "doc_id"), "doc_id"
    ),
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factors = [int(a) for a in sys.argv[2:]] or [1, 10, 100]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    # warm the Python worker pool so factor-1 isn't charged for spin-up
    spark.createDataFrame([(1,)], "x int").mapInPandas(
        lambda it: it, "x int"
    ).collect()
    for factor in factors:
        ids = scaled_ids(spark, sf_dir, factor).cache()
        n = ids.count()
        print(f"\n=== factor {factor}: {n} payloads ===", flush=True)
        for label, builder in LANES.items():
            t0 = time.time()
            out = builder(ids)
            # full-column reduction, same action shape as bench.py
            out.select(
                F.sum(F.xxhash64(F.to_json(F.struct(*out.columns))))
            ).collect()
            dt = time.time() - t0
            print(
                f"{label}: {dt:7.2f} s  ({dt / n * 1e6:8.2f} us/payload)",
                flush=True,
            )
        ids.unpersist()


if __name__ == "__main__":
    main()
