"""Streaming image near-dup firewall: incoming binary image payloads
checked against a STATIC perceptual-hash index — the ingest-time form
of plans/queries_ext144.raster_dhash_near_dup, exactly as
streaming/contamination.py is the online form of the shingle audit.

A byte-hash ingest filter cannot catch the same image re-encoded in a
different container; the dHash firewall can (hamming 0), and near-edits
land within a small hamming radius. Spark-first shape: per micro-batch,
REAL decode + 60-bit dHash via Arrow mapInPandas (mapInPandas runs
unchanged on streaming frames), 4x15-bit band explode, stream-static
equi-join against the banded index (pigeonhole: any pair within
hamming <= 3 shares an intact band), exact hamming filter, then a
streaming dropDuplicates on the incoming doc id so a doc matched by
several bands or several index images emits once. State is the dedup
set only — O(flagged docs), never O(index).

At 100 TB the banded index is a bucketed parquet table on
(band_id, band_val) so the per-batch join co-locates — the
write_shingle_index_bucketed pattern applies verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions.multimodal import (
    raster_dhash,
)

_BANDS = 4
_BAND_BITS = 15
_BAND_MASK = (1 << _BAND_BITS) - 1


def band_explode(hashed: DataFrame, *keep: str) -> DataFrame:
    """(..., dhash) -> one row per 15-bit band: (*keep, dhash, band_id,
    band_val). Shared by the index builder and the streaming probe so
    both sides band identically."""
    return hashed.select(
        *keep,
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftright("dhash", b * _BAND_BITS)
                        .bitwiseAND(F.lit(_BAND_MASK))
                        .alias("band_val"),
                    )
                    for b in range(_BANDS)
                ]
            )
        ).alias("bb"),
    ).select(*keep, "dhash", "bb.band_id", "bb.band_val")


def dhash_index(payloads: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """STATIC side: decode + hash + band the frozen image corpus."""
    return band_explode(raster_dhash(payloads, id_col), "doc_id").select(
        F.col("doc_id").alias("index_doc"),
        F.col("dhash").alias("index_dhash"),
        "band_id",
        "band_val",
    )


def dhash_firewall(
    stream_payloads: DataFrame,
    index_banded: DataFrame,
    max_hamming: int = 2,
) -> DataFrame:
    """Streaming (doc_id, source) of incoming images that near-match the
    frozen index at dHash hamming <= ``max_hamming``.

    ``stream_payloads`` is a streaming frame with (doc_id, source,
    payload); ``index_banded`` the static dhash_index output. The
    ``carry`` passthrough keeps this a SINGLE stream-static join — no
    stream-stream self-join, no watermark, state is the dedup set only.
    The per-batch plan is the identical band join the ext144 batch lane
    runs (Structured Streaming gives each micro-batch full Catalyst
    planning)."""
    hashed = raster_dhash(
        stream_payloads.select("doc_id", "source", "payload"),
        "doc_id",
        carry=("source",),
    )
    probe = band_explode(hashed, "doc_id", "source")
    ham = F.bit_count(F.col("dhash").bitwiseXOR(F.col("index_dhash")))
    flagged = (
        probe.join(index_banded, ["band_id", "band_val"])
        .filter(ham <= max_hamming)
        .select("doc_id", "source")
    )
    return flagged.dropDuplicates(["doc_id"])
