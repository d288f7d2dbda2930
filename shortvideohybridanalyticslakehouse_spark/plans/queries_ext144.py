"""Extension queries, round 144: image perceptual-hash near-dup — ties
the multimodal decode surface into the dedup family (a byte-hash dedup
can never catch the SAME image re-encoded in a different container; a
perceptual hash must).

raster_dhash_near_dup: deterministic raster payloads with PLANTED
cross-format duplicates (id % 10 == 7 re-encodes the previous id's
pixels in the other container — BMP vs P6 PPM), REALLY decoded
(headers, BMP stride/row-order/BGR, PPM maxval) by
functions/multimodal.raster_dhash into a 60-bit sampled-gradient dHash,
then paired by the simhash 4x15-bit band blocking (pigeonhole: any pair
within hamming <= 3 shares an intact band) and kept at hamming <= 2.
The oracle replays the closed-form pixel function, the EXACT sampled-
luma gradient bits, and the identical banding in SQL — a wrong stride,
an un-swapped channel, or a mis-sampled grid point flips gradient signs
and fails the hash compare.

Plan shape at 100 TB: hash computation is one Arrow mapInPandas scan;
the bander shuffles O(docs x 4 bands) skinny rows; the pair join is
band-bucketed (never docs^2) with the volume build side merge-pinned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions import multimodal
from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_MAX_HAM = 2

# sampled luma at grid point (c, r) for effective id e, width w, height h
# — byte index i = 3*(y*w + x); byte value =
# ((e+1)*7919*(i+1)*(i+3) + (e//256+1)*104729*(i+5)) % 256
# (the generator's nonlinear long-period pixel function, replayed
# verbatim)
_PX = (
    "(((e + 1) * 7919 * (({i}) + 1) * (({i}) + 3)"
    " + (e // 256 + 1) * 104729 * (({i}) + 5)) % 256)"
)
_IDX = "(3*(((({r}) * h) // 8) * w + ((({c}) * w) // 9)))"
_LUMA = (
    "(299 * " + _PX.format(i=_IDX) + ""
    " + 587 * " + _PX.format(i=_IDX + " + 1") + ""
    " + 114 * " + _PX.format(i=_IDX + " + 2") + ")"
)

_DHASH_ORACLE = f"""
WITH base AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 7 THEN doc_id - 1 ELSE doc_id END AS e
  FROM documents
), dims AS (
  SELECT doc_id, e, 8 + e % 9 AS w, 6 + e % 7 AS h FROM base
), hashed AS (
  SELECT doc_id,
    CAST(list_sum(list_transform(range(0, 60), j ->
      CASE WHEN {_LUMA.format(r="j // 8", c="j % 8")}
             < {_LUMA.format(r="j // 8", c="j % 8 + 1")}
           THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)) AS BIGINT) AS dhash
  FROM dims
), banded AS (
  SELECT doc_id, dhash, b AS band_id,
         (dhash >> (15 * b)) & 32767 AS band_val
  FROM hashed, range(0, 4) AS t(b)
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.dhash AS ha, b.dhash AS hb
  FROM banded a JOIN banded b
    ON a.band_id = b.band_id AND a.band_val = b.band_val
   AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
FROM pairs
WHERE bit_count(xor(ha, hb)) <= {_MAX_HAM}
"""


@register("raster_dhash_near_dup", _DHASH_ORACLE)
def q_raster_dhash_near_dup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Image near-dup pairs at dHash hamming <= 2 via band blocking —
    catches the planted cross-format re-encodes at hamming 0."""
    docs = load_table(spark, sf_dir, "documents", ensure_parallelism=True)
    payloads = multimodal.synthetic_raster_payloads_with_dups(docs, "doc_id")
    hashed = multimodal.raster_dhash(payloads, "doc_id")
    banded = hashed.select(
        "doc_id",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftright("dhash", b * 15)
                        .bitwiseAND(F.lit(32767))
                        .alias("band_val"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "dhash", "bb.band_id", "bb.band_val")
    right = banded.select(
        F.col("band_id"),
        F.col("band_val"),
        F.col("doc_id").alias("doc_b"),
        F.col("dhash").alias("hb"),
    )
    pairs = (
        banded.select(
            "band_id",
            "band_val",
            F.col("doc_id").alias("doc_a"),
            F.col("dhash").alias("ha"),
        )
        # both sides grow with the corpus (volume build): merge pin
        .join(
            right.hint("merge"),
            ["band_id", "band_val"],
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "ha", "hb")
        .distinct()
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return pairs.filter(ham <= _MAX_HAM).select(
        "doc_a",
        "doc_b",
        ham.cast("bigint").alias("hamming"),
    )
