"""Extension queries, round 79: COLOR baseline JPEG (SOF0, YCbCr 4:2:0)
— the mainstream photographic-JPEG shape, completing the round-5
grayscale lane (VERDICT r5 #5).

What the Spark side must get right that grayscale never exercised: MCU
interleaving (Y00 Y01 Y10 Y11 Cb Cr per 16x16 MCU), per-COMPONENT DC
predictors (all three reset at restart markers), the Annex K chrominance
Huffman tables selected per component through the SOS table map, a
second quant table, 2x2 replication chroma upsample, and the libjpeg
integer fixed-point YCbCr->RGB transform.

Verification: fixture payloads are REAL interleaved color JPEGs whose Y
and chroma blocks carry closed-form DC constants + the four planted AC
patterns proven exact in round 5 (every rounded IDCT delta >= 0.04 from
a .5 boundary). The color transform is integer fixed-point with a
power-of-two divisor, so the DuckDB oracle replays every R/G/B pixel as
FLOOR((k * c' + 32768) / 65536.0) arithmetic — bit-exact in both engines
— and aggregates the identical channel sums. A wrong interleave order,
unreset chroma predictor, swapped chroma table, misaligned upsample, or
off-by-one fixed-point constant shifts a channel sum and fails the hash.

Reference parity: the reference engine has no media columns (SURVEY §2
multimodal gap); this extends the beyond-reference LLM-data-pipeline
surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions import multimodal
from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table


def _delta_values_sql() -> str:
    rows = []
    for pat, deltas in enumerate(multimodal.jpeg_pattern_deltas()):
        rows.append(f"({pat}, [{', '.join(str(d) for d in deltas)}])")
    return ",\n         ".join(rows)


# Per-pixel replay: for Y-block pixel i of sub-block j of MCU m, the MCU
# coordinates are (py, px) = (j//2*8 + i//8, j%2*8 + i%8); the 4:2:0
# replication upsample means its chroma sample is index
# (py//2)*8 + px//2 of the MCU's single chroma block. FLOOR(x/65536.0) is
# exact: the divisor is a power of two.
_JPEG_COLOR_BASE = f"""
WITH pats(pat, deltas) AS (
  VALUES {_delta_values_sql()}
), jdelta AS (
  SELECT pat, u.i AS i, deltas[CAST(u.i AS INT) + 1] AS delta
  FROM pats, unnest(range(64)) AS u(i)
), dims AS (
  SELECT doc_id,
         16 + (doc_id % 3) * 16 AS w,
         16 + (doc_id % 2) * 16 AS h
  FROM documents
), mcus AS (
  SELECT doc_id, w, h, unnest(range((w // 16) * (h // 16))) AS m
  FROM dims
), cells AS (
  SELECT doc_id, w, h, m, j.j AS j, u.i AS i,
         (j.j // 2) * 8 + (u.i // 8) AS py,
         (j.j % 2) * 8 + (u.i % 8) AS px
  FROM mcus, unnest(range(4)) AS j(j), unnest(range(64)) AS u(i)
), ycc AS (
  SELECT c.doc_id, c.w, c.h,
         LEAST(255, GREATEST(0,
             (c.doc_id * 13 + c.m * 41 + c.j * 29) % 256 + dy.delta)) AS y,
         LEAST(255, GREATEST(0,
             64 + (c.doc_id * 7 + c.m * 31) % 128 + dcb.delta)) - 128 AS cbp,
         LEAST(255, GREATEST(0,
             64 + (c.doc_id * 11 + c.m * 37) % 128 + dcr.delta)) - 128 AS crp
  FROM cells c
  JOIN jdelta dy
    ON dy.pat = (c.doc_id + c.m + c.j) % 4 AND dy.i = c.i
  JOIN jdelta dcb
    ON dcb.pat = (c.doc_id + c.m) % 4
   AND dcb.i = (c.py // 2) * 8 + (c.px // 2)
  JOIN jdelta dcr
    ON dcr.pat = (c.doc_id + c.m + 2) % 4
   AND dcr.i = (c.py // 2) * 8 + (c.px // 2)
), rgb AS (
  SELECT doc_id, w, h,
         LEAST(255, GREATEST(0, y + CAST(FLOOR(
             (91881 * crp + 32768) / 65536.0) AS BIGINT))) AS r,
         LEAST(255, GREATEST(0, y - CAST(FLOOR(
             (22554 * cbp + 46802 * crp + 32768) / 65536.0) AS BIGINT))) AS g,
         LEAST(255, GREATEST(0, y + CAST(FLOOR(
             (116130 * cbp + 32768) / 65536.0) AS BIGINT))) AS b
  FROM ycc
), stats AS (
  SELECT doc_id,
         CAST(w AS INT) AS width,
         CAST(h AS INT) AS height,
         CAST((w // 16) * (h // 16) AS INT) AS n_mcus,
         CAST(SUM(r) AS BIGINT) AS sum_r,
         CAST(SUM(g) AS BIGINT) AS sum_g,
         CAST(SUM(b) AS BIGINT) AS sum_b,
         CAST(LEAST(MIN(r), MIN(g), MIN(b)) AS INT) AS min_px,
         CAST(GREATEST(MAX(r), MAX(g), MAX(b)) AS INT) AS max_px
  FROM rgb GROUP BY doc_id, w, h
)
"""

_JPEG_COLOR_ORACLE = _JPEG_COLOR_BASE + "SELECT * FROM stats"


@register("multimodal_jpeg_color", _JPEG_COLOR_ORACLE)
def q_jpeg_color(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL 4:2:0 color JPEG decode into integer-exact per-channel
    aggregates the oracle replays analytically (see module docstring)."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = multimodal.synthetic_jpeg_color_payloads(docs, "doc_id")
    return multimodal.jpeg_color_decode_stats(payloads, "doc_id")


_JPEG_COLOR_PROFILE_ORACLE = _JPEG_COLOR_BASE + """
SELECT width, height,
       CAST(count(*) AS BIGINT) AS n_images,
       CAST(sum(n_mcus) AS BIGINT) AS total_mcus,
       CAST(sum(sum_r) AS BIGINT) AS total_r,
       CAST(sum(sum_g) AS BIGINT) AS total_g,
       CAST(sum(sum_b) AS BIGINT) AS total_b,
       CAST(min(min_px) AS INT) AS global_min_px,
       CAST(max(max_px) AS INT) AS global_max_px
FROM stats
GROUP BY width, height
ORDER BY width, height
"""


@register("multimodal_jpeg_color_profile", _JPEG_COLOR_PROFILE_ORACLE)
def q_jpeg_color_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level color-JPEG inventory: the decoded lane flowing into a
    per-resolution relational rollup (the batching key a training-data
    image pipeline partitions by); the mapInPandas black box ends at the
    per-image stats frame, everything after is JVM-side codegen."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = multimodal.synthetic_jpeg_color_payloads(docs, "doc_id")
    stats = multimodal.jpeg_color_decode_stats(payloads, "doc_id")
    return (
        stats.groupBy("width", "height")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.sum("n_mcus").alias("total_mcus"),
            F.sum("sum_r").alias("total_r"),
            F.sum("sum_g").alias("total_g"),
            F.sum("sum_b").alias("total_b"),
            F.min("min_px").alias("global_min_px"),
            F.max("max_px").alias("global_max_px"),
        )
        .orderBy("width", "height")
    )
