"""Extension queries, round 49: the DCT compressed-image modality — a
REAL baseline JPEG codec (ITU-T T.81 SOF0) as a first-class multimodal
lane, closing the last compressed-format family beside PNG's DEFLATE and
GIF's LZW: entropy (Huffman) coding + transform (DCT) coding.

Verification strategy (same family as the WAV/PNG/GIF lanes): fixture
payloads are REAL baseline JPEGs whose per-block DCT coefficients are a
closed-form function of doc_id — a DC constant plus one of four planted
AC patterns (one of which sits at zigzag position 17, forcing a ZRL
16-zero-run symbol through the entropy coder; a third of the fixtures
carry DRI/RSTn restart scheduling with DC-predictor resets). The decoded
pixels are therefore exactly `clamp(c + delta[pat][i])` where the
64-entry delta grids are fixed integers (rounded IDCT of each planted
pattern, every value >= 0.04 from a .5 boundary so rounding is
unambiguous — asserted in tests/test_multimodal.py). The DuckDB oracle
replays that arithmetic from the SAME literal delta grids; the Spark
side must recover it from actual Huffman-coded, byte-stuffed scan bytes.
A wrong canonical-code table, EXTEND slip, zigzag transposition, missed
byte-unstuffing, or unreset DC predictor after RSTn all shift the pixel
sums and fail the value hash.

Reference parity: the reference engine has no media columns at all
(SURVEY.md §2 multimodal gap) — this extends the beyond-reference
LLM-data-pipeline surface (brief: "treat image/audio/video as opaque
binary columns ... decode / feature-extract as Pandas UDFs over
mapInPandas").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions import multimodal
from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table


def _delta_values_sql() -> str:
    """Render the planted-pattern pixel-delta grids as DuckDB list
    literals. These are fixture DEFINITION constants (like the WAV
    lane's closed-form sample function), not decoder output: the Spark
    side must reproduce them from real entropy-coded bytes."""
    rows = []
    for pat, deltas in enumerate(multimodal.jpeg_pattern_deltas()):
        rows.append(f"({pat}, [{', '.join(str(d) for d in deltas)}])")
    return ",\n         ".join(rows)


_JPEG_BASE = f"""
WITH pats(pat, deltas) AS (
  VALUES {_delta_values_sql()}
), jdelta AS (
  SELECT pat, u.i AS i, deltas[CAST(u.i AS INT) + 1] AS delta
  FROM pats, unnest(range(64)) AS u(i)
), dims AS (
  SELECT doc_id,
         16 + (doc_id % 3) * 8 AS w,
         16 + (doc_id % 2) * 8 AS h
  FROM documents
), blocks AS (
  SELECT doc_id, w, h, unnest(range((w // 8) * (h // 8))) AS k
  FROM dims
), bc AS (
  SELECT doc_id, w, h, k,
         (doc_id * 17 + k * 29) % 256 AS c,
         (doc_id + k) % 4 AS pat
  FROM blocks
), px AS (
  SELECT b.doc_id, b.w, b.h,
         LEAST(255, GREATEST(0, b.c + d.delta)) AS p
  FROM bc b JOIN jdelta d USING (pat)
), stats AS (
  SELECT doc_id,
         CAST(w AS INT) AS width,
         CAST(h AS INT) AS height,
         CAST((w // 8) * (h // 8) AS INT) AS n_blocks,
         CAST(SUM(p) AS BIGINT) AS sum_px,
         CAST(MIN(p) AS INT) AS min_px,
         CAST(MAX(p) AS INT) AS max_px
  FROM px GROUP BY doc_id, w, h
)
"""

_JPEG_DECODE_ORACLE = _JPEG_BASE + "SELECT * FROM stats"


@register("multimodal_jpeg_decode", _JPEG_DECODE_ORACLE)
def q_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL transform-coding decode: baseline JPEG payloads (canonical
    Huffman entropy coding, byte stuffing, restart markers) fully decoded
    — dequant, inverse zigzag, float IDCT, level shift — into
    integer-exact pixel aggregates the oracle replays analytically."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = multimodal.synthetic_jpeg_payloads(docs, "doc_id")
    return multimodal.jpeg_decode_stats(payloads, "doc_id")


_JPEG_PROFILE_ORACLE = _JPEG_BASE + """
SELECT width, height,
       CAST(count(*) AS BIGINT) AS n_images,
       CAST(sum(n_blocks) AS BIGINT) AS total_blocks,
       CAST(sum(sum_px) AS BIGINT) AS total_px_sum,
       CAST(min(min_px) AS INT) AS global_min_px,
       CAST(max(max_px) AS INT) AS global_max_px
FROM stats
GROUP BY width, height
ORDER BY width, height
"""


@register("multimodal_jpeg_profile", _JPEG_PROFILE_ORACLE)
def q_jpeg_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level JPEG inventory: the decoded lane flowing straight
    into an ordinary relational rollup by image dimensions — the
    routing grouping a training-data pipeline uses to batch images into
    per-resolution preprocessing. The mapInPandas black box ends at the
    per-image stats frame; everything after is JVM-side codegen."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = multimodal.synthetic_jpeg_payloads(docs, "doc_id")
    stats = multimodal.jpeg_decode_stats(payloads, "doc_id")
    return (
        stats.groupBy("width", "height")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.sum("n_blocks").alias("total_blocks"),
            F.sum("sum_px").alias("total_px_sum"),
            F.min("min_px").alias("global_min_px"),
            F.max("max_px").alias("global_max_px"),
        )
        .orderBy("width", "height")
    )
