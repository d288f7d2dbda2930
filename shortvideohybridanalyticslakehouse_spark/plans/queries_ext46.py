"""Extension queries, round 46: the audio modality — real RIFF/WAVE
16-bit PCM decode as a first-class multimodal lane (the WAV twin of the
round-4 raster codec, closing the last environment-permitted modality
gap named by the round-4 verdict).

Verification strategy (same as the raster lane): fixture payloads are
REAL WAV containers whose format fields and every PCM sample are
closed-form functions of doc_id, so a DuckDB oracle replays the SAME
arithmetic the decoder must recover from the bytes — a wrong chunk walk,
a missed pad byte, a byte-order slip, or a bad deinterleave all shift
the amplitude sums and fail the hash. Every third fixture carries a
LIST/INFO metadata chunk with an ODD declared size before fmt/data, so a
decoder that assumes the fixed 44-byte layout (or forgets word-alignment
padding) cannot pass.

Cross-engine float determinism: all amplitude accumulation is int64
(exact); the one floating step is rms_micro = floor(sqrt(sum_sq / n) *
1e6) — exact integer operands through correctly-rounded IEEE ops, then
floor, so there are no round-half semantics to disagree on.

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

_AUDIO_BASE = """
WITH base AS (
  SELECT doc_id,
         1 + doc_id % 2 AS channels,
         8000 + (doc_id % 3) * 4000 AS sample_rate,
         400 + doc_id % 241 AS n_frames
  FROM documents
), idx AS (
  SELECT doc_id, channels, sample_rate, n_frames,
         unnest(range(n_frames * channels)) AS i
  FROM base
), v AS (
  SELECT doc_id, channels, sample_rate, n_frames,
         ((doc_id * 37 + i * 13) % 4001) - 2000 AS smp
  FROM idx
), stats AS (
  SELECT doc_id,
         CAST(channels AS INT) AS channels,
         CAST(sample_rate AS INT) AS sample_rate,
         CAST(n_frames AS BIGINT) AS n_frames,
         CAST((n_frames * 1000) // sample_rate AS BIGINT) AS duration_ms,
         CAST(max(abs(smp)) AS BIGINT) AS peak_abs,
         CAST(sum(abs(smp)) AS BIGINT) AS sum_abs,
         CAST(floor(sqrt(CAST(sum(smp * smp) AS DOUBLE) / count(*)) * 1000000)
              AS BIGINT) AS rms_micro
  FROM v
  GROUP BY doc_id, channels, sample_rate, n_frames
)
"""

_AUDIO_DECODE_ORACLE = _AUDIO_BASE + "SELECT * FROM stats"


@register("multimodal_audio_decode", _AUDIO_DECODE_ORACLE)
def q_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode deterministic RIFF/WAVE payloads per doc_id, then REALLY
    decode them (chunk walk past a spliced odd-size LIST chunk, PCM
    deinterleave) and emit the typed audio metadata + integer-exact
    amplitude features. The oracle computes the same features
    analytically from the closed-form sample function — the container
    layer must round-trip exactly for the hashes to match."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = multimodal.synthetic_wav_payloads(docs, "doc_id")
    return multimodal.wav_decode_stats(payloads, "doc_id")


_AUDIO_PROFILE_ORACLE = _AUDIO_BASE + """
SELECT CAST(channels AS INT) AS channels,
       CAST(sample_rate AS INT) AS sample_rate,
       CAST(count(*) AS BIGINT) AS n_clips,
       CAST(sum(n_frames) AS BIGINT) AS total_frames,
       CAST(sum(duration_ms) AS BIGINT) AS total_duration_ms,
       CAST(max(peak_abs) AS BIGINT) AS max_peak_abs,
       CAST(sum(sum_abs) AS BIGINT) AS total_abs_amplitude
FROM stats
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("multimodal_audio_profile", _AUDIO_PROFILE_ORACLE)
def q_audio_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level audio inventory: decoded per-clip features flowing
    straight into an ordinary relational rollup by (channels,
    sample_rate) — the grouping a training-data pipeline uses to route
    clips to per-format preprocessing. Proves the decoded lane composes
    with JVM-side aggregation (the mapInPandas black box ends at the
    stats frame; everything after is codegen)."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = multimodal.synthetic_wav_payloads(docs, "doc_id")
    stats = multimodal.wav_decode_stats(payloads, "doc_id")
    return (
        stats.groupBy("channels", "sample_rate")
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.sum("n_frames").alias("total_frames"),
            F.sum("duration_ms").alias("total_duration_ms"),
            F.max("peak_abs").alias("max_peak_abs"),
            F.sum("sum_abs").alias("total_abs_amplitude"),
        )
        .orderBy("channels", "sample_rate")
    )


# ---------------------------------------------------------------------------
# Video lane: real uncompressed AVI decode + frame sampling
# ---------------------------------------------------------------------------

_VIDEO_SAMPLE_ORACLE = """
WITH base AS (
  SELECT doc_id,
         6 + doc_id % 5 AS w,
         4 + doc_id % 4 AS h,
         10 + doc_id % 3 AS fps,
         2 + doc_id % 3 AS n_frames
  FROM documents
), fr AS (
  SELECT doc_id, w, h, fps, unnest(range(n_frames)) AS f
  FROM base
), sampled AS (
  SELECT * FROM fr WHERE f % 2 = 0
), px AS (
  SELECT doc_id, w, h, fps, f, unnest(range(w * h)) AS i
  FROM sampled
)
SELECT doc_id,
       CAST(f AS INT) AS frame_id,
       CAST((f * (1000000 // fps)) // 1000 AS BIGINT) AS frame_offset_ms,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       round(SUM(
           299 * ((doc_id * 31 + f * 97 + 3 * i) % 256)
         + 587 * ((doc_id * 31 + f * 97 + 3 * i + 1) % 256)
         + 114 * ((doc_id * 31 + f * 97 + 3 * i + 2) % 256)
       ) / (1000.0 * w * h), 6) AS mean_luma
FROM px
GROUP BY doc_id, f, fps, w, h
"""


@register("multimodal_video_framesample", _VIDEO_SAMPLE_ORACLE)
def q_video_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode deterministic uncompressed AVI clips per doc_id (RIFF 'AVI '
    form, LIST/hdrl with avih+strh+strf, LIST/movi of raw DIB frames),
    then REALLY decode them — walk the RIFF tree, recover dims + frame
    timing from avih, undo each frame's bottom-up/BGR/stride layout — and
    emit every 2nd frame with its exact offset and integer-exact mean
    luma. The oracle replays the closed-form pixel function per sampled
    frame; a wrong stride, frame order, or sampling phase shifts the luma
    sums and fails the hash. Completes the REAL-decode multimodal triad:
    raster (BMP/PPM), audio (WAV/PCM), video (AVI/DIB)."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = multimodal.synthetic_avi_payloads(docs, "doc_id")
    return multimodal.avi_frame_sample(payloads, every=2, id_col="doc_id")


_AUDIO_AUTOCORR_ORACLE = """
WITH base AS (
  SELECT doc_id,
         1 + doc_id % 2 AS channels,
         8000 + (doc_id % 3) * 4000 AS sample_rate,
         400 + doc_id % 241 AS n_frames
  FROM documents
), idx AS (
  SELECT doc_id, channels, unnest(range(n_frames * channels)) AS i
  FROM base
), v AS (
  SELECT doc_id, channels, i,
         ((doc_id * 37 + i * 13) % 4001) - 2000 AS smp
  FROM idx
), ac AS (
  SELECT a.doc_id,
         CAST(sum(a.smp * b.smp) AS BIGINT) AS ac_lag1
  FROM v a JOIN v b ON b.doc_id = a.doc_id AND b.i = a.i + a.channels
  GROUP BY 1
), sq AS (
  SELECT doc_id, CAST(sum(smp * smp) AS BIGINT) AS sum_sq
  FROM v GROUP BY 1
)
SELECT s.doc_id, a.ac_lag1, s.sum_sq,
       CAST(floor(CAST(a.ac_lag1 AS DOUBLE) / CAST(s.sum_sq AS DOUBLE)
                  * 1000000) AS BIGINT) AS ac_ratio_micro
FROM sq s JOIN ac a ON a.doc_id = s.doc_id
"""


@register("multimodal_audio_autocorr", _AUDIO_AUTOCORR_ORACLE)
def q_audio_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-channel lag-1 autocorrelation over REALLY decoded PCM (lag =
    channel count in the interleaved stream), the periodicity/smoothness
    diagnostic audio curation pipelines use. Integer-exact sums; the one
    floating step (floor(ac/sum_sq * 1e6)) is bit-reproducible by the
    oracle's identical IEEE arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = multimodal.synthetic_wav_payloads(docs, "doc_id")
    return multimodal.wav_autocorr_stats(payloads, "doc_id")


_RASTER_RESIZE_ORACLE = """
WITH base AS (
  SELECT doc_id, 8 + doc_id % 9 AS ws, 6 + doc_id % 7 AS hs
  FROM documents
), px AS (
  SELECT doc_id, ws, hs, unnest(range(16 * 12)) AS d FROM base
), m AS (
  SELECT doc_id, ws,
         ((d // 16) * hs) // 12 AS sy,
         ((d % 16) * ws) // 16 AS sx
  FROM px
), lum AS (
  SELECT doc_id,
    299 * ((doc_id * 31 + 3 * (sy * ws + sx)) % 256)
  + 587 * ((doc_id * 31 + 3 * (sy * ws + sx) + 1) % 256)
  + 114 * ((doc_id * 31 + 3 * (sy * ws + sx) + 2) % 256) AS l
  FROM m
)
SELECT doc_id,
  CASE WHEN doc_id % 2 = 1 THEN 'bmp' ELSE 'ppm' END AS fmt,
  CAST(16 AS INT) AS width,
  CAST(12 AS INT) AS height,
  ROUND(SUM(l) / (1000.0 * 16 * 12), 6) AS mean_luma
FROM lum GROUP BY doc_id
"""


@register("multimodal_raster_resize", _RASTER_RESIZE_ORACLE)
def q_raster_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL resize on the raster lane: decode each BMP/PPM fixture,
    nearest-neighbor resample to 16x12 (src = (dst * src_dim) //
    dst_dim), re-encode in the ORIGINAL format, then decode the resized
    payload again and extract its mean luma. The oracle replays the floor
    index mapping over the closed-form source pixels — the whole
    decode -> resample -> re-encode -> decode chain must be exact for the
    hashes to match. Upgrades the resize stub's contract to a real kernel
    for raster payloads (compressed formats keep the documented stub)."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = multimodal.synthetic_raster_payloads(docs, "doc_id")
    resized = multimodal.resize_raster(payloads, 16, 12, "doc_id")
    return multimodal.raster_decode_stats(resized, "doc_id")


# ---------------------------------------------------------------------------
# PNG lane: REAL compressed decode (stdlib zlib DEFLATE + scanline filters)
# ---------------------------------------------------------------------------

_PNG_DECODE_ORACLE = """
WITH px AS (
  SELECT d.doc_id, unnest(range((8 + d.doc_id % 9) * (6 + d.doc_id % 7))) AS i
  FROM documents d
)
SELECT p.doc_id,
  CAST(8 + p.doc_id % 9 AS INT) AS width,
  CAST(6 + p.doc_id % 7 AS INT) AS height,
  ROUND(SUM(
      299 * ((p.doc_id * 31 + 3 * p.i) % 256)
    + 587 * ((p.doc_id * 31 + 3 * p.i + 1) % 256)
    + 114 * ((p.doc_id * 31 + 3 * p.i + 2) % 256)
  ) / (1000.0 * (8 + p.doc_id % 9) * (6 + p.doc_id % 7)), 6) AS mean_luma
FROM px p
GROUP BY p.doc_id
"""


@register("multimodal_png_decode", _PNG_DECODE_ORACLE)
def q_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL COMPRESSED-format decode: the fixture pixels (same closed
    form as the BMP/PPM lane) round-trip through genuine zlib DEFLATE
    compression with all five PNG scanline filters cycling per row; the
    decoder must verify chunk CRCs, inflate, and undo the Sub/Up/
    Average/Paeth byte recursions exactly for the luma hashes to match.
    Dependency-free: zlib is the Python stdlib. This closes the
    'compressed formats are environment-bounded' caveat for PNG —
    JPEG/H.264-class DCT codecs remain out of scope."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = multimodal.synthetic_png_payloads(docs, "doc_id")
    return multimodal.png_decode_stats(payloads, "doc_id")
