"""Extension queries, round 62: G.711 mu-law — a REAL compressed-audio
codec in the multimodal lane (logarithmic companding, audio_format=7
WAV), closing the "compressed audio" gap the round-4 verdict left as
environment-bounded. No codec library needed: companding is pure integer
segment/mantissa arithmetic (ITU-T G.711 public spec).

Verification: fixture payloads are real mu-law WAVs whose ORIGINAL
samples are closed-form in doc_id; the decoder sees only companded
bytes, so its output is the quantized signal. The oracle replays the
full encode+decode quantization in SQL — clip, +0x84 bias, 8-way
threshold CASE for the segment, bit-shift mantissa, reconstruction — and
computes the amplitude stats over THOSE quantized values. A single
mantissa bit wrong in either companding direction shifts sum_abs and
fails the hash.

Scale: identical shape to the PCM lane — embarrassingly parallel
mapInPandas decode, Arrow-batched, no shuffle until the final rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions import multimodal
from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

# dec = the exact value mulaw_expand(mulaw_compress(smp)) reconstructs
_MULAW_BASE = """
WITH base AS (
  SELECT doc_id,
         1 + doc_id % 2 AS channels,
         8000 + (doc_id % 3) * 4000 AS sample_rate,
         300 + doc_id % 201 AS n_frames
  FROM documents
), idx AS (
  SELECT doc_id, channels, sample_rate, n_frames,
         unnest(range(n_frames * channels)) AS i
  FROM base
), raw AS (
  SELECT doc_id, channels, sample_rate, n_frames,
         ((doc_id * 53 + i * 29) % 8001) - 4000 AS smp
  FROM idx
), seg AS (
  SELECT *, least(abs(smp), 32635) + 132 AS v FROM raw
), exps AS (
  SELECT *, CASE WHEN v < 256 THEN 0 WHEN v < 512 THEN 1
                 WHEN v < 1024 THEN 2 WHEN v < 2048 THEN 3
                 WHEN v < 4096 THEN 4 WHEN v < 8192 THEN 5
                 WHEN v < 16384 THEN 6 ELSE 7 END AS e
  FROM seg
), q AS (
  SELECT doc_id, channels, sample_rate, n_frames,
         CASE WHEN smp < 0 THEN -(((((v >> (e + 3)) & 15) << 3) + 132) << e) + 132
              ELSE (((((v >> (e + 3)) & 15) << 3) + 132) << e) - 132 END AS dec
  FROM exps
), stats AS (
  SELECT doc_id,
         CAST(channels AS INT) AS channels,
         CAST(sample_rate AS INT) AS sample_rate,
         CAST(n_frames AS BIGINT) AS n_frames,
         CAST((n_frames * 1000) // sample_rate AS BIGINT) AS duration_ms,
         CAST(max(abs(dec)) AS BIGINT) AS peak_abs,
         CAST(sum(abs(dec)) AS BIGINT) AS sum_abs,
         CAST(floor(sqrt(CAST(sum(dec * dec) AS DOUBLE) / count(*)) * 1000000)
              AS BIGINT) AS rms_micro
  FROM q
  GROUP BY doc_id, channels, sample_rate, n_frames
)
"""

_MULAW_DECODE_ORACLE = _MULAW_BASE + "SELECT * FROM stats"


@register("multimodal_mulaw_decode", _MULAW_DECODE_ORACLE)
def q_mulaw_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compand deterministic clips through the REAL G.711 mu-law encoder
    into audio_format=7 WAV containers, then decode them (chunk walk +
    segment/mantissa expansion) and emit integer-exact amplitude stats
    over the QUANTIZED signal — matched against an oracle that replays
    the companding arithmetic in SQL."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = multimodal.synthetic_mulaw_payloads(docs, "doc_id")
    return multimodal.wav_decode_stats(payloads, "doc_id")


@register(
    "multimodal_mulaw_quant_error",
    _MULAW_BASE
    + """
SELECT CAST(count(*) AS BIGINT) AS n_samples,
       CAST(sum(abs((CASE WHEN smp < 0
              THEN -(((((v >> (e + 3)) & 15) << 3) + 132) << e) + 132
              ELSE (((((v >> (e + 3)) & 15) << 3) + 132) << e) - 132 END)
              - smp)) AS BIGINT) AS total_abs_err,
       CAST(max(abs((CASE WHEN smp < 0
              THEN -(((((v >> (e + 3)) & 15) << 3) + 132) << e) + 132
              ELSE (((((v >> (e + 3)) & 15) << 3) + 132) << e) - 132 END)
              - smp)) AS BIGINT) AS max_abs_err
FROM exps
""",
)
def q_mulaw_quant_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide companding distortion audit: total and max absolute
    quantization error of the mu-law round trip. Spark recomputes the
    closed-form original samples JVM-side (sequence + transform HOF) and
    joins them against the REAL decoded output per (doc, sample index) —
    so the measured error comes from actual codec bytes, while the
    oracle derives it analytically. Max error must stay within the
    largest mu-law segment step for the +-4000 fixture range.

    Scale note (round 7, found by tools/shuffle_gate.py): the original
    sample is CLOSED-FORM in (doc_id, i), so it is computed inline on
    the decoded frame — the earlier per-(doc, sample) self-join
    broadcast a posexplode side whose size Catalyst estimated from the
    tiny docs scan (352 MB actual at sf0.1: a driver OOM at 100x)."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = multimodal.synthetic_mulaw_payloads(docs, "doc_id")

    decoded = multimodal.wav_decoded_samples(payloads, "doc_id")
    j = decoded.withColumn(
        "smp",
        F.expr("((doc_id * 53 + i * 29) % 8001) - 4000"),
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.sum(F.abs(F.col("dec") - F.col("smp"))).cast("bigint").alias(
            "total_abs_err"
        ),
        F.max(F.abs(F.col("dec") - F.col("smp"))).cast("bigint").alias(
            "max_abs_err"
        ),
    )
