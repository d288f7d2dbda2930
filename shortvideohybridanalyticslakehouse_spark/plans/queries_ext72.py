"""Extension queries, round 72: silence-run analysis over REALLY-decoded
mu-law audio — the codec lane composed with gap-and-island analytics,
i.e. the "trim dead air" preprocessing step an audio training-data
pipeline runs after decode.

A sample is silent iff |decoded| < 400 (inside the fixture's quantized
low-amplitude band). Runs are maximal stretches of consecutive sample
indices that are silent: island key = i - row_number() among a clip's
silent samples in index order (pure integer gap-and-island, windows
partitioned per clip). The Spark side measures runs over ACTUAL decoder
output bytes (mapInPandas decode -> exploded samples); the oracle
replays the companding quantization closed-form (the queries_ext62 CTE
chain) and the same island arithmetic — so a single wrong decoded
sample moves a run boundary and fails the hash.

Scale: decode is embarrassingly parallel; the island window is
O(samples per clip) with clip-count parallelism; output is one row per
clip with silence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions import multimodal
from shortvideohybridanalyticslakehouse_spark.plans.queries_ext62 import _MULAW_BASE
from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_SILENCE = 400

# the shared _MULAW_BASE chain drops the sample index after `raw`, so the
# per-sample quantization is recomputed here from `idx` (which keeps i)
_SILENCE_ORACLE = _MULAW_BASE + f"""
, raw_i AS (
  SELECT doc_id, i, ((doc_id * 53 + i * 29) % 8001) - 4000 AS smp
  FROM idx
), seg_i AS (
  SELECT doc_id, i, smp, least(abs(smp), 32635) + 132 AS v FROM raw_i
), exps_i AS (
  SELECT *, CASE WHEN v < 256 THEN 0 WHEN v < 512 THEN 1
                 WHEN v < 1024 THEN 2 WHEN v < 2048 THEN 3
                 WHEN v < 4096 THEN 4 WHEN v < 8192 THEN 5
                 WHEN v < 16384 THEN 6 ELSE 7 END AS e
  FROM seg_i
), dec AS (
  SELECT doc_id, i,
         CASE WHEN smp < 0 THEN -(((((v >> (e + 3)) & 15) << 3) + 132) << e) + 132
              ELSE (((((v >> (e + 3)) & 15) << 3) + 132) << e) - 132 END AS d
  FROM exps_i
), silent AS (
  SELECT doc_id, i,
         i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS island
  FROM dec WHERE abs(d) < {_SILENCE}
), runs AS (
  SELECT doc_id, island, CAST(count(*) AS BIGINT) AS run_len
  FROM silent GROUP BY 1, 2
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_runs,
       CAST(max(run_len) AS BIGINT) AS longest_run,
       CAST(sum(run_len) AS BIGINT) AS silent_samples
FROM runs GROUP BY 1
"""


@register("audio_silence_runs", _SILENCE_ORACLE)
def q_audio_silence_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per clip: number of silence runs, the longest run, and total
    silent samples — measured over actual mu-law decoder output and
    hash-matched against the closed-form quantization replay."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = multimodal.synthetic_mulaw_payloads(docs, "doc_id")
    samples = multimodal.wav_decoded_samples(payloads, "doc_id")
    silent = samples.filter(F.abs(F.col("dec")) < _SILENCE).withColumn(
        "island",
        F.col("i")
        - F.row_number().over(Window.partitionBy("doc_id").orderBy("i")),
    )
    runs = silent.groupBy("doc_id", "island").agg(
        F.count(F.lit(1)).cast("bigint").alias("run_len")
    )
    return runs.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_runs"),
        F.max("run_len").cast("bigint").alias("longest_run"),
        F.sum("run_len").cast("bigint").alias("silent_samples"),
    )
