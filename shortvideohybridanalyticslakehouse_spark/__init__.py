"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference lakehouse (ShortVideoHybridAnalyticsLakehouse).

Design stance (SURVEY.md §7.1): pure DataFrame-building functions, no I/O in
operators, dual-mode (batch replay over parquet fixtures is the default; the
same plan-building functions power Structured Streaming mode). All hot-path
expressions compile to Catalyst built-ins — no row-at-a-time Python UDFs.

Subpackages
-----------
- ``contracts``  : schema contracts, error codes, metric formulas, decision
  constants (reference: src/spark/rt_content_events_contract.py,
  rt_content_events_validation.py, rt_video_cdc_contract.py).
- ``operators``  : validate/split, windowed aggregation, rolling windows,
  dedup/upsert, decision mapping, schema alignment (SURVEY.md §2).
- ``sources``    : batch parquet loaders with lineage synthesis; streaming
  source builders.
- ``functions``  : text analysis, similarity search, near-dup fingerprints
  (extension operators for training-data pipelines at 100 TB scale).
- ``plans``      : serving-view SQL layer + BI/acceptance query pack.
- ``streaming``  : Structured Streaming jobs (watermark, foreachBatch upsert).
- ``generator``  : deterministic bounded event/CDC generator port (§2.12).
"""

__version__ = "0.1.0"
