"""Structured Streaming mode: the same plan-building operators behind
readStream sources, watermarks, and foreachBatch upsert sinks."""
