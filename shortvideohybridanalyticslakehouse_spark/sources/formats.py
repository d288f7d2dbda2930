"""Multi-format batch IO (source/sink breadth beyond the parquet
fixtures): ORC, JSON-lines, CSV, and XML readers/writers with
schema-faithful round-trips, plus capability detection for formats whose
jars are not on this image (Avro).

Scale notes per format:
- parquet / ORC: vectorized columnar scans; both push filters and prune
  columns (`PushedFilters` / `ReadSchema` in the scan node) — ORC is the
  drop-in columnar alternative (orc-core ships with Spark), asserted by
  the pushdown test.
- JSON / CSV: row-oriented text — no column pruning at the byte level;
  ALWAYS pass an explicit schema (schema inference scans the data twice
  and types drift: ints widen to bigints, timestamps stay strings).
  Appropriate as ingest/egress edges, not as analytical storage.
- XML: Spark 4 bundles the formerly-external spark-xml source; same
  text-format rules (schema REQUIRED, pinned microsecond timestamps),
  rowTag-delimited records. Ingest/egress edge only.
- Avro: row-oriented with schema evolution; `spark-avro` is an external
  module not bundled here — `avro_available()` reports it, callers fall
  back to JSON for the same row-shaped role.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMATS = ("parquet", "orc", "json", "csv", "xml")

_CSV_OPTS = {
    "header": "true",
    # ISO with microseconds — the lossless timestamp round-trip format
    # (both text formats default to millisecond precision and silently
    # truncate parquet's microsecond timestamps otherwise)
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "nullValue": "\\N",  # distinguish NULL from empty string
    "escape": '"',
}

_JSON_OPTS = {
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
}

# Spark 4 bundles the (formerly external) spark-xml source. Same
# text-format caveats as CSV/JSON: schema REQUIRED, microsecond
# timestamp format pinned; rowTag names each record element.
_XML_OPTS = {
    "rowTag": "row",
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
}


def avro_available(spark: SparkSession) -> bool:
    """True iff the external spark-avro module is on the classpath."""
    try:
        spark.read.format("avro").schema("x int").load("/nonexistent-avro-probe")
        return True
    except Exception as e:  # noqa: BLE001 — classify by message
        return "Failed to find data source" not in str(e)


def write_table(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r} (supported: {FORMATS})")
    writer = df.write.mode("overwrite")
    if fmt == "csv":
        writer = writer.options(**_CSV_OPTS)
    elif fmt == "json":
        writer = writer.options(**_JSON_OPTS)
    elif fmt == "xml":
        writer = writer.format("xml").options(**_XML_OPTS)
        writer.save(path)
        return
    getattr(writer, fmt)(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
) -> DataFrame:
    """Read ``path`` as ``fmt``. For the text formats (json/csv/xml) a
    schema is REQUIRED — inference is a correctness hazard, not a
    convenience."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r} (supported: {FORMATS})")
    reader = spark.read
    if fmt in ("json", "csv", "xml"):
        if schema is None:
            raise ValueError(f"{fmt} reads require an explicit schema")
        reader = reader.schema(schema)
        if fmt == "csv":
            reader = reader.options(**_CSV_OPTS)
        elif fmt == "json":
            reader = reader.options(**_JSON_OPTS)
        else:
            return reader.format("xml").options(**_XML_OPTS).load(path)
    elif schema is not None:
        reader = reader.schema(schema)
    return getattr(reader, fmt)(path)
