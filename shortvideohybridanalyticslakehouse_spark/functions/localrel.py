"""LocalTableScan-backed tiny frames from driver rows (guide §4/§5).

``spark.createDataFrame(small_list)`` parallelizes the rows through
``defaultParallelism`` (32) partitions of a Python RDD: EVERY action on
the frame — every plan branch, every bench trial — pays ~0.5 s of
Python-worker round-trips to deserialize a handful of pickled rows
(measured: count() of a 4-row frame = 0.47 s steady-state on local[32];
the same rows as a literal VALUES relation = 0.17 s, plan =
LocalTableScan, zero Python tasks, zero jobs for most operators).

``local_rows_df`` renders driver-bounded rows as a VALUES relation when
every value has an EXACT SQL literal form, falling back to
``createDataFrame`` otherwise. Exactness notes:

- doubles/floats round-trip through ``repr`` (shortest decimal) and a
  string->double CAST, which is correctly rounded — bit-exact;
  inf/nan render as 'Infinity'/'NaN'.
- timestamps/dates format at microsecond precision (collect() returns
  naive UTC datetimes under the engine's UTC session).
- every output column is wrapped ``IF(TRUE, x, NULL)`` so the analyzed
  schema is nullable, matching createDataFrame's DDL-schema behavior;
  the optimizer folds the wrapper away before execution.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import types as T

_MAX_ROWS = 10_000  # bounded-frame contract; beyond this, fall back


def _lit(v, dt: T.DataType) -> str:
    if v is None:
        return f"CAST(NULL AS {dt.simpleString()})"
    if isinstance(dt, T.BooleanType):
        return "true" if v else "false"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return f"CAST({int(v)} AS {dt.simpleString()})"
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        f = float(v)
        if math.isnan(f):
            s = "'NaN'"
        elif math.isinf(f):
            s = "'Infinity'" if f > 0 else "'-Infinity'"
        else:
            s = f"'{f!r}'"
        return f"CAST({s} AS {dt.simpleString()})"
    if isinstance(dt, T.StringType):
        esc = str(v).replace("\\", "\\\\").replace("'", "\\'")
        return f"'{esc}'"
    if isinstance(dt, T.DecimalType):
        return f"CAST('{Decimal(v)}' AS {dt.simpleString()})"
    if isinstance(dt, T.TimestampType):
        if not isinstance(v, datetime.datetime) or v.tzinfo is not None:
            raise ValueError("timestamp literal needs a naive datetime")
        return f"TIMESTAMP '{v.strftime('%Y-%m-%d %H:%M:%S.%f')}'"
    if isinstance(dt, T.DateType):
        if isinstance(v, datetime.datetime):
            raise ValueError("date literal needs a date, not datetime")
        return f"DATE '{v.isoformat()}'"
    raise ValueError(f"no exact literal rendering for {dt.simpleString()}")


def local_rows_df(spark: SparkSession, rows, schema) -> DataFrame:
    """Tiny DataFrame over driver rows, as a LocalTableScan when possible.

    ``rows``: list of tuples/Rows (positional, matching the schema).
    ``schema``: DDL string or StructType. Identical values and column
    names/types as ``spark.createDataFrame(rows, schema)`` — only the
    physical plan differs.
    """
    if isinstance(schema, str):
        struct = T.StructType.fromDDL(schema)
    else:
        struct = schema
    rows = list(rows)
    if not rows or len(rows) > _MAX_ROWS:
        return spark.createDataFrame(rows, schema)
    try:
        tuples = [
            "(" + ", ".join(_lit(r[i], f.dataType) for i, f in enumerate(struct.fields)) + ")"
            for r in rows
        ]
    except (ValueError, TypeError, ArithmeticError, IndexError):
        return spark.createDataFrame(rows, schema)
    cols = ", ".join(
        f"IF(TRUE, col{i + 1}, NULL) AS `{f.name}`"
        for i, f in enumerate(struct.fields)
    )
    return spark.sql(f"SELECT {cols} FROM VALUES {', '.join(tuples)}")


def bounded_rows_df(df_rows: list[Row], schema: T.StructType, spark: SparkSession) -> DataFrame:
    """finalize_bounded's shape: collected Rows + the result schema."""
    return local_rows_df(spark, [tuple(r) for r in df_rows], schema)
