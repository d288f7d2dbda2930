"""Schema-align projection (P10) + table-contract checks (S5/S8 analog).

Reference behavior: reorder the outgoing DataFrame to the physical table's
column list, padding missing columns with NULL, so writers never depend on
select-order drift (ref: src/spark/rt_content_events_aggregator.py:345-355,
rt_video_cdc_upsert.py:213-221).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def align_to_columns(
    df: DataFrame,
    columns: Sequence[str],
    renames: Mapping[str, str] | None = None,
) -> DataFrame:
    """Project ``df`` to exactly ``columns`` in order.

    Missing columns are padded with NULL; ``renames`` maps source column ->
    target column before alignment (e.g. ``{"payload_json": "payload"}``).
    Pure projection: no shuffle, survives any scale.
    """
    renames = dict(renames or {})
    for src, dst in renames.items():
        if src in df.columns:
            df = df.withColumnRenamed(src, dst)
    present = set(df.columns)
    return df.select(
        *[F.col(c) if c in present else F.lit(None).alias(c) for c in columns]
    )


def missing_required_columns(
    df_columns: Sequence[str], required: Sequence[str]
) -> list[str]:
    """Contract check: which required physical columns are absent.

    The reference fails fast and prints ALTER TABLE migrations when a target
    table is missing contract columns (ref: rt_content_events_aggregator.py:83-130).
    """
    present = set(df_columns)
    return [c for c in required if c not in present]
