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


def migration_ddl(
    table: str,
    required: Mapping[str, str],
    existing_columns: Sequence[str],
) -> list[str]:
    """ALTER-migration statements for a stale physical table.

    ``required`` maps contract column -> SQL type; any column absent from
    ``existing_columns`` yields one ``ALTER TABLE ... ADD COLUMNS (...)``
    statement, in contract order — the operator-runnable migration text the
    reference prints before failing fast
    (ref: rt_content_events_aggregator.py:83-94, _sql.py:175-228).
    Returns [] when the table already satisfies the contract.
    """
    missing = missing_required_columns(existing_columns, list(required))
    if not missing:
        return []
    cols = ", ".join(f"{c} {required[c]}" for c in missing)
    return [f"ALTER TABLE {table} ADD COLUMNS ({cols})"]


class ContractViolation(RuntimeError):
    """Raised by ensure_contract; carries the runnable migration DDL."""

    def __init__(self, table: str, missing: list[str], ddl: list[str]):
        self.table = table
        self.missing = missing
        self.ddl = ddl
        super().__init__(
            f"table {table} is missing contract columns {missing}; "
            "run the migration:\n" + "\n".join(ddl)
        )


def ensure_contract(
    table: str,
    required: Mapping[str, str],
    existing_columns: Sequence[str],
) -> None:
    """Fail fast (reference behavior) when a target table lacks contract
    columns, with the ALTER migration embedded in the error — writers must
    never silently drop or NULL-pad into a stale physical schema.
    """
    ddl = migration_ddl(table, required, existing_columns)
    if ddl:
        missing = missing_required_columns(existing_columns, list(required))
        raise ContractViolation(table, missing, ddl)
