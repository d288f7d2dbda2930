"""Shared money arithmetic for the customer-base analytics family
(rfm_segments, user_spend_gini, user_spend_lorenz_deciles).

The ONE correct cross-engine cents conversion: route the double through
DECIMAL(18,2) BEFORE scaling — a raw double->bigint cast truncates in
Spark but rounds in DuckDB, so any query skipping the decimal hop can
disagree with its oracle by one cent exactly at representation
boundaries. Keeping the expression (and its SQL twin) in one place means
a future change to the cents definition cannot silently diverge between
the oracle-gated queries that share it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# SQL twin of purchase_cents() for DuckDB oracle CTEs: per-user purchase
# spend in exact integer cents (0 for users with no purchases)
PURCHASE_CENTS_SQL = (
    "CAST(coalesce(sum(CASE WHEN event_type = 'purchase' "
    "THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) END), 0) AS BIGINT)"
)


def purchase_cents() -> Column:
    """Aggregate expression: this group's purchase spend in exact integer
    cents (BIGINT, 0 when the group has no purchases)."""
    return (
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    (F.col("value").cast("decimal(18,2)") * 100).cast("bigint"),
                )
            ),
            F.lit(0),
        )
        .cast("bigint")
    )
