"""Extension queries, round 88: PIVOT — the wide daily event matrix
(days x event types), the report shape BI tools request constantly and
the relational complement of ext15's UNPIVOT (melt). The pivot column
set is the CLOSED event-type enum from the ingestion contract, so the
output schema is static — the only pivot form that is sane at scale
(dynamic-column pivots need a driver-side distinct pass first).

Spark side uses the real `.pivot(col, values)` API (which compiles to
the same conditional-aggregation plan the oracle spells out), plus a
row total; one map-side-combinable aggregation, one shuffle on day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_TYPES = ["click", "error", "purchase", "signup", "view"]

_PIVOT_ORACLE = f"""
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       {', '.join(
           f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) "
           f"AS BIGINT) AS {t}" for t in _TYPES
       )},
       CAST(count(*) AS BIGINT) AS total
FROM events
GROUP BY 1
"""


@register("daily_event_type_pivot", _PIVOT_ORACLE)
def q_daily_event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days x event-type count matrix via the DataFrame pivot API over
    the closed enum (static schema), plus a row total."""
    ev = load_table(spark, sf_dir, "events")
    wide = (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .pivot("event_type", _TYPES)
        .count()
    )
    total = sum((F.coalesce(F.col(t), F.lit(0)) for t in _TYPES), F.lit(0))
    return wide.select(
        "day",
        *[F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(t) for t in _TYPES],
        total.cast("bigint").alias("total"),
    )
