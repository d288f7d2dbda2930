"""Relational/dataflow operators (SURVEY.md §2) as pure DataFrame functions."""

from shortvideohybridanalyticslakehouse_spark.operators.align import align_to_columns
from shortvideohybridanalyticslakehouse_spark.operators.validate import (
    annotate_content_errors,
    parse_content_events,
    split_valid_invalid,
)
from shortvideohybridanalyticslakehouse_spark.operators.aggregate import (
    conditional_count,
    tumbling_window_agg,
)
from shortvideohybridanalyticslakehouse_spark.operators.rolling import rolling_range_sums
from shortvideohybridanalyticslakehouse_spark.operators.dedup import latest_per_key
from shortvideohybridanalyticslakehouse_spark.operators.decision import (
    with_decision,
    with_derived_metrics,
    with_flags,
)

__all__ = [
    "align_to_columns",
    "annotate_content_errors",
    "parse_content_events",
    "split_valid_invalid",
    "conditional_count",
    "tumbling_window_agg",
    "rolling_range_sums",
    "latest_per_key",
    "with_decision",
    "with_derived_metrics",
    "with_flags",
]
