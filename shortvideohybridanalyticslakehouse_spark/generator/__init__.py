"""Deterministic bounded event/CDC generator (SURVEY.md §2.12 port)."""

from shortvideohybridanalyticslakehouse_spark.generator.runner import (
    BoundedRun,
    GeneratorConfig,
)

__all__ = ["BoundedRun", "GeneratorConfig"]
