"""Sources: batch parquet loaders + streaming source builders."""

from shortvideohybridanalyticslakehouse_spark.sources.batch import (
    load_table,
    load_tables,
    with_lineage,
)

__all__ = ["load_table", "load_tables", "with_lineage"]
