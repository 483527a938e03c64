from forest_open_data_pipelines_spark.sinks.layout import (
    compact_parquet,
    parquet_data_file_sizes,
    write_sorted_layout,
)
from forest_open_data_pipelines_spark.sinks.writers import (
    write_bucketed_table,
    write_incremental_by_year,
    write_partitioned,
)

__all__ = [
    "compact_parquet",
    "parquet_data_file_sizes",
    "write_bucketed_table",
    "write_incremental_by_year",
    "write_partitioned",
    "write_sorted_layout",
]
