from forest_open_data_pipelines_spark.sinks.writers import (
    write_bucketed_table,
    write_incremental_by_year,
    write_partitioned,
)

__all__ = [
    "write_bucketed_table",
    "write_incremental_by_year",
    "write_partitioned",
]
