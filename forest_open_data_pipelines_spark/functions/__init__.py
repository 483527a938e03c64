from forest_open_data_pipelines_spark.functions.columns import (
    money,
    period_month,
    period_year,
    ratio,
    safe_pct_change,
)

__all__ = ["money", "period_month", "period_year", "ratio", "safe_pct_change"]
