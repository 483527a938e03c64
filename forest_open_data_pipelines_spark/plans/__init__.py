from forest_open_data_pipelines_spark.plans.catalog import QUERIES, run_query

__all__ = ["QUERIES", "run_query"]
