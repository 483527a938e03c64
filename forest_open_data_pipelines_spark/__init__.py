"""PySpark-native analytics engine with the query/data-processing
capabilities of julianopadua/forest-open-data-pipelines, re-expressed
Spark-first (DataFrame/SQL + Catalyst + AQE) and extended with
LLM-training-data operators (dedup, ANN similarity, text analysis,
multimodal plumbing).

See SURVEY.md §2 for the operator inventory and the reference-file
citations on each operator's docstring.
"""

from forest_open_data_pipelines_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
