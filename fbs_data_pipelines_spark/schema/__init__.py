"""Schema registry: dictionary-driven typing (SURVEY §1.2, N8)."""

from fbs_data_pipelines_spark.schema.registry import ColumnSpec, DataDictionary

__all__ = ["ColumnSpec", "DataDictionary"]
