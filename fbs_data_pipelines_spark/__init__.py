"""fbs_data_pipelines_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the capabilities of the reference ETL
pipeline (``PlanningLead/fbs-data-pipelines``, a Polars-based batch ETL:
CSV extract -> transform -> sheet load, with audit-log and join-based
upsert), built Spark-first:

- tables are ``pyspark.sql.DataFrame`` (lazy, Catalyst-optimized)
- transforms are compositions of built-in ``pyspark.sql.functions``
  (JVM-side, whole-stage-codegen) — no row-at-a-time Python in hot paths
- I/O is ``spark.read`` / ``df.write`` against a catalog of parquet/CSV
  tables, with driver-side adapters for row-oriented edges
- beyond-reference operators for large-scale training-data pipelines:
  dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding
  cosine), similarity search, text analysis, multimodal column plumbing

Designed for a 1000-executor cluster at ~100 TB: every operator keeps
filters/projections pushdown-able, broadcasts small sides, and avoids
driver-side collection except at explicitly-terminal row-edges.
"""

from fbs_data_pipelines_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
