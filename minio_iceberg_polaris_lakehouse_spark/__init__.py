"""PySpark-native analytics engine with the capability surface of
dwdas9/minio-iceberg-polaris-lakehouse (an Iceberg/Polaris/MinIO lakehouse
tutorial stack whose compute engine is stock Spark), extended with
LLM-data-pipeline operators (dedup, similarity search, multimodal columns,
text analysis) designed for 100 TB scale.

Everything here is expressed Spark-first: declarative DataFrame/SQL plans
optimized by Catalyst, Arrow-batched pandas UDFs only where built-ins cannot
express the semantics, no driver-side loops over data.
"""

from minio_iceberg_polaris_lakehouse_spark.session import get_spark
from minio_iceberg_polaris_lakehouse_spark.sources.tables import load_table, register_views, TABLES

__all__ = ["get_spark", "load_table", "register_views", "TABLES"]
