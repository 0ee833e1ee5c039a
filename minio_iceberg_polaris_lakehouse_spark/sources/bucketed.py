"""Bucketed tables: co-located (shuffle-free) joins for repeated fact⋈fact
joins on the same key — the pre-partitioning strategy that matters most at
100 TB, where a lineitem⋈orders shuffle moves the whole fact table every
query.

`df.write.bucketBy(n, key)` hash-partitions data into fixed buckets inside
the session catalog; two tables bucketed the same way join with zero
Exchange (asserted in tests/test_bucketed.py). This is the local-warehouse
equivalent of Iceberg's `bucket(N, col)` partition transform (the
warehouse.py `bucket16` transform covers the storage side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table_name: str, key: str, buckets: int = 16, sort: bool = True
) -> None:
    """Persist as a bucketed (and bucket-sorted) session-catalog table."""
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.format("parquet").saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def colocated_join(spark: SparkSession, left_table: str, right_table: str, key: str) -> DataFrame:
    """Join two same-bucketed tables: Spark reads bucket i of each side in
    the same task — no Exchange on either side."""
    return read_bucketed(spark, left_table).join(read_bucketed(spark, right_table), key)
