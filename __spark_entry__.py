"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query at sf0.001; `queries()` exposes one
callable per implemented operator (SURVEY.md §2); `oracle_sql()` gives the
DuckDB-equivalent SQL for every SQL-expressible query. All three delegate
to the engine's central registry
(minio_iceberg_polaris_lakehouse_spark/registry.py).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from minio_iceberg_polaris_lakehouse_spark.registry import all_queries  # noqa: E402
from minio_iceberg_polaris_lakehouse_spark.session import ship_package  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _configure(spark: SparkSession) -> SparkSession:
    """Session confs the engine depends on (safe to set at runtime on a
    session the driver built itself)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # non-ANSI semantics: NULL (not an error) for cast failures,
    # array-index misses, and division by zero — matching the DuckDB
    # oracles on edge rows (empty docs, short docs, odd JSON)
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # INT96 timestamps carry no parquet stats → would blind file skipping
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    ship_package(spark)
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (revenue by nation) on /root/testdata/sf0.001."""
    q = all_queries()["flagship_revenue_by_nation"]
    return q.spark(_configure(spark), SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        return lambda spark, sf_dir: fn(_configure(spark), sf_dir)

    return {name: wrap(q.spark) for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted entries (hash-family or
    Python-kernel operators) get the driver's rows-only check."""
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
