"""Central query registry.

Every operator the engine implements registers here as a named query:
a Spark builder ``(spark, sf_dir) -> DataFrame`` plus (when the semantics
are SQL-expressible) an equivalent ANSI-SQL oracle string that DuckDB runs
on the same parquet tables. `__spark_entry__.py` re-exports this registry
for the driver; `tests/test_oracle_parity.py` replays the exact same
comparison locally.

Determinism rules every registered query follows (so that a value-hash
comparison against another engine is meaningful):
- Every computed column is aliased identically on both sides.
- Floating-point SUMs go through an exact decimal accumulation
  (``SUM(CAST(x AS DECIMAL(18,4)))``) then cast back to DOUBLE — IEEE
  double addition is order-sensitive and Spark/DuckDB (and Spark with
  itself, under AQE) would otherwise disagree in the last ulps.
- Integer-typed aggregates are cast explicitly (DuckDB SUM(BIGINT) is
  HUGEINT, Spark's is BIGINT; DuckDB year() is BIGINT, Spark's is INT).
- ORDER BY always ends with a unique tiebreaker column.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    spark: SparkQuery
    oracle: str | None  # DuckDB SQL; None → driver does a rows-only check
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a Spark query builder under ``name``."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, spark=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    """Import every operator module (side effect: registration) and return
    the full registry."""
    import minio_iceberg_polaris_lakehouse_spark.operators.relational  # noqa: F401
    import minio_iceberg_polaris_lakehouse_spark.operators.relational2  # noqa: F401
    import minio_iceberg_polaris_lakehouse_spark.operators.relational3  # noqa: F401
    import minio_iceberg_polaris_lakehouse_spark.operators.tpch_extra  # noqa: F401
    import minio_iceberg_polaris_lakehouse_spark.operators.tpch_more  # noqa: F401
    import minio_iceberg_polaris_lakehouse_spark.operators.relational4  # noqa: F401
    import minio_iceberg_polaris_lakehouse_spark.operators.events  # noqa: F401
    import minio_iceberg_polaris_lakehouse_spark.operators.reference_golden  # noqa: F401
    import minio_iceberg_polaris_lakehouse_spark.operators.windows  # noqa: F401
    import minio_iceberg_polaris_lakehouse_spark.operators.setops  # noqa: F401
    import minio_iceberg_polaris_lakehouse_spark.operators.skew  # noqa: F401
    import minio_iceberg_polaris_lakehouse_spark.operators.dedup  # noqa: F401
    import minio_iceberg_polaris_lakehouse_spark.operators.similarity  # noqa: F401
    import minio_iceberg_polaris_lakehouse_spark.functions.text  # noqa: F401
    import minio_iceberg_polaris_lakehouse_spark.functions.scalars  # noqa: F401
    import minio_iceberg_polaris_lakehouse_spark.functions.udfs  # noqa: F401
    import minio_iceberg_polaris_lakehouse_spark.streaming.windows  # noqa: F401
    import minio_iceberg_polaris_lakehouse_spark.multimodal.binary  # noqa: F401

    return dict(_REGISTRY)
