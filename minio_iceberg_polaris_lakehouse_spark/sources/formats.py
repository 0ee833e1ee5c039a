"""File-format sources/sinks beyond parquet (reference S10: "Load real
data: CSV, JSON, Parquet files" is a declared capability,
SETUP_GUIDE_WIN.md:472, with no code — this module is the implementation).

Readers take an explicit schema by default: schema inference is a full
extra pass over the data — acceptable for a laptop CSV, catastrophic for
100 TB of JSON. `infer=True` is available for exploration only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
    infer: bool = False,
    **options,
) -> DataFrame:
    # a caller-supplied 'header' option wins over the keyword default —
    # passing both ways used to raise a bare TypeError before Spark ran
    options.setdefault("header", str(header).lower())
    r = spark.read.options(**options)
    if schema is not None:
        r = r.schema(schema)
    elif infer:
        r = r.option("inferSchema", "true")
    else:
        raise ValueError("pass schema= (or infer=True for exploration)")
    return r.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    infer: bool = False,
    **options,
) -> DataFrame:
    r = spark.read.options(**options)
    if schema is not None:
        r = r.schema(schema)
    elif not infer:
        raise ValueError("pass schema= (or infer=True for exploration)")
    return r.json(path)


def read_parquet(spark: SparkSession, path: str, **options) -> DataFrame:
    return spark.read.options(**options).parquet(path)


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_parquet(
    df: DataFrame, path: str, mode: str = "overwrite", compression: str = "zstd"
) -> None:
    """zstd parquet, matching the reference table property
    (getting_started.ipynb:140)."""
    df.write.mode(mode).option("compression", compression).parquet(path)


def read_orc(spark: SparkSession, path: str, **options) -> DataFrame:
    """ORC (Spark's built-in vectorized reader — columnar like parquet,
    self-describing footer schema, so no explicit schema required)."""
    return spark.read.options(**options).orc(path)


def write_orc(
    df: DataFrame, path: str, mode: str = "overwrite", compression: str = "zstd"
) -> None:
    df.write.mode(mode).option("compression", compression).orc(path)


def read_avro(spark: SparkSession, path: str, **options) -> DataFrame:
    """Avro via Spark's external spark-avro module when present; raises
    a clear error when the package is not on the classpath (it is not
    bundled with a stock PySpark install)."""
    try:
        return spark.read.options(**options).format("avro").load(path)
    except Exception as e:  # AnalysisException: Failed to find data source
        if "avro" in str(e).lower():
            raise RuntimeError(
                "spark-avro is not on the classpath (add "
                "org.apache.spark:spark-avro_2.13 to spark.jars.packages)"
            ) from e
        raise
