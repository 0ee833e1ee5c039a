"""CSV/JSON/Parquet source-sink roundtrips (reference S10)."""

from __future__ import annotations

from minio_iceberg_polaris_lakehouse_spark.sources import formats
from minio_iceberg_polaris_lakehouse_spark.sources.tables import load_table

import pytest


def _sample(spark, sf_dir):
    return load_table(spark, sf_dir, "nation")


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    df = _sample(spark, sf_dir)
    p = str(tmp_path / "nation_csv")
    formats.write_csv(df, p)
    back = formats.read_csv(spark, p, schema="n_nationkey int, n_name string, n_regionkey int")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_json_roundtrip(spark, sf_dir, tmp_path):
    df = _sample(spark, sf_dir)
    p = str(tmp_path / "nation_json")
    formats.write_json(df, p)
    back = formats.read_json(spark, p, schema="n_nationkey int, n_name string, n_regionkey int")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_parquet_roundtrip_zstd(spark, sf_dir, tmp_path):
    df = _sample(spark, sf_dir)
    p = str(tmp_path / "nation_pq")
    formats.write_parquet(df, p)
    back = formats.read_parquet(spark, p)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    import glob

    assert glob.glob(f"{p}/*.zstd.parquet") or glob.glob(f"{p}/*zstd*"), "zstd codec in filenames"


def test_csv_requires_schema_or_infer(spark, tmp_path):
    with pytest.raises(ValueError):
        formats.read_csv(spark, str(tmp_path), schema=None)


def test_orc_roundtrip(spark, tmp_path):
    from minio_iceberg_polaris_lakehouse_spark.sources.formats import read_orc, write_orc

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None)], "id int, v string, x double"
    )
    p = str(tmp_path / "orc")
    write_orc(df, p)
    got = read_orc(spark, p)
    assert sorted(map(tuple, got.collect())) == [(1, "a", 1.5), (2, "b", None)]
    assert [f.dataType.simpleString() for f in got.schema.fields] == [
        "int", "string", "double",
    ]


def test_avro_clear_error_without_package(spark, tmp_path):
    import pytest

    from minio_iceberg_polaris_lakehouse_spark.sources.formats import read_avro

    try:
        read_avro(spark, str(tmp_path / "nope"))
    except RuntimeError as e:
        assert "spark-avro" in str(e)
    except Exception:
        pytest.skip("spark-avro present; error-path not reachable")
