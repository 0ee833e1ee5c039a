"""First-class Iceberg metadata reader (sources/iceberg_reader.py):
open a filesystem table from vN.metadata.json with none of the engine's
private snapshot log — Spark-distributed, field-id schema resolution,
positional-delete anti-join, time travel."""

from __future__ import annotations

import pytest

from minio_iceberg_polaris_lakehouse_spark.sources.iceberg_reader import (
    read_iceberg_table,
    resolve_metadata_path,
)
from minio_iceberg_polaris_lakehouse_spark.warehouse import Warehouse


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "warehouse"))


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_reads_plain_table_and_time_travel(wh, spark):
    t = wh.create_table("db", "r1", "id int, v string")
    t.insert_values([(1, "a"), (2, "b")])
    t.insert_values([(3, "c")])
    got = read_iceberg_table(spark, t.path)
    assert _rows(got) == _rows(t.read())
    assert got.columns == ["id", "v"]
    # time travel by snapshot id and by timestamp
    assert _rows(read_iceberg_table(spark, t.path, snapshot_id=1)) == [(1, "a"), (2, "b")]
    ts1 = t._resolve(1)["committed_at_ms"]
    assert _rows(read_iceberg_table(spark, t.path, as_of_ms=ts1)) == [(1, "a"), (2, "b")]
    # metadata file path works directly too
    assert _rows(read_iceberg_table(spark, resolve_metadata_path(t.path))) == _rows(t.read())


def test_positional_deletes_applied(wh, spark):
    t = wh.create_table(
        "db", "r2", "id int, v string",
        properties={"write.delete.mode": "merge-on-read"},
    )
    t.insert_values([(1, "a"), (2, "b"), (3, "c")])
    t.delete_where("id = 2")
    assert _rows(read_iceberg_table(spark, t.path)) == [(1, "a"), (3, "c")]


def test_compiled_equality_deletes_and_resurrection(wh, spark):
    t = wh.create_table(
        "db", "r3", "id int, v string",
        properties={
            "write.delete.mode": "merge-on-read-equality",
            "write.delete.equality-columns": "id",
        },
    )
    t.insert_values([(1, "a"), (2, "b")])
    t.delete_where("id = 2")
    t.insert_values([(2, "reborn")])  # higher sequence: survives
    assert _rows(read_iceberg_table(spark, t.path)) == [(1, "a"), (2, "reborn")]


def test_schema_evolution_field_id_resolution(wh, spark):
    """Files written before ADD/RENAME COLUMN are read under their own
    schema version and aligned to the current one by field id: renamed
    columns carry their values, added columns NULL-fill."""
    t = wh.create_table("db", "r4", "id int, name string")
    t.insert_values([(1, "x")])
    t.add_column("email", "string")
    t.rename_column("email", "contact")
    t.insert_values([(2, "y", "y@e.com")])
    got = read_iceberg_table(spark, t.path)
    assert got.columns == ["id", "name", "contact"]
    assert _rows(got) == [(1, "x", None), (2, "y", "y@e.com")]
    # rename of an ORIGINAL column: old files' values must follow the id
    t.rename_column("name", "full_name")
    t.insert_values([(3, "z", None)])
    got2 = read_iceberg_table(spark, t.path)
    assert got2.columns == ["id", "full_name", "contact"]
    assert _rows(got2) == [(1, "x", None), (2, "y", "y@e.com"), (3, "z", None)]


def test_type_widening(wh, spark):
    t = wh.create_table("db", "r5", "id int, qty int")
    t.insert_values([(1, 10)])
    t.alter_column_type("qty", "bigint")
    t.insert_values([(2, 2**40)])
    got = read_iceberg_table(spark, t.path)
    assert dict(got.dtypes)["qty"] == "bigint"
    assert _rows(got) == [(1, 10), (2, 2**40)]


def test_partitioned_table(wh, spark):
    t = wh.create_table("db", "r6", "id int, d date", partition_by="d")
    t.spark.sql("SELECT 1").collect()  # warm no-op
    t.insert_values([(1, __import__("datetime").date(2024, 1, 1)),
                     (2, __import__("datetime").date(2024, 1, 2))])
    assert _rows(read_iceberg_table(spark, t.path)) == _rows(t.read())


def test_rest_catalog_loadtable_roundtrip(spark, tmp_path):
    """The REST client's metadata-location feeds straight into the
    reader — load a table from the catalog and read it without the
    engine's Warehouse object."""
    from minio_iceberg_polaris_lakehouse_spark.rest_catalog import (
        RestCatalogClient,
        make_server,
    )

    srv, port = make_server(str(tmp_path), "cid", "sec")
    try:
        cli = RestCatalogClient(f"http://127.0.0.1:{port}", "cid", "sec")
        cli.create_catalog("cat", str(tmp_path / "cat"))
        cli.create_namespace("cat", "db")
        cli.create_table("cat", "db", "t", "id int, v string")
        wh = Warehouse(spark, str(tmp_path / "cat"))
        tab = wh.table("db", "t")

        def stage(cur):
            tab.insert_values([(1, "a")])
            return resolve_metadata_path(tab.path)

        cli.commit_with_retry("cat", "db", "t", stage)
        loc = cli.load_table("cat", "db", "t")["metadata-location"]
        assert _rows(read_iceberg_table(spark, loc)) == [(1, "a")]
    finally:
        srv.shutdown()


def test_nested_types_roundtrip(wh, spark):
    """Array/map/struct columns must survive the reader's field-id
    alignment (equal nested types pass through; the widening check must
    not choke on dict-typed schemas)."""
    t = wh.create_table(
        "db", "r7", "id int, tags array<string>, attrs map<string,int>, "
        "geo struct<lat:double,lon:double>"
    )
    t.insert_values([(1, ["a", "b"], {"k": 1}, (1.5, 2.5))])
    t.insert_values([(2, [], {}, (0.0, 0.0))])
    got = read_iceberg_table(spark, t.path)
    eng = t.read()
    assert sorted(map(str, got.collect())) == sorted(map(str, eng.collect()))
    assert dict(got.dtypes) == dict(eng.dtypes)


def test_rename_survives_snapshot_expiry(wh, spark):
    """Expiry removes a file's ADDING snapshot from the metadata doc
    while its manifest stays referenced; the reader must then take the
    file's schema from the manifest's own embedded schema metadata —
    falling back to the target schema would silently NULL the renamed
    column for every old row."""
    t = wh.create_table("db", "r8", "id int, name string")
    t.insert_values([(1, "x")])
    t.rename_column("name", "full_name")
    t.insert_values([(2, "y")])
    t.expire_snapshots(keep_last=1)  # snapshot 1 (adder of file 1) gone
    got = read_iceberg_table(spark, t.path)
    assert got.columns == ["id", "full_name"]
    assert _rows(got) == [(1, "x"), (2, "y")]


def test_short_documents_survive_ansi_mode(spark, tmp_path):
    """Shingling uses try_element_at, so a 1-2 token document yields its
    short shingle instead of aborting under spark.sql.ansi.enabled=true
    (the PySpark 4 default a driver-built session would carry before
    _configure runs)."""
    from minio_iceberg_polaris_lakehouse_spark.operators.dedup import (
        hashed_shingles,
        tokens_expr,
    )
    from pyspark.sql import functions as F

    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        df = spark.createDataFrame([("hello",), ("a b",), ("x y z w",)], "text string")
        out = df.select(tokens_expr().alias("toks")).select(
            F.size(hashed_shingles("toks")).alias("n")
        )
        ns = [r.n for r in out.collect()]
        assert ns == [1, 1, 2]
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_engine_sessions_pin_non_ansi(spark):
    """get_spark and the driver-contract _configure both pin
    spark.sql.ansi.enabled=false — the engine's expression surface (and
    its DuckDB oracles) use NULL-on-error semantics."""
    assert spark.conf.get("spark.sql.ansi.enabled") == "false"
    import __spark_entry__ as m

    spark.conf.set("spark.sql.ansi.enabled", "true")
    m._configure(spark)
    assert spark.conf.get("spark.sql.ansi.enabled") == "false"
