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


def _foreign_entry_schema() -> dict:
    """Manifest-entry Avro schema as a FOREIGN writer (Flink/CDC-style)
    would emit it: includes `equality_ids` (Iceberg field-id 135) in
    data_file, with entry-level sequence numbers nullable (inheriting
    from the manifest-list record when null — spec §Sequence Number
    Inheritance)."""
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {"name": "snapshot_id", "type": ["null", "long"], "default": None},
            {"name": "sequence_number", "type": ["null", "long"], "default": None},
            {"name": "file_sequence_number", "type": ["null", "long"], "default": None},
            {
                "name": "data_file",
                "type": {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {"name": "content", "type": "int"},
                        {"name": "file_path", "type": "string"},
                        {"name": "file_format", "type": "string"},
                        {"name": "record_count", "type": "long"},
                        {"name": "file_size_in_bytes", "type": "long"},
                        {
                            "name": "equality_ids",
                            "type": ["null", {"type": "array", "items": "int"}],
                            "default": None,
                        },
                    ],
                },
            },
        ],
    }


def _build_foreign_table(tmp_path, with_eq_ids=True):
    """Hand-author a complete foreign Iceberg-v2 filesystem table with a
    RAW equality-delete file (pre-compilation, as a Flink-style writer
    leaves it) plus a positional delete recorded as a file: URI:

      seq 1  data A: (1,a) (2,b) (3,c) (4,d)
      seq 2  equality delete on id ∈ {2, 3}   (applies to seq<2 only)
      seq 2  positional delete (file:URI of A, pos 0) → kills (1,a)
      seq 3  data B: (3,reborn)               (re-insert: survives)

    Expected live rows: (3,reborn), (4,d).
    """
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from minio_iceberg_polaris_lakehouse_spark import avro_io

    root = str(tmp_path / "foreign_tbl")
    mdir = f"{root}/metadata"
    ddir = f"{root}/data"
    import os

    os.makedirs(mdir)
    os.makedirs(ddir)

    a_path = f"{ddir}/a.parquet"
    pq.write_table(
        pa.table(
            {
                "id": pa.array([1, 2, 3, 4], pa.int32()),
                "name": pa.array(["a", "b", "c", "d"]),
            }
        ),
        a_path,
    )
    b_path = f"{ddir}/b.parquet"
    pq.write_table(
        pa.table({"id": pa.array([3], pa.int32()), "name": pa.array(["reborn"])}),
        b_path,
    )
    eq_path = f"{ddir}/eqdel.parquet"
    pq.write_table(pa.table({"id": pa.array([2, 3], pa.int32())}), eq_path)
    pos_path = f"{ddir}/posdel.parquet"
    pq.write_table(
        pa.table(
            {
                "file_path": pa.array([f"file://{a_path}"]),  # URI form on purpose
                "pos": pa.array([0], pa.int64()),
            }
        ),
        pos_path,
    )

    schema_json = {
        "schema-id": 0,
        "type": "struct",
        "fields": [
            {"id": 1, "name": "id", "type": "int", "required": False},
            {"id": 2, "name": "name", "type": "string", "required": False},
        ],
    }
    entry_schema = _foreign_entry_schema()

    def man(path, entries, seq):
        avro_io.write_container(
            path, entry_schema, entries, metadata={"schema": _json.dumps(schema_json)}
        )
        return path

    def dfile(content, fpath, rows, eq_ids=None):
        return {
            "status": 1,
            "snapshot_id": 3,
            "sequence_number": None,  # inherit from the manifest-list record
            "file_sequence_number": None,
            "data_file": {
                "content": content,
                "file_path": fpath,
                "file_format": "PARQUET",
                "record_count": rows,
                "file_size_in_bytes": 1,
                "equality_ids": (eq_ids if with_eq_ids else None),
            },
        }

    m_a = man(f"{mdir}/m-a.avro", [dfile(0, a_path, 4)], 1)
    m_del = man(
        f"{mdir}/m-del.avro",
        [dfile(2, eq_path, 2, eq_ids=[1]), dfile(1, pos_path, 1)],
        2,
    )
    m_b = man(f"{mdir}/m-b.avro", [dfile(0, b_path, 1)], 3)

    from minio_iceberg_polaris_lakehouse_spark.iceberg_export import (
        _MANIFEST_LIST_SCHEMA,
    )

    def mlrec(path, content, seq, rows):
        return {
            "manifest_path": path,
            "manifest_length": 1,
            "partition_spec_id": 0,
            "content": content,
            "sequence_number": seq,
            "min_sequence_number": seq,
            "added_snapshot_id": 3,
            "added_files_count": 1,
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": rows,
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
        }

    mlist = f"{mdir}/snap-3-manifest-list.avro"
    avro_io.write_container(
        mlist,
        _MANIFEST_LIST_SCHEMA,
        [mlrec(m_a, 0, 1, 4), mlrec(m_del, 1, 2, 3), mlrec(m_b, 0, 3, 1)],
    )

    meta = {
        "format-version": 2,
        "current-schema-id": 0,
        "schemas": [schema_json],
        "current-snapshot-id": 3,
        "snapshots": [
            {"snapshot-id": 3, "timestamp-ms": 1000, "schema-id": 0, "manifest-list": mlist}
        ],
    }
    with open(f"{mdir}/v1.metadata.json", "w") as f:
        _json.dump(meta, f)
    with open(f"{mdir}/version-hint.text", "w") as f:
        f.write("1")
    return root


def test_foreign_raw_equality_deletes(spark, tmp_path):
    """A foreign (Flink/CDC-style) table with a RAW content=2 equality
    delete file: keys {2,3} dead below seq 2, key 3 re-inserted at seq 3
    survives (sequence rule), and the positional tombstone written in
    file: URI form still matches (both sides normalized)."""
    root = _build_foreign_table(tmp_path)
    got = read_iceberg_table(spark, root)
    assert got.columns == ["id", "name"]
    assert _rows(got) == [(3, "reborn"), (4, "d")]


def test_foreign_equality_delete_without_ids_fails_loudly(spark, tmp_path):
    """content=2 with no equality_ids is unapplicable — must raise, not
    silently return deleted rows."""
    root = _build_foreign_table(tmp_path, with_eq_ids=False)
    with pytest.raises(ValueError, match="equality_ids"):
        read_iceberg_table(spark, root).collect()


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
