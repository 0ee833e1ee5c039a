"""Avro layer verification, three ways:
1. round-trip through the engine's own writer/reader,
2. byte-level assertions against the Avro 1.11 spec (magic, metadata map,
   sync framing, deflate blocks),
3. cross-validation with the INDEPENDENT Java Avro implementation on
   Spark's classpath (avro-1.12.1.jar via Py4J DataFileReader) — proving
   the binary layout is real Avro, not merely self-consistent.
Then the Iceberg-specific contract: exported manifest lists + manifests
resolve to the right data files with the right partition values.
"""

from __future__ import annotations

import datetime
import json
import os
import zlib

import pytest

from minio_iceberg_polaris_lakehouse_spark import avro_io
from minio_iceberg_polaris_lakehouse_spark.warehouse import Warehouse

SCHEMA = {
    "type": "record",
    "name": "thing",
    "fields": [
        {"name": "s", "type": "string"},
        {"name": "n", "type": "long"},
        {"name": "f", "type": "double"},
        {"name": "flag", "type": "boolean"},
        {"name": "opt", "type": ["null", "int"], "default": None},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "props", "type": {"type": "map", "values": "long"}},
        {
            "name": "nested",
            "type": {
                "type": "record",
                "name": "inner",
                "fields": [{"name": "x", "type": "int"}],
            },
        },
    ],
}

RECORDS = [
    {
        "s": "hello éü世界",
        "n": -(2**62),
        "f": 3.25,
        "flag": True,
        "opt": None,
        "tags": ["a", "b"],
        "props": {"k1": 1, "k2": -2},
        "nested": {"x": 7},
    },
    {
        "s": "",
        "n": 2**62,
        "f": -0.5,
        "flag": False,
        "opt": 42,
        "tags": [],
        "props": {},
        "nested": {"x": -1},
    },
]


def test_container_roundtrip(tmp_path):
    path = str(tmp_path / "t.avro")
    avro_io.write_container(path, SCHEMA, RECORDS, metadata={"custom": "v"})
    schema, meta, records = avro_io.read_container(path)
    assert schema == SCHEMA
    assert meta["custom"] == b"v"
    assert records == RECORDS


def test_container_bytes_follow_spec(tmp_path):
    path = str(tmp_path / "t.avro")
    avro_io.write_container(path, SCHEMA, RECORDS)
    raw = open(path, "rb").read()
    # spec: 4-byte magic Obj\x01
    assert raw[:4] == b"Obj\x01"
    # file metadata map must carry avro.schema and avro.codec
    r = avro_io._Reader(raw[4:])
    n = r.read_long()
    meta = {}
    for _ in range(n):
        k = r.read_string()
        meta[k] = r.read_bytes()
    assert r.read_long() == 0  # map terminator
    assert json.loads(meta["avro.schema"]) == SCHEMA
    assert meta["avro.codec"] == b"deflate"
    sync = r.read(16)
    # one data block: count, size, deflate payload, then the SAME sync
    count = r.read_long()
    assert count == len(RECORDS)
    payload = r.read_bytes()
    zlib.decompress(payload, wbits=-15)  # raw deflate stream, no zlib header
    assert r.read(16) == sync
    assert r.pos == len(raw) - 4


def test_empty_container_roundtrip(tmp_path):
    path = str(tmp_path / "empty.avro")
    avro_io.write_container(path, SCHEMA, [])
    _, _, records = avro_io.read_container(path)
    assert records == []


def test_java_avro_reads_our_files(tmp_path, spark):
    """The Java Avro library bundled with Spark (avro-1.12.1.jar) is an
    independent implementation — if org.apache.avro.file.DataFileReader
    decodes our container byte-for-byte, the layout is genuinely Avro."""
    path = str(tmp_path / "jv.avro")
    avro_io.write_container(path, SCHEMA, RECORDS)
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    jschema = json.loads(reader.getSchema().toString())
    assert [f["name"] for f in jschema["fields"]] == [f["name"] for f in SCHEMA["fields"]]
    got = []
    while reader.hasNext():
        rec = reader.next()
        got.append(
            {
                "s": str(rec.get("s")),
                "n": rec.get("n"),
                "f": rec.get("f"),
                "flag": rec.get("flag"),
                "opt": rec.get("opt"),
                "x": rec.get("nested").get("x"),
                "n_tags": rec.get("tags").size(),
            }
        )
    reader.close()
    assert len(got) == 2
    assert got[0]["s"] == RECORDS[0]["s"]
    assert got[0]["n"] == RECORDS[0]["n"]
    assert got[0]["f"] == RECORDS[0]["f"]
    assert got[0]["flag"] is True and got[1]["flag"] is False
    assert got[0]["opt"] is None and got[1]["opt"] == 42
    assert got[0]["x"] == 7 and got[1]["x"] == -1
    assert got[0]["n_tags"] == 2 and got[1]["n_tags"] == 0


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "warehouse"))


def test_iceberg_manifest_avro_layer(wh, spark):
    """Exported Avro manifest list + manifests resolve the table's data
    files, counts and typed partition values (reference metadata tree
    README.md:169-175: snap-….avro manifest lists)."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    t = wh.create_table(
        "db", "avro_exp", "id int, ts timestamp", partition_by="ts", transform="day"
    )
    df = spark.createDataFrame(
        [(1, "2024-11-25 10:00:00"), (2, "2024-11-26 11:00:00")], "id int, ts string"
    ).select("id", F.to_timestamp("ts").alias("ts"))
    t.append(df)
    t.append(df.filter("id = 1"))

    mdir = os.path.join(t.path, "metadata")
    hint = int(open(os.path.join(mdir, "version-hint.text")).read())
    doc = json.load(open(os.path.join(mdir, f"v{hint}.metadata.json")))
    cur = [s for s in doc["snapshots"] if s["snapshot-id"] == doc["current-snapshot-id"]][0]
    assert cur["manifest-list"].endswith(".avro")

    _s, list_meta, manifests = avro_io.read_container(cur["manifest-list"])
    assert list_meta["format-version"] == b"2"
    assert len(manifests) == 2  # one manifest per commit dir
    # second dir was added by snapshot 2; first is existing there
    by_added = {m["added_snapshot_id"]: m for m in manifests}
    assert by_added[1]["existing_files_count"] + by_added[1]["added_files_count"] >= 1
    assert by_added[2]["added_files_count"] >= 1 and by_added[2]["existing_files_count"] == 0

    total = 0
    for m in manifests:
        _ms, mmeta, entries = avro_io.read_container(m["manifest_path"])
        assert mmeta["content"] == b"data"
        spec_fields = json.loads(mmeta["partition-spec"])
        assert spec_fields and spec_fields[0]["transform"] == "day"
        for e in entries:
            dfile = e["data_file"]
            assert e["status"] == 1 and e["snapshot_id"] == m["added_snapshot_id"]
            assert os.path.isfile(dfile["file_path"])
            assert pq.ParquetFile(dfile["file_path"]).metadata.num_rows == dfile["record_count"]
            total += dfile["record_count"]
            # day-transform partition value is a typed date (days since epoch)
            days = dfile["partition"]["_p_day_ts"]
            got = datetime.date(1970, 1, 1) + datetime.timedelta(days=days)
            assert got in (datetime.date(2024, 11, 25), datetime.date(2024, 11, 26))
    assert total == 3

    # the Java Avro implementation agrees on the manifest list
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(cur["manifest-list"]),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    jpaths = set()
    while reader.hasNext():
        jpaths.add(str(reader.next().get("manifest_path")))
    reader.close()
    assert jpaths == {m["manifest_path"] for m in manifests}
