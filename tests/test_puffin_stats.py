"""ANALYZE → Puffin statistics round-trip: the open-format half of the
statistics story. ANALYZE writes per-column apache-datasketches-theta-v1
blobs into a Puffin file, references it from the exported metadata's
`statistics` list, and both the native `.statistics` metadata table and
a foreign registration read NDV back through the open format alone —
plus Java DataSketches itself parsing the blobs (the independent
consumer)."""

from __future__ import annotations

import json
import tempfile

import pytest

from minio_iceberg_polaris_lakehouse_spark import fsio
from minio_iceberg_polaris_lakehouse_spark import puffin as PUF
from minio_iceberg_polaris_lakehouse_spark import theta as TH
from minio_iceberg_polaris_lakehouse_spark.sql_frontend import LakehouseSQL
from minio_iceberg_polaris_lakehouse_spark.sources.iceberg_reader import (
    read_iceberg_statistics,
    resolve_metadata_path,
)


@pytest.fixture()
def lake(spark):
    return LakehouseSQL(spark, tempfile.mkdtemp(prefix="lh_pstats_"))


def _mk(lake):
    lake.sql(
        "CREATE TABLE polaris.db.t (id INT, v STRING, amt DECIMAL(10,2), ts TIMESTAMP)"
        " USING ICEBERG"
    )
    lake.sql(
        "INSERT INTO db.t VALUES"
        " (1, 'a', 10.50, TIMESTAMP '2025-01-01 00:00:00'),"
        " (2, 'b', 20.00, TIMESTAMP '2025-01-02 00:00:00'),"
        " (3, 'a', 10.50, TIMESTAMP '2025-01-01 00:00:00'),"
        " (4, 'b', NULL, NULL)"
    )


def test_statistics_in_exported_metadata(lake):
    _mk(lake)
    lake.sql("ANALYZE TABLE db.t COMPUTE STATISTICS FOR ALL COLUMNS")
    t = lake.wh.table("db", "t")
    md = json.loads(fsio.read_text(resolve_metadata_path(t.path)))
    assert len(md["statistics"]) == 1
    e = md["statistics"][0]
    assert e["snapshot-id"] == t.current_snapshot_id()
    buf = fsio.read_bytes(e["statistics-path"])
    assert e["file-size-in-bytes"] == len(buf)
    footer = PUF.read_puffin_footer(buf)
    # independent parse: every blob is a well-formed compact theta sketch
    # whose decoded estimate equals the stamped ndv property
    by_field = {}
    for bm in footer["blobs"]:
        assert bm["type"] == "apache-datasketches-theta-v1"
        payload = PUF.read_puffin_blob(buf, bm)
        est = int(round(TH.sketch_estimate(payload)))
        assert est == int(bm["properties"]["ndv"])
        by_field[bm["fields"][0]] = est
    # id=4 distinct, v=2 ('a','b'; NULL not sketched), amt=2, ts=2
    assert by_field == {1: 4, 2: 2, 3: 2, 4: 2}


def test_statistics_metadata_table_native_and_foreign(lake):
    _mk(lake)
    lake.sql("ANALYZE TABLE db.t COMPUTE STATISTICS FOR ALL COLUMNS")
    rows = {
        r.column: (r.ndv, r.ndv_property)
        for r in lake.sql("SELECT * FROM db.t.statistics").collect()
    }
    assert rows == {"id": (4, 4), "v": (2, 2), "amt": (2, 2), "ts": (2, 2)}
    t = lake.wh.table("db", "t")
    lake.sql(
        f"CALL polaris.system.register_table(table => 'ext.t', metadata_file => '{t.path}')"
    )
    frows = {
        r.column: r.ndv for r in lake.sql("SELECT * FROM ext.t.statistics").collect()
    }
    assert frows == {"id": 4, "v": 2, "amt": 2, "ts": 2}


def test_java_datasketches_reads_analyze_blobs(lake, spark):
    _mk(lake)
    lake.sql("ANALYZE TABLE db.t COMPUTE STATISTICS FOR ALL COLUMNS")
    t = lake.wh.table("db", "t")
    md = json.loads(fsio.read_text(resolve_metadata_path(t.path)))
    buf = fsio.read_bytes(md["statistics"][0]["statistics-path"])
    footer = PUF.read_puffin_footer(buf)
    jvm = spark._jvm
    for bm in footer["blobs"]:
        payload = PUF.read_puffin_blob(buf, bm)
        mem = jvm.org.apache.datasketches.memory.Memory.wrap(bytearray(payload))
        jsk = jvm.org.apache.datasketches.theta.Sketches.wrapCompactSketch(mem)
        assert int(round(jsk.getEstimate())) == int(bm["properties"]["ndv"])


def test_reanalyze_replaces_stats_for_snapshot(lake):
    _mk(lake)
    lake.sql("ANALYZE TABLE db.t COMPUTE STATISTICS FOR COLUMNS id")
    lake.sql("INSERT INTO db.t VALUES (9, 'z', 1.00, NULL)")
    lake.sql("ANALYZE TABLE db.t COMPUTE STATISTICS FOR COLUMNS id, v")
    t = lake.wh.table("db", "t")
    md = json.loads(fsio.read_text(resolve_metadata_path(t.path)))
    # one entry per analyzed snapshot; the latest covers the new commit
    snaps = [e["snapshot-id"] for e in md["statistics"]]
    assert len(snaps) == len(set(snaps)) == 2
    rows = {r.column: r.ndv for r in t.statistics_table().collect()}
    # both snapshots' stats visible; latest id NDV=5, v NDV=3
    latest = {
        r.column: r.ndv
        for r in t.statistics_table()
        .filter(f"snapshot_id = {t.current_snapshot_id()}")
        .collect()
    }
    assert latest == {"id": 5, "v": 3}
    assert rows["id"] in (4, 5)  # map holds one of the two snapshots' rows


def test_estimation_mode_at_high_ndv(lake, spark):
    # >k distinct values: the sketch goes to estimation mode and the
    # estimate stays within KMV error; Java agrees with our decoder
    df = spark.range(0, 20000).selectExpr("CAST(id AS INT) AS id")
    lake.wh.create_table("db", "big", df.schema).append(df)
    t = lake.wh.table("db", "big")
    t.analyze(["id"])
    md = json.loads(fsio.read_text(resolve_metadata_path(t.path)))
    buf = fsio.read_bytes(md["statistics"][-1]["statistics-path"])
    footer = PUF.read_puffin_footer(buf)
    bm = footer["blobs"][0]
    payload = PUF.read_puffin_blob(buf, bm)
    ents, theta = TH.deserialize_compact(payload)
    assert len(ents) == 4096 and theta <= (1 << 63) - 1
    assert TH.sketch_estimate(payload) == pytest.approx(20000, rel=0.05)
    jvm = spark._jvm
    mem = jvm.org.apache.datasketches.memory.Memory.wrap(bytearray(payload))
    jsk = jvm.org.apache.datasketches.theta.Sketches.wrapCompactSketch(mem)
    assert jsk.getEstimate() == pytest.approx(TH.sketch_estimate(payload))


def test_statistics_pruned_after_snapshot_expiry(lake):
    _mk(lake)
    lake.sql("ANALYZE TABLE db.t COMPUTE STATISTICS FOR COLUMNS id")
    lake.sql("INSERT INTO db.t VALUES (9, 'z', 1.00, NULL)")
    lake.sql("CALL polaris.system.expire_snapshots(table => 'db.t', retain_last => 1)")
    t = lake.wh.table("db", "t")
    md = json.loads(fsio.read_text(resolve_metadata_path(t.path)))
    # the analyzed snapshot expired: the exported statistics list must
    # not dangle a reference to it
    assert md["statistics"] == []


def test_expire_snapshots_deletes_dead_stats_files(lake):
    """Iceberg's expireSnapshots deletes statistics files of expired
    snapshots — ours too: the meta entries AND the Puffin/Parquet files
    go; the live snapshot's stats survive."""
    _mk(lake)
    lake.sql("ANALYZE TABLE db.t COMPUTE STATISTICS FOR COLUMNS id")
    t = lake.wh.table("db", "t")
    md1 = json.loads(fsio.read_text(resolve_metadata_path(t.path)))
    old_path = md1["statistics"][0]["statistics-path"]
    lake.sql("INSERT INTO db.t VALUES (9, 'z', 1.00, NULL)")
    lake.sql("ANALYZE TABLE db.t COMPUTE STATISTICS FOR COLUMNS id")
    t2 = lake.wh.table("db", "t")
    md2 = json.loads(fsio.read_text(resolve_metadata_path(t2.path)))
    new_path = next(
        e["statistics-path"]
        for e in md2["statistics"]
        if e["snapshot-id"] == t2.current_snapshot_id()
    )
    lake.sql("CALL polaris.system.expire_snapshots(table => 'db.t', retain_last => 1)")
    assert not fsio.exists(old_path)  # dead stats file deleted
    assert fsio.exists(new_path)  # live snapshot's stats survive
    md3 = json.loads(fsio.read_text(resolve_metadata_path(t2.path)))
    assert [e["statistics-path"] for e in md3["statistics"]] == [new_path]
