"""Iceberg partition statistics files (compute_partition_stats): the
spec's per-partition stats Parquet referenced from table metadata's
`partition-statistics` list, written by the engine and read back
through the open format alone (foreign `.partitions`)."""

from __future__ import annotations

import json
import tempfile

import pytest

from minio_iceberg_polaris_lakehouse_spark import fsio
from minio_iceberg_polaris_lakehouse_spark.sql_frontend import LakehouseSQL
from minio_iceberg_polaris_lakehouse_spark.sources.iceberg_reader import (
    read_iceberg_partitions,
    resolve_metadata_path,
)
from minio_iceberg_polaris_lakehouse_spark.warehouse import WarehouseError


@pytest.fixture()
def lake(spark):
    return LakehouseSQL(spark, tempfile.mkdtemp(prefix="lh_partstats_"))


def _mk(lake):
    lake.sql(
        "CREATE TABLE polaris.db.u (id INT, name STRING, d DATE) USING ICEBERG "
        "PARTITIONED BY (d)"
    )
    lake.sql(
        "INSERT INTO db.u VALUES (1,'a','2025-01-01'),(2,'b','2025-01-02'),"
        "(3,'c','2025-01-01')"
    )
    lake.sql("INSERT INTO db.u VALUES (4,'d','2025-01-02')")


def test_partition_stats_file_matches_partitions_table(lake):
    _mk(lake)
    out = lake.sql(
        "CALL polaris.system.compute_partition_stats(table => 'db.u')"
    ).collect()[0]
    assert out.partitions_count == 2
    t = lake.wh.table("db", "u")
    md = json.loads(fsio.read_text(resolve_metadata_path(t.path)))
    entry = md["partition-statistics"][0]
    assert entry["snapshot-id"] == t.current_snapshot_id()
    assert entry["file-size-in-bytes"] == len(fsio.read_bytes(entry["statistics-path"]))
    # the stats file agrees with the native .partitions metadata view
    native = {
        r.partition: (r.record_count, r.file_count)
        for r in t.partitions_table().collect()
    }
    foreign = {
        r.partition: (r.record_count, r.file_count)
        for r in read_iceberg_partitions(lake.spark, t.path).collect()
    }
    assert foreign == native
    # last-updated attribution: the 01-01 partition was only touched by
    # snapshot 1, the 01-02 partition by snapshot 2
    upd = {
        r.partition: r.last_updated_snapshot_id
        for r in read_iceberg_partitions(lake.spark, t.path).collect()
    }
    assert upd == {"_p_identity_d=2025-01-01": 1, "_p_identity_d=2025-01-02": 2}


def test_foreign_partitions_sql_surface(lake):
    _mk(lake)
    lake.sql("CALL polaris.system.compute_partition_stats(table => 'db.u')")
    t = lake.wh.table("db", "u")
    lake.sql(
        f"CALL polaris.system.register_table(table => 'ext.u', metadata_file => '{t.path}')"
    )
    rows = lake.sql(
        "SELECT partition, record_count, file_count FROM ext.u.partitions "
        "ORDER BY partition"
    ).collect()
    assert [(r.partition, r.record_count, r.file_count) for r in rows] == [
        ("_p_identity_d=2025-01-01", 2, 2),
        ("_p_identity_d=2025-01-02", 2, 2),
    ]
    # without a published stats file the foreign surface refuses loudly
    lake.sql("CREATE TABLE polaris.db.v (id INT) USING ICEBERG")
    lake.sql("INSERT INTO db.v VALUES (1)")
    tv = lake.wh.table("db", "v")
    lake.sql(
        f"CALL polaris.system.register_table(table => 'ext.v', metadata_file => '{tv.path}')"
    )
    with pytest.raises(Exception, match="no partition-statistics"):
        lake.sql("SELECT * FROM ext.v.partitions").collect()


def test_delete_counts_and_unpartitioned(lake, spark):
    lake.sql(
        "CREATE TABLE polaris.db.m (id INT, v STRING) USING ICEBERG "
        "TBLPROPERTIES ('write.delete.mode'='merge-on-read')"
    )
    lake.sql("INSERT INTO db.m VALUES (1,'a'),(2,'b'),(3,'c')")
    lake.sql("DELETE FROM db.m WHERE id = 2")
    lake.sql("CALL polaris.system.compute_partition_stats(table => 'db.m')")
    t = lake.wh.table("db", "m")
    r = read_iceberg_partitions(spark, t.path).collect()[0]
    assert r.partition is None  # unpartitioned: one null-partition row
    assert r.record_count == 3  # data-file rows (tombstones separate)
    assert r.position_delete_record_count == 1
    # file count depends on write parallelism (an empty part file may
    # accompany the tombstone under high local parallelism) — pin the
    # record count above, only require at least one delete file here
    assert r.position_delete_file_count >= 1
    # spec: total_record_count is the count AFTER applying deletes —
    # 3 data rows minus 1 position-delete tombstone (r8 advice: it was
    # published equal to data_record_count, inflating totals)
    import io

    import pyarrow.parquet as pq

    md = json.loads(fsio.read_text(resolve_metadata_path(t.path)))
    stats_path = md["partition-statistics"][0]["statistics-path"]
    tbl = pq.read_table(io.BytesIO(fsio.read_bytes(stats_path))).to_pylist()
    assert tbl[0]["total_record_count"] == 2


def test_empty_table_refused(lake):
    lake.sql("CREATE TABLE polaris.db.e (id INT) USING ICEBERG")
    with pytest.raises(WarehouseError, match="no snapshots"):
        lake.wh.table("db", "e").compute_partition_stats()
