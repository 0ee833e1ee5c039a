"""Regression pins for the round-6 ADVICE findings — each test fails on
the pre-fix code (silent delete un-application, over-strict MERGE
rejection, silent stream data loss, or a loadTable metadata race)."""

from __future__ import annotations

import pytest

from minio_iceberg_polaris_lakehouse_spark.sql_frontend import LakehouseSQL
from minio_iceberg_polaris_lakehouse_spark.streaming.table_source import TableStream
from minio_iceberg_polaris_lakehouse_spark.warehouse import (
    SnapshotNotFoundError,
    Warehouse,
    WarehouseError,
)


@pytest.fixture()
def lake(spark, tmp_path):
    return LakehouseSQL(spark, str(tmp_path / "wh"))


def test_merge_allows_duplicate_unmatched_source_rows(lake):
    """Iceberg/Spark MERGE only raises a cardinality violation when a
    TARGET row matches multiple source rows; duplicate source rows that
    match nothing are legal and all insert via WHEN NOT MATCHED. The
    pre-fix check rejected any duplicate source key."""
    lake.sql("CREATE TABLE polaris.db.mi (id INT, v STRING) USING ICEBERG")
    lake.sql("INSERT INTO polaris.db.mi VALUES (1, 'a')")
    lake.sql(
        "MERGE INTO polaris.db.mi t "
        "USING (SELECT * FROM VALUES (7, 'x'), (7, 'y'), (1, 'upd') AS s(id, v)) s "
        "ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    )
    got = sorted((r.id, r.v) for r in lake.sql("SELECT id, v FROM db.mi").collect())
    assert got == [(1, "upd"), (7, "x"), (7, "y")]
    # matched duplicates still rejected
    with pytest.raises(WarehouseError, match="multiple source rows"):
        lake.sql(
            "MERGE INTO polaris.db.mi t "
            "USING (SELECT * FROM VALUES (1, 'p'), (1, 'q') AS s(id, v)) s "
            "ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
        )


def test_stream_fails_loudly_when_checkpoint_snapshot_expired(spark, tmp_path):
    """If the checkpointed snapshot was removed by expire_snapshots, the
    skip_replacements fallback must NOT treat the first in-range snapshot
    as a replacement boundary (that silently drops the appends since the
    checkpoint). At-least-once delivery demands a loud failure."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    t = wh.create_table("db", "s", "id int")
    t.insert_values([(1,)])
    stream = TableStream(
        t, checkpoint_path=str(tmp_path / "ckpt.json"), skip_replacements=True
    )
    df, _, _ = stream.poll()
    assert df.count() == 1
    t.insert_values([(2,)])
    t.insert_values([(3,)])
    t.expire_snapshots(keep_last=1)  # checkpointed snapshot 1 is gone
    with pytest.raises(WarehouseError, match="expired"):
        stream.poll()


def test_incremental_scan_expired_raises_distinct_type(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    t = wh.create_table("db", "x", "id int")
    t.insert_values([(1,)])
    t.insert_values([(2,)])
    t.expire_snapshots(keep_last=1)
    with pytest.raises(SnapshotNotFoundError):
        t.incremental_scan(1)


def test_concurrent_loadtable_single_lazy_export(spark, tmp_path):
    """Two concurrent loadTable calls on a warehouse-created table that
    has never been exported must produce exactly one metadata export
    (one version), not race write_iceberg_metadata."""
    import concurrent.futures as cf

    from minio_iceberg_polaris_lakehouse_spark import fsio
    from minio_iceberg_polaris_lakehouse_spark.rest_catalog import (
        RestCatalogClient,
        make_server,
    )

    srv, port = make_server(str(tmp_path), "cid", "sec")
    try:
        cli = RestCatalogClient(f"http://127.0.0.1:{port}", "cid", "sec")
        cli.create_catalog("cat", str(tmp_path / "cat"))
        cli.create_namespace("cat", "db")
        # create the table BEHIND the catalog's back (warehouse API), so
        # the first loadTable triggers the lazy metadata export
        wh = Warehouse(spark, str(tmp_path / "cat"))
        tab = wh.create_table("db", "lazy", "id int")
        tab.insert_values([(1,)])

        with cf.ThreadPoolExecutor(4) as ex:
            locs = list(ex.map(lambda _: cli.load_table("cat", "db", "lazy")["metadata-location"], range(4)))
        assert len(set(locs)) == 1
        hint = fsio.read_text(f"{tab.path}/metadata/version-hint.text").strip()
        assert locs[0].endswith(f"v{hint}.metadata.json")
    finally:
        srv.shutdown()
