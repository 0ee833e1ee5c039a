"""ALTER TABLE ... RENAME TO — Iceberg catalog rename semantics: a
metadata-pointer change only (reference stack: Polaris/HMS rename updates
the catalog entity; the table location NEVER moves — at 100 TB a rename
must be O(1), and merge-on-read tombstones record absolute data-file
paths that must stay valid)."""

from __future__ import annotations

import pytest

from minio_iceberg_polaris_lakehouse_spark.sql_frontend import LakehouseSQL
from minio_iceberg_polaris_lakehouse_spark.warehouse import Warehouse, WarehouseError


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


@pytest.fixture()
def lake(spark, tmp_path):
    return LakehouseSQL(spark, str(tmp_path / "lakewh"))


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_rename_basic_data_and_old_name_gone(wh):
    t = wh.create_table("db", "a", "id int, v string")
    t.insert_values([(1, "x"), (2, "y")])
    wh.rename_table("db", "a", "db", "b")
    assert _rows(wh.table("db", "b").read()) == [(1, "x"), (2, "y")]
    assert not wh.table("db", "a").exists()
    assert wh.list_tables("db") == ["b"]


def test_rename_preserves_snapshots_time_travel_and_mor_deletes(wh, spark):
    """The critical hazard rename-by-move would hit: MOR positional
    tombstones store absolute data-file paths. A catalog-only rename
    leaves them valid."""
    t = wh.create_table(
        "db", "m", "id int, v string", properties={"write.delete.mode": "merge-on-read"}
    )
    t.insert_values([(1, "a"), (2, "b"), (3, "c")])
    v1 = t.current_snapshot_id()
    t.delete_where("id = 2")
    wh.rename_table("db", "m", "db", "m2")
    t2 = wh.table("db", "m2")
    # tombstones still apply after rename
    assert _rows(t2.read()) == [(1, "a"), (3, "c")]
    # full snapshot history carried over; time travel works by new name
    assert _rows(t2.read(version=v1)) == [(1, "a"), (2, "b"), (3, "c")]
    assert len(t2.snapshots().collect()) == 2
    # and the renamed table keeps committing
    t2.insert_values([(4, "d")])
    assert _rows(t2.read()) == [(1, "a"), (3, "c"), (4, "d")]


def test_rename_across_namespaces(wh):
    t = wh.create_table("src", "t", "id int")
    t.insert_values([(1,), (2,)])
    wh.rename_table("src", "t", "dst", "t")
    assert wh.list_tables("src") == []
    assert wh.list_tables("dst") == ["t"]
    assert wh.table("dst", "t").read().count() == 2
    # the data physically stayed under src/ — dropping src must refuse,
    # even with cascade, because it would destroy dst.t's files
    with pytest.raises(WarehouseError, match="renamed"):
        wh.drop_namespace("src", cascade=True)
    # dropping dst (cascade) removes the table INCLUDING its out-of-dir
    # data, after which src is droppable
    wh.drop_namespace("dst", cascade=True)
    assert wh.table_locations() == {}
    wh.drop_namespace("src", cascade=True)


def test_reuse_of_old_name_allocates_fresh_dir(wh):
    t = wh.create_table("db", "a", "id int")
    t.insert_values([(1,)])
    wh.rename_table("db", "a", "db", "b")
    # a NEW table under the freed name must not clobber b's directory
    t_new = wh.create_table("db", "a", "id int, extra string")
    t_new.insert_values([(9, "n")])
    assert _rows(wh.table("db", "b").read()) == [(1,)]
    assert _rows(wh.table("db", "a").read()) == [(9, "n")]
    assert wh.list_tables("db") == ["a", "b"]
    # dropping the new a leaves b intact; dropping b clears the mapping
    wh.drop_table("db", "a")
    assert _rows(wh.table("db", "b").read()) == [(1,)]
    wh.drop_table("db", "b")
    assert wh.table_locations() == {}
    assert wh.list_tables("db") == []


def test_rename_chain(wh):
    t = wh.create_table("db", "a", "id int")
    t.insert_values([(7,)])
    wh.rename_table("db", "a", "db", "b")
    wh.rename_table("db", "b", "db", "c")
    assert wh.list_tables("db") == ["c"]
    assert _rows(wh.table("db", "c").read()) == [(7,)]
    assert not wh.table("db", "a").exists()
    assert not wh.table("db", "b").exists()
    # mapping holds exactly one entry — the chain collapsed
    assert list(wh.table_locations()) == ["db.c"]


def test_rename_guards(wh, spark):
    wh.create_table("db", "t1", "id int")
    wh.create_table("db", "t2", "id int")
    wh.create_view("db", "v", "SELECT 1 AS one")
    with pytest.raises(WarehouseError, match="exists"):
        wh.rename_table("db", "t1", "db", "t2")
    with pytest.raises(WarehouseError, match="view"):
        wh.rename_table("db", "t1", "db", "v")
    with pytest.raises(WarehouseError, match="does not exist"):
        wh.rename_table("db", "nope", "db", "x")


def test_rename_foreign_registration(wh, spark, tmp_path):
    """Foreign registrations rename as a pure catalog-key move."""
    t = wh.create_table("db", "native", "id int")
    t.insert_values([(5,)])  # every commit mirrors Iceberg open metadata
    wh.register_foreign_table("ext", "f1", t.path)
    wh.rename_table("ext", "f1", "ext", "f2")
    assert "ext.f2" in wh.foreign_tables()
    assert "ext.f1" not in wh.foreign_tables()
    assert _rows(wh.read_foreign_table("ext", "f2")) == [(5,)]


def test_rename_sql_roundtrip(lake):
    lake.sql("CREATE TABLE polaris.db.orders (id INT, v STRING) USING ICEBERG")
    lake.sql("INSERT INTO polaris.db.orders VALUES (1, 'a'), (2, 'b')")
    lake.sql("ALTER TABLE polaris.db.orders RENAME TO polaris.db.orders_v2")
    rows = _rows(lake.sql("SELECT * FROM polaris.db.orders_v2 ORDER BY id"))
    assert rows == [(1, "a"), (2, "b")]
    with pytest.raises(Exception):  # unresolved relation (Catalyst) after rename
        lake.sql("SELECT * FROM polaris.db.orders")
    shown = [r.tableName for r in lake.sql("SHOW TABLES IN polaris.db").collect()]
    assert shown == ["orders_v2"]
    # DESCRIBE works under the new name
    desc = {r[0]: r[1] for r in lake.sql("DESCRIBE TABLE polaris.db.orders_v2").collect()}
    assert desc.get("id") == "int"


def test_rename_matview_storage_refused(lake):
    lake.sql("CREATE TABLE polaris.db.base (k INT, x INT) USING ICEBERG")
    lake.sql("INSERT INTO polaris.db.base VALUES (1, 10)")
    lake.sql(
        "CREATE MATERIALIZED VIEW polaris.db.mv AS "
        "SELECT k, SUM(x) AS sx FROM polaris.db.base GROUP BY k"
    )
    with pytest.raises(WarehouseError, match="materialized"):
        lake.sql("ALTER TABLE polaris.db.mv RENAME TO polaris.db.mv2")
