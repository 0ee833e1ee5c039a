"""Iceberg v3 default values: ADD COLUMN ... DEFAULT backfills existing
files on READ (metadata-only, no rewrite), fills omitted columns on
WRITE, respects stored values (explicit NULLs included), follows
renames, and stays out of pre-evolution time travel."""

from __future__ import annotations

import pytest

from minio_iceberg_polaris_lakehouse_spark.sql_frontend import LakehouseSQL
from minio_iceberg_polaris_lakehouse_spark.warehouse import WarehouseError


@pytest.fixture()
def lake(spark, tmp_path):
    lake = LakehouseSQL(spark, str(tmp_path / "warehouse"))
    lake.sql("CREATE NAMESPACE IF NOT EXISTS db")
    lake.sql("CREATE TABLE db.t (id INT, v STRING) USING iceberg")
    lake.sql("INSERT INTO db.t VALUES (1, 'a'), (2, 'b')")
    return lake


def test_initial_default_backfills_old_files_without_rewrite(lake):
    tab = lake.wh.table("db", "t")
    files_before = tab.data_file_count()
    lake.sql("ALTER TABLE db.t ADD COLUMN score INT DEFAULT 7")
    assert tab.data_file_count() == files_before  # metadata-only
    rows = {r.id: r.score for r in lake.sql("SELECT id, score FROM db.t").collect()}
    assert rows == {1: 7, 2: 7}


def test_stored_values_and_explicit_nulls_win(lake):
    lake.sql("ALTER TABLE db.t ADD COLUMN score INT DEFAULT 7")
    lake.sql("INSERT INTO db.t VALUES (3, 'c', 30), (4, 'd', NULL)")
    rows = {r.id: r.score for r in lake.sql("SELECT id, score FROM db.t").collect()}
    # old files read the default; the new file keeps 30 AND the explicit NULL
    assert rows == {1: 7, 2: 7, 3: 30, 4: None}


def test_write_default_fills_omitted_column(lake):
    lake.sql("ALTER TABLE db.t ADD COLUMN score INT DEFAULT 7")
    tab = lake.wh.table("db", "t")
    tab.append(lake.spark.createDataFrame([(5, "e")], "id int, v string"))
    rows = {r.id: r.score for r in lake.sql("SELECT id, score FROM db.t").collect()}
    assert rows[5] == 7


def test_default_types_decimal_and_string(lake):
    lake.sql("ALTER TABLE db.t ADD COLUMN amt DECIMAL(10,2) DEFAULT 1.50")
    lake.sql("ALTER TABLE db.t ADD COLUMN tag STRING DEFAULT 'none'")
    r = lake.sql("SELECT amt, tag FROM db.t WHERE id = 1").collect()[0]
    assert str(r.amt) == "1.50"
    assert r.tag == "none"


def test_default_follows_rename_and_dies_with_drop(lake):
    lake.sql("ALTER TABLE db.t ADD COLUMN score INT DEFAULT 7")
    lake.sql("ALTER TABLE db.t RENAME COLUMN score TO points")
    rows = {r.id: r.points for r in lake.sql("SELECT id, points FROM db.t").collect()}
    assert rows == {1: 7, 2: 7}
    lake.sql("ALTER TABLE db.t DROP COLUMN points")
    tab = lake.wh.table("db", "t")
    assert tab._meta().get("column_defaults", {}) == {}


def test_time_travel_before_add_has_no_column(lake):
    tab = lake.wh.table("db", "t")
    v1 = tab.current_snapshot_id()
    lake.sql("ALTER TABLE db.t ADD COLUMN score INT DEFAULT 7")
    lake.sql("INSERT INTO db.t VALUES (3, 'c', 30)")
    old = lake.sql(f"SELECT * FROM db.t VERSION AS OF {v1}").columns
    assert "score" not in old
    now = {r.id: r.score for r in lake.sql("SELECT id, score FROM db.t").collect()}
    assert now == {1: 7, 2: 7, 3: 30}


def test_invalid_default_literal_rejected(lake):
    with pytest.raises(WarehouseError, match="DEFAULT"):
        lake.sql("ALTER TABLE db.t ADD COLUMN n INT DEFAULT 'abc'")


def test_default_composes_with_mor_delete_and_compaction(lake):
    lake.sql("ALTER TABLE db.t ADD COLUMN score INT DEFAULT 7")
    lake.sql("DELETE FROM db.t WHERE id = 1")
    rows = {r.id: r.score for r in lake.sql("SELECT id, score FROM db.t").collect()}
    assert rows == {2: 7}
    tab = lake.wh.table("db", "t")
    tab.compact()
    # compaction REWRITES the rows — the default is now materialized in
    # the new files and keeps reading back
    rows = {r.id: r.score for r in lake.sql("SELECT id, score FROM db.t").collect()}
    assert rows == {2: 7}


def test_defaults_roundtrip_through_open_metadata(lake, spark):
    """The full v3 loop: the engine declares a DEFAULT, the open export
    writes `initial-default`/`write-default` into the Iceberg schema
    JSON, and the standalone foreign reader backfills pre-evolution
    files with it — so ANY reader of the exported table sees the same
    rows the engine does."""
    import json

    from minio_iceberg_polaris_lakehouse_spark.sources.iceberg_reader import (
        read_iceberg_table,
    )

    lake.sql("ALTER TABLE db.t ADD COLUMN score INT DEFAULT 7")
    lake.sql("ALTER TABLE db.t ADD COLUMN tag STRING DEFAULT 'none'")
    lake.sql("ALTER TABLE db.t ADD COLUMN amt DECIMAL(10,2) DEFAULT 1.50")
    lake.sql("INSERT INTO db.t VALUES (3, 'c', 30, 'real', 9.99)")
    tab = lake.wh.table("db", "t")
    with open(f"{tab.path}/metadata/version-hint.text") as f:
        v = f.read().strip()
    doc = json.load(open(f"{tab.path}/metadata/v{v}.metadata.json"))
    cur = next(s for s in doc["schemas"] if s["schema-id"] == doc["current-schema-id"])
    by_name = {f["name"]: f for f in cur["fields"]}
    assert by_name["score"]["initial-default"] == 7
    assert by_name["tag"]["write-default"] == "none"
    assert by_name["amt"]["initial-default"] == "1.50"
    got = {
        r.id: (r.score, r.tag, str(r.amt))
        for r in read_iceberg_table(spark, tab.path).collect()
    }
    assert got[1] == (7, "none", "1.50")  # pre-evolution file: defaults
    assert got[3] == (30, "real", "9.99")  # stored values win


def test_column_list_insert_fills_defaults(lake):
    lake.sql("ALTER TABLE db.t ADD COLUMN score INT DEFAULT 7")
    lake.sql("INSERT INTO db.t (id, v) VALUES (10, 'j'), (11, 'k')")
    lake.sql("INSERT INTO db.t (score, id) VALUES (99, 12)")  # any order
    rows = {r.id: (r.v, r.score) for r in lake.sql("SELECT * FROM db.t").collect()}
    assert rows[10] == ("j", 7)
    assert rows[11] == ("k", 7)
    assert rows[12] == (None, 99)  # v has no default -> NULL


def test_column_list_insert_select_and_guards(lake):
    import pytest as _pytest

    from minio_iceberg_polaris_lakehouse_spark.warehouse import WarehouseError as WE

    lake.sql("ALTER TABLE db.t ADD COLUMN score INT DEFAULT 7")
    lake.sql("INSERT INTO db.t (id, v) SELECT id + 100, v FROM db.t WHERE id = 1")
    got = lake.sql("SELECT v, score FROM db.t WHERE id = 101").collect()[0]
    assert (got.v, got.score) == ("a", 7)
    with _pytest.raises(WE, match="unknown columns"):
        lake.sql("INSERT INTO db.t (nope) VALUES (1)")
    with _pytest.raises(WE, match="repeats"):
        lake.sql("INSERT INTO db.t (id, id) VALUES (1, 2)")
    with _pytest.raises(WE, match="column count"):
        lake.sql("INSERT INTO db.t (id, v) VALUES (1, 'x', 9)")


def test_set_default_changes_writes_not_history(lake):
    """SET DEFAULT is a write-default change only: pre-evolution files
    keep reading the INITIAL default; DROP DEFAULT makes omitted columns
    NULL again."""
    lake.sql("ALTER TABLE db.t ADD COLUMN score INT DEFAULT 7")
    lake.sql("ALTER TABLE db.t ALTER COLUMN score SET DEFAULT 42")
    lake.sql("INSERT INTO db.t (id, v) VALUES (10, 'j')")
    rows = {r.id: r.score for r in lake.sql("SELECT id, score FROM db.t").collect()}
    assert rows[1] == 7  # initial-default: history unchanged
    assert rows[10] == 42  # new write-default
    lake.sql("ALTER TABLE db.t ALTER COLUMN score DROP DEFAULT")
    lake.sql("INSERT INTO db.t (id, v) VALUES (11, 'k')")
    rows = {r.id: r.score for r in lake.sql("SELECT id, score FROM db.t").collect()}
    assert rows[11] is None
    # SET DEFAULT works on columns that never had one
    lake.sql("ALTER TABLE db.t ALTER COLUMN v SET DEFAULT 'dv'")
    lake.sql("INSERT INTO db.t (id) VALUES (12)")
    got = lake.sql("SELECT v FROM db.t WHERE id = 12").collect()[0]
    assert got.v == "dv"


def test_export_write_default_tracks_set_default(lake):
    import json

    lake.sql("ALTER TABLE db.t ADD COLUMN score INT DEFAULT 7")
    lake.sql("ALTER TABLE db.t ALTER COLUMN score SET DEFAULT 42")
    lake.sql("INSERT INTO db.t VALUES (3, 'c', 30)")  # triggers export
    tab = lake.wh.table("db", "t")
    with open(f"{tab.path}/metadata/version-hint.text") as f:
        v = f.read().strip()
    doc = json.load(open(f"{tab.path}/metadata/v{v}.metadata.json"))
    cur = next(s for s in doc["schemas"] if s["schema-id"] == doc["current-schema-id"])
    fld = next(f for f in cur["fields"] if f["name"] == "score")
    assert fld["initial-default"] == 7
    assert fld["write-default"] == 42
