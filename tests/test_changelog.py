"""CDC changelog scan (Iceberg `create_changelog_view` semantics):
row-level insert/delete feed per snapshot window, file-level change
semantics (added files → inserts, removed files → deletes, new
positional-delete files → deletes), replace snapshots silent, and the
SQL procedure surface."""

from __future__ import annotations

import pytest

from minio_iceberg_polaris_lakehouse_spark.warehouse import Warehouse, WarehouseError


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "warehouse"))


def _changes(t, **kw):
    return sorted(
        tuple(r)
        for r in t.changes(**kw)
        .select("id", "v", "_change_type", "_commit_snapshot_id", "_change_ordinal")
        .collect()
    )


def test_appends_are_inserts(wh):
    t = wh.create_table("db", "c1", "id int, v string")
    t.insert_values([(1, "a"), (2, "b")])
    t.insert_values([(3, "c")])
    assert _changes(t) == [
        (1, "a", "insert", 1, 0),
        (2, "b", "insert", 1, 0),
        (3, "c", "insert", 2, 1),
    ]


def test_window_bounds(wh):
    t = wh.create_table("db", "c2", "id int, v string")
    t.insert_values([(1, "a")])
    t.insert_values([(2, "b")])
    t.insert_values([(3, "c")])
    # (1, 2]: only snapshot 2's insert, ordinal restarts at 0 per window
    assert _changes(t, from_version=1, to_version=2) == [(2, "b", "insert", 2, 0)]
    with pytest.raises(WarehouseError):
        t.changes(from_version=99)
    with pytest.raises(WarehouseError):
        t.changes(to_version=99)


def test_mor_delete_emits_deletes(wh):
    t = wh.create_table(
        "db", "c3", "id int, v string", properties={"write.delete.mode": "merge-on-read"}
    )
    t.insert_values([(1, "a"), (2, "b"), (3, "c")])
    t.delete_where("id = 2")
    assert _changes(t) == [
        (1, "a", "insert", 1, 0),
        (2, "b", "delete", 2, 1),
        (2, "b", "insert", 1, 0),
        (3, "c", "insert", 1, 0),
    ]


def test_cow_delete_emits_file_level_changes(wh):
    # copy-on-write DELETE rewrites the affected files: Iceberg's changelog
    # emits delete-records for ALL rows of removed files and insert-records
    # for rows of the rewritten files — net effect equals the logical delete
    t = wh.create_table("db", "c4", "id int, v string")
    t.insert_values([(1, "a"), (2, "b")])
    t.delete_where("id = 2")
    got = _changes(t, from_version=1)  # window (1, 2] — ordinal restarts at 0
    assert (2, "b", "delete", 2, 0) in got  # the deleted row
    # surviving row re-appears as delete+insert (file rewritten)
    assert (1, "a", "delete", 2, 0) in got
    assert (1, "a", "insert", 2, 0) in got
    # applying the feed yields the table: inserts minus deletes per row
    from collections import Counter

    net = Counter()
    for id_, v, typ, _sid, _o in _changes(t):
        net[(id_, v)] += 1 if typ == "insert" else -1
    alive = sorted(k for k, n in net.items() if n > 0)
    assert alive == [(1, "a")]


def test_replace_snapshots_are_silent(wh):
    t = wh.create_table("db", "c5", "id int, v string")
    t.insert_values([(1, "a")])
    t.insert_values([(2, "b")])
    before = _changes(t)
    sid = t.compact()
    assert t._resolve(sid)["operation"] == "replace"
    assert _changes(t) == before  # compaction adds no changelog rows


def test_already_tombstoned_rows_not_reemitted(wh):
    # MOR delete, then COW-style overwrite removing the old files: the
    # tombstoned row's delete was emitted by the MOR commit and must not
    # re-emit when its (already-dead) file is removed later
    t = wh.create_table(
        "db", "c6", "id int, v string", properties={"write.delete.mode": "merge-on-read"}
    )
    t.insert_values([(1, "a"), (2, "b")])
    t.delete_where("id = 2")
    t.overwrite(t.read())  # rewrites to just the live rows
    feed = _changes(t)
    assert feed.count((2, "b", "delete", 2, 1)) == 1  # MOR delete, once
    assert not any(r[0] == 2 and r[2] == "delete" and r[3] == 3 for r in feed)


def test_empty_window_has_schema(wh):
    t = wh.create_table("db", "c7", "id int, v string")
    df = t.changes()
    assert df.columns == ["id", "v", "_change_type", "_commit_snapshot_id", "_change_ordinal"]
    assert df.count() == 0


def test_sql_procedure_registers_view(spark, tmp_path):
    from minio_iceberg_polaris_lakehouse_spark.sql_frontend import LakehouseSQL

    lake = LakehouseSQL(spark, str(tmp_path / "wh"))
    lake.sql("CREATE TABLE polaris.db.cdc (id INT, v STRING) USING ICEBERG")
    lake.sql("INSERT INTO polaris.db.cdc VALUES (1, 'a'), (2, 'b')")
    lake.sql("DELETE FROM polaris.db.cdc WHERE id = 1")
    out = lake.sql(
        "CALL polaris.system.create_changelog_view(table => 'db.cdc', "
        "changelog_view => 'cdc_changes')"
    ).collect()
    assert out[0].changelog_view == "cdc_changes"
    rows = lake.sql(
        "SELECT id, _change_type FROM cdc_changes "
        "WHERE _change_type = 'delete' AND id = 1"
    ).collect()
    assert len(rows) >= 1
    # range-bounded variant through flat named args
    lake.sql(
        "CALL polaris.system.create_changelog_view(table => 'db.cdc', "
        "changelog_view => 'cdc_w1', start_snapshot_id => 1, end_snapshot_id => 2)"
    )
    w1 = lake.sql("SELECT id, _change_type FROM cdc_w1").collect()
    assert all(r._change_type in ("insert", "delete") for r in w1)
