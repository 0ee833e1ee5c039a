"""Merge-on-read EQUALITY deletes (Iceberg v2's second delete-file type,
the one streaming/CDC writers produce): key-value delete files applied by
sequence number — rows appended AFTER the delete survive even with the
same key, the semantic that distinguishes equality from positional."""

from __future__ import annotations

import pytest

from minio_iceberg_polaris_lakehouse_spark.warehouse import Warehouse, WarehouseError


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "warehouse"))


def _t(wh, name):
    return wh.create_table(
        "db",
        name,
        "id int, v string",
        properties={
            "write.delete.mode": "merge-on-read-equality",
            "write.delete.equality-columns": "id",
        },
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_basic_equality_delete(wh):
    t = _t(wh, "e1")
    t.insert_values([(1, "a"), (2, "b"), (3, "c")])
    t.delete_where("id = 2")
    assert _rows(t.read()) == [(1, "a"), (3, "c")]
    snap = t._resolve()
    assert snap["manifest"], "data files untouched"
    assert snap["eq_deletes"] and snap["eq_deletes"][0]["cols"] == ["id"]
    assert snap["summary"]["added-equality-deletes"] == 1


def test_reinserted_key_survives_sequence_rule(wh):
    t = _t(wh, "e2")
    t.insert_values([(1, "a"), (2, "b")])
    t.delete_where("id = 2")
    # the key comes BACK: its new data file has a higher sequence than
    # the delete file, so the equality delete must not touch it
    t.insert_values([(2, "b-reborn")])
    assert _rows(t.read()) == [(1, "a"), (2, "b-reborn")]
    # while the ORIGINAL row stays dead
    assert t.read().count() == 2


def test_requires_equality_columns_property(wh):
    t = wh.create_table("db", "e3", "id int, v string")
    t.insert_values([(1, "a")])
    with pytest.raises(WarehouseError):
        t.delete_where("id = 1", mode="merge-on-read-equality")


def test_mix_with_positional_deletes(wh):
    t = _t(wh, "e4")
    t.insert_values([(1, "a"), (2, "b"), (3, "c"), (4, "d")])
    t.delete_where("id = 2")  # equality (table default)
    t.delete_where("id = 4", mode="merge-on-read")  # positional
    assert _rows(t.read()) == [(1, "a"), (3, "c")]
    snap = t._resolve()
    assert snap["delete_dirs"] and snap["eq_deletes"]


def test_metadata_scan_flags_equality_deleted_rows(wh):
    t = _t(wh, "e5")
    t.insert_values([(1, "a"), (2, "b")])
    t.delete_where("id = 2")
    t.insert_values([(2, "reborn")])
    flags = {
        (r.id, r.v): r._deleted
        for r in t.read(metadata_columns=True).collect()
    }
    assert flags[(1, "a")] is False
    assert flags[(2, "b")] is True  # dead: sequence predates the delete
    assert flags[(2, "reborn")] is False  # alive: appended after


def test_changelog_emits_equality_deletes(wh):
    t = _t(wh, "e6")
    t.insert_values([(1, "a"), (2, "b")])
    t.delete_where("id = 2")
    feed = sorted(
        tuple(r)
        for r in t.changes().select("id", "v", "_change_type", "_change_ordinal").collect()
    )
    assert feed == [
        (1, "a", "insert", 0),
        (2, "b", "delete", 1),
        (2, "b", "insert", 0),
    ]


def test_time_travel_and_scan_respect_equality_deletes(wh):
    t = _t(wh, "e7")
    v1 = t.insert_values([(1, "a"), (2, "b")])
    t.delete_where("id = 2")
    assert _rows(t.read(version=v1)) == [(1, "a"), (2, "b")]
    assert _rows(t.scan(eq={"id": 2})) == []
    assert _rows(t.scan(between={"id": (1, 3)})) == [(1, "a")]


def test_materialize_folds_equality_deletes(wh):
    t = _t(wh, "e8")
    t.insert_values([(1, "a"), (2, "b"), (3, "c")])
    t.delete_where("id = 2")
    assert t.row_count() is None  # not derivable from footers
    t.materialize_deletes()
    snap = t._resolve()
    assert not snap.get("eq_deletes") and not snap.get("delete_dirs")
    assert _rows(t.read()) == [(1, "a"), (3, "c")]
    assert t.row_count() == 2  # metadata-only count valid again


def test_incremental_scan_applies_equality_deletes(wh):
    t = _t(wh, "e9")
    v1 = t.insert_values([(1, "a")])
    t.insert_values([(2, "b"), (3, "c")])
    t.delete_where("id = 3")
    # appends since v1, minus the equality-deleted row
    assert _rows(t.incremental_scan(v1)) == [(2, "b")]


def test_files_table_reports_content_2(wh):
    t = _t(wh, "e10")
    t.insert_values([(1, "a"), (2, "b")])
    t.delete_where("id = 1")
    contents = {r.content for r in t.files().collect()}
    assert 2 in contents  # EQUALITY_DELETES
    assert 0 in contents


def test_expire_and_orphans_keep_live_eq_files(wh):
    t = _t(wh, "e11")
    t.insert_values([(1, "a"), (2, "b")])
    t.delete_where("id = 2")
    t.insert_values([(3, "c")])
    t.expire_snapshots(keep_last=1)
    t.remove_orphan_files()
    assert _rows(t.read()) == [(1, "a"), (3, "c")]
