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


# --------------------------------------------------------------------------
# Property fuzz: replaying the changelog reconstructs the table.
# For ANY commit sequence (appends, copy-on-write and merge-on-read
# positional deletes, equality deletes, compaction), applying the tagged
# rows in commit order — inserts add one occurrence, deletes remove one —
# must land exactly on the engine's own read. This is the consumer-side
# contract a bronze→silver MERGE depends on.
# --------------------------------------------------------------------------
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.lists(st.integers(0, 9), min_size=1, max_size=4)),
        st.tuples(st.just("delete_cow"), st.integers(0, 9)),
        st.tuples(st.just("delete_mor"), st.integers(0, 9)),
        st.tuples(st.just("delete_eq"), st.integers(0, 9)),
        st.tuples(st.just("compact"), st.just(None)),
    ),
    min_size=1,
    max_size=6,
)

_N = [0]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_OPS)
def test_changelog_replay_reconstructs_table(spark, tmp_path_factory, ops):
    wh = Warehouse(spark, str(tmp_path_factory.mktemp("cdc_fuzz")))
    _N[0] += 1
    t = wh.create_table(
        "db", f"fz{_N[0]}", "id int, v string",
        properties={"write.delete.equality-columns": "id"},
    )
    seq = 0
    for op, arg in ops:
        if op == "append":
            seq += 1
            t.insert_values([(i, f"r{seq}") for i in arg])
        elif op == "delete_cow":
            t.delete_where(f"id = {arg}", mode="copy-on-write")
        elif op == "delete_mor":
            t.delete_where(f"id = {arg}", mode="merge-on-read")
        elif op == "delete_eq":
            t.delete_where(f"id = {arg}", mode="merge-on-read-equality")
        elif op == "compact":
            try:
                t.materialize_deletes()
            except WarehouseError:
                pass
    state: Counter = Counter()
    rows = t.changes().select("id", "v", "_change_type", "_change_ordinal").collect()
    for r in sorted(rows, key=lambda r: r._change_ordinal):
        key = (r.id, r.v)
        if r._change_type == "insert":
            state[key] += 1
        else:
            state[key] -= 1
            assert state[key] >= 0, f"delete of never-inserted row {key}"
    replayed = sorted(state.elements())
    direct = sorted((r.id, r.v) for r in t.read().collect())
    assert replayed == direct


def test_mor_delete_after_equality_delete_no_double_emit(spark, tmp_path):
    """Pin of a hypothesis find: eq-delete id, then MOR-delete the same
    id. The row is already dead at the second delete, so (a) the writer
    must not tombstone it again and (b) the changelog must emit exactly
    one insert and one delete for it — a replay consumer would otherwise
    go negative."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    t = wh.create_table(
        "db", "dd", "id int, v string",
        properties={"write.delete.equality-columns": "id"},
    )
    t.insert_values([(0, "r1")])
    t.delete_where("id = 0", mode="merge-on-read-equality")
    t.delete_where("id = 0", mode="merge-on-read")  # row already dead
    rows = sorted(
        ((r.id, r.v, r._change_type) for r in t.changes().collect()),
    )
    assert rows == [(0, "r1", "delete"), (0, "r1", "insert")]
    assert t.read().count() == 0
    # same shape under MOR UPDATE: updating an eq-dead row touches nothing
    t2 = wh.create_table(
        "db", "dd2", "id int, v string",
        properties={"write.delete.equality-columns": "id"},
    )
    t2.insert_values([(0, "a"), (1, "b")])
    t2.delete_where("id = 0", mode="merge-on-read-equality")
    t2.update_where({"v": "'x'"}, "id <= 1", mode="merge-on-read")
    state: dict = {}
    for r in sorted(t2.changes().collect(), key=lambda r: r._change_ordinal):
        k = (r.id, r.v)
        state[k] = state.get(k, 0) + (1 if r._change_type == "insert" else -1)
        assert state[k] >= 0, f"negative count for {k}"
    assert sorted(k for k, n in state.items() for _ in range(n)) == [(1, "x")]
