"""Streaming read of a warehouse table (streaming/table_source.py) —
the Iceberg streaming-source model: micro-batches are append snapshots
consumed in commit order, O(new data) per poll, exactly-once across
restarts via the snapshot checkpoint."""

from __future__ import annotations

import pytest

from minio_iceberg_polaris_lakehouse_spark.streaming.table_source import TableStream
from minio_iceberg_polaris_lakehouse_spark.warehouse import Warehouse, WarehouseError


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "warehouse"))


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_initial_batch_then_increments(wh):
    t = wh.create_table("db", "s1", "id int, v string")
    t.insert_values([(1, "a"), (2, "b")])
    ts = TableStream(t)
    df, frm, to = ts.poll()
    assert (frm, to) == (0, 1)
    assert _rows(df) == [(1, "a"), (2, "b")]
    assert ts.poll() is None  # no new commits
    t.insert_values([(3, "c")])
    t.insert_values([(4, "d")])
    df2, frm2, to2 = ts.poll()
    assert (frm2, to2) == (1, 3)
    assert _rows(df2) == [(3, "c"), (4, "d")]  # only the appends, once
    assert ts.poll() is None


def test_from_version_skips_history(wh):
    t = wh.create_table("db", "s2", "id int, v string")
    t.insert_values([(1, "a")])
    t.insert_values([(2, "b")])
    ts = TableStream(t, from_version=1)
    df, frm, to = ts.poll()
    assert (frm, to) == (1, 2)
    assert _rows(df) == [(2, "b")]


def test_empty_table_polls_none_until_first_commit(wh):
    t = wh.create_table("db", "s3", "id int, v string")
    ts = TableStream(t)
    assert ts.poll() is None
    t.insert_values([(9, "z")])
    df, _, _ = ts.poll()
    assert _rows(df) == [(9, "z")]


def test_replacing_snapshot_raises_by_default(wh):
    t = wh.create_table("db", "s4", "id int, v string")
    t.insert_values([(1, "a")])
    ts = TableStream(t)
    ts.poll()
    t.compact()
    with pytest.raises(WarehouseError):
        ts.poll()


def test_skip_replacements_advances_without_reemitting(wh):
    t = wh.create_table("db", "s5", "id int, v string")
    t.insert_values([(1, "a")])
    ts = TableStream(t, skip_replacements=True)
    ts.poll()
    t.compact()  # rewrites (1,'a') — consumer already saw it
    t.insert_values([(2, "b")])
    df, _, to = ts.poll()
    assert _rows(df) == [(2, "b")]  # post-rewrite append only, no re-emit
    assert to == t.current_snapshot_id()
    assert ts.poll() is None


def test_cdc_stream_emits_mor_delete_as_tagged_row(wh):
    """mode='cdc': a merge-on-read DELETE that would refuse (or skip) in
    append mode surfaces as a delete-tagged changelog row, and the
    following re-insert as an insert-tagged one."""
    t = wh.create_table(
        "db", "cdc1", "id int, v string",
        properties={"write.delete.mode": "merge-on-read"},
    )
    t.insert_values([(1, "a"), (2, "b")])
    ts = TableStream(t, mode="cdc")
    df, frm, to = ts.poll()
    assert (frm, to) == (0, 1)
    assert _rows(df.select("id", "v", "_change_type")) == [
        (1, "a", "insert"),
        (2, "b", "insert"),
    ]
    t.delete_where("id = 2")  # MOR: positional delete file, data untouched
    df2, frm2, to2 = ts.poll()
    assert (frm2, to2) == (1, 2)
    assert _rows(df2.select("id", "v", "_change_type")) == [(2, "b", "delete")]
    t.insert_values([(2, "b2")])
    df3, _, _ = ts.poll()
    assert _rows(df3.select("id", "v", "_change_type")) == [(2, "b2", "insert")]
    assert ts.poll() is None


def test_cdc_stream_exactly_once_across_checkpoint_restart(wh, tmp_path):
    """A restarted cdc stream resumes AFTER the last delivered snapshot:
    the MOR delete delivered before the crash is not re-emitted, and a
    delete committed while down is."""
    t = wh.create_table(
        "db", "cdc2", "id int, v string",
        properties={"write.delete.mode": "merge-on-read"},
    )
    ckpt = str(tmp_path / "cdc2.ckpt.json")
    t.insert_values([(1, "a"), (2, "b"), (3, "c")])
    ts = TableStream(t, checkpoint_path=ckpt, mode="cdc")
    assert ts.poll() is not None  # initial snapshot delivered
    t.delete_where("id = 2")
    df, _, _ = ts.poll()
    assert _rows(df.select("id", "_change_type")) == [(2, "delete")]
    # crash: new stream from the same checkpoint — nothing re-emitted
    ts2 = TableStream(t, checkpoint_path=ckpt, mode="cdc")
    assert ts2.poll() is None
    # a delete committed while the consumer was down IS delivered once
    t.delete_where("id = 3")
    ts3 = TableStream(t, checkpoint_path=ckpt, mode="cdc")
    df2, _, _ = ts3.poll()
    assert _rows(df2.select("id", "_change_type")) == [(3, "delete")]
    assert ts3.poll() is None


def test_cdc_bronze_to_silver_sync(wh, tmp_path):
    """The full CDC loop: a silver table applies a bronze table's
    changelog stream (deletes then inserts, in commit order) and equals
    bronze after every drain — inserts, MOR deletes, and a re-insert all
    propagate through one checkpointed stream."""
    from pyspark.sql import functions as F

    bronze = wh.create_table(
        "db", "bz", "id int, v string",
        properties={"write.delete.mode": "merge-on-read"},
    )
    silver = wh.create_table("db", "sv", "id int, v string")
    ts = TableStream(bronze, checkpoint_path=str(tmp_path / "bz.ckpt"), mode="cdc")

    def sync():
        for df, _frm, _to in ts.drain():
            for ordinal in sorted(
                r[0] for r in df.select("_change_ordinal").distinct().collect()
            ):
                batch = df.filter(F.col("_change_ordinal") == ordinal)
                dels = [r.id for r in batch.filter("_change_type = 'delete'").collect()]
                ins = batch.filter("_change_type = 'insert'").select("id", "v")
                if dels:
                    silver.delete_where(f"id IN ({', '.join(map(str, dels))})")
                if ins.head(1):
                    silver.append(ins)

    bronze.insert_values([(1, "a"), (2, "b"), (3, "c")])
    sync()
    assert _rows(silver.read()) == _rows(bronze.read())
    bronze.delete_where("id = 2")
    bronze.insert_values([(4, "d")])
    sync()
    assert _rows(silver.read()) == _rows(bronze.read()) == [(1, "a"), (3, "c"), (4, "d")]
    bronze.insert_values([(2, "b-again")])  # deleted key returns
    bronze.delete_where("id = 1")
    sync()
    assert _rows(silver.read()) == _rows(bronze.read())
    sync()  # idempotent: nothing pending, nothing double-applied
    assert _rows(silver.read()) == _rows(bronze.read())


def test_cdc_stream_compaction_emits_nothing(wh):
    """replace snapshots (compaction / materialize_deletes) rewrite bytes,
    not contents — the cdc stream advances past them with zero rows
    instead of refusing like append mode."""
    t = wh.create_table(
        "db", "cdc3", "id int, v string",
        properties={"write.delete.mode": "merge-on-read"},
    )
    t.insert_values([(1, "a"), (2, "b")])
    ts = TableStream(t, mode="cdc")
    ts.poll()
    t.delete_where("id = 1")
    ts.poll()
    t.materialize_deletes()  # replace snapshot
    out = ts.poll()
    assert out is not None
    df, _, _ = out
    assert df.count() == 0
    assert ts.poll() is None


def test_checkpoint_resume_is_exactly_once(wh, tmp_path):
    t = wh.create_table("db", "s6", "id int, v string")
    ckpt = str(tmp_path / "ckpt.json")
    t.insert_values([(1, "a")])
    ts = TableStream(t, checkpoint_path=ckpt)
    df, _, _ = ts.poll()
    assert _rows(df) == [(1, "a")]
    t.insert_values([(2, "b")])
    # simulate restart: a NEW reader on the same checkpoint resumes after
    # the last delivered snapshot — batch (1, 'a') is not replayed
    ts2 = TableStream(t, checkpoint_path=ckpt)
    df2, frm, to = ts2.poll()
    assert (frm, to) == (1, 2)
    assert _rows(df2) == [(2, "b")]
    assert ts2.poll() is None


def test_drain_collects_all_pending(wh):
    t = wh.create_table("db", "s7", "id int, v string")
    t.insert_values([(1, "a")])
    ts = TableStream(t)
    t.insert_values([(2, "b")])
    batches = ts.drain()
    # initial batch is everything at first poll time; appends landed
    # before the drain are folded into the per-poll increments
    got = sorted(r for b in batches for r in map(tuple, b[0].collect()))
    assert got == [(1, "a"), (2, "b")]


def test_mor_delete_batches_apply_tombstones(wh):
    t = wh.create_table("db", "s8", "id int, v string")
    t.insert_values([(1, "a")])
    ts = TableStream(t)
    ts.poll()
    t.insert_values([(2, "b"), (3, "c")])
    t.delete_where("id = 3", mode="merge-on-read")
    df, _, _ = ts.poll()
    # the increment reflects the delete: (3,'c') was appended AND
    # tombstoned within the interval, so the consumer never sees it
    assert _rows(df) == [(2, "b")]


def test_materialize_deletes_rewrites_only_affected_dirs(wh):
    # rewrite_position_delete_files: O(affected data) — the dir without
    # tombstones carries over by NAME (same physical files), tombstoned
    # dirs are rewritten live-rows-only, delete files drop off the snapshot
    t = wh.create_table("db", "md1", "id int, v string")
    t.insert_values([(1, "a"), (2, "b")])      # dir A — untouched
    t.insert_values([(10, "x"), (11, "y")])    # dir B — gets a tombstone
    before_dirs = set(t._resolve()["manifest"])
    t.delete_where("id = 10", mode="merge-on-read")
    assert t._resolve().get("delete_dirs")
    t.materialize_deletes()
    snap = t._resolve()
    assert snap.get("delete_dirs", []) == []
    after_dirs = set(snap["manifest"])
    assert len(before_dirs & after_dirs) == 1  # dir A survived as-is
    assert sorted(map(tuple, t.read().collect())) == [(1, "a"), (2, "b"), (11, "y")]
    # no-op when there is nothing to rewrite
    v = t.current_snapshot_id()
    assert t.materialize_deletes() == v


def test_rewrite_position_delete_files_sql(spark, tmp_path):
    from minio_iceberg_polaris_lakehouse_spark.sql_frontend import LakehouseSQL

    fe = LakehouseSQL(spark, str(tmp_path / "wh"))
    fe.sql("CREATE NAMESPACE IF NOT EXISTS db")
    fe.sql(
        "CREATE TABLE db.m (id INT, v STRING) USING iceberg "
        "TBLPROPERTIES ('write.delete.mode'='merge-on-read')"
    )
    fe.sql("INSERT INTO db.m VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    fe.sql("DELETE FROM db.m WHERE id = 2")
    out = fe.sql("CALL polaris.system.rewrite_position_delete_files(table => 'db.m')")
    assert out.collect()[0].rewritten_delete_files_count == 1
    rows = fe.sql("SELECT id, v FROM db.m ORDER BY id").collect()
    assert [(r.id, r.v) for r in rows] == [(1, "a"), (3, "c")]
    tab = fe.wh.table("db", "m")
    assert tab._resolve().get("delete_dirs", []) == []


def test_metadata_only_count(spark, tmp_path):
    # SELECT COUNT(*) FROM t answered from footer stats — no data scan
    from minio_iceberg_polaris_lakehouse_spark.sql_frontend import LakehouseSQL

    fe = LakehouseSQL(spark, str(tmp_path / "wh"))
    fe.sql("CREATE NAMESPACE IF NOT EXISTS db")
    fe.sql(
        "CREATE TABLE db.c (id INT, v STRING) USING iceberg "
        "TBLPROPERTIES ('write.delete.mode'='merge-on-read')"
    )
    fe.sql("INSERT INTO db.c VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    fe.sql("INSERT INTO db.c VALUES (4, 'd')")
    out = fe.sql("SELECT COUNT(*) AS total FROM db.c")
    assert out.schema["total"].dataType.simpleString() == "bigint"
    assert out.collect()[0].total == 4
    # merge-on-read tombstones subtract metadata-only too
    fe.sql("DELETE FROM db.c WHERE id IN (2, 4)")
    assert fe.sql("SELECT COUNT(*) FROM db.c").collect()[0][0] == 2
    assert fe.sql("SELECT count(*) from db.c").columns == ["count(1)"]
    # Python API agrees with a real scan, incl. after compaction
    tab = fe.wh.table("db", "c")
    assert tab.row_count() == tab.read().count() == 2
    tab.compact()
    assert tab.row_count() == tab.read().count() == 2
    # shapes that are NOT the fast path still work via the real plan
    assert fe.sql("SELECT COUNT(*) AS n FROM db.c WHERE id = 1").collect()[0].n == 1
    # legacy dir without stats: fast path declines, full plan answers
    import json as _json
    import os as _os

    from minio_iceberg_polaris_lakehouse_spark import warehouse as W

    d = tab._resolve()["manifest"][0]
    _os.remove(_os.path.join(tab.path, d, ".stats.json"))
    W._STATS_CACHE.clear()
    assert tab.row_count() is None
    assert fe.sql("SELECT COUNT(*) AS n FROM db.c").collect()[0].n == 2


def test_uncommitted_batch_redelivered(wh, spark, tmp_path):
    """poll(commit=False) + commit() — foreachBatch's contract: a batch
    whose sink crashed before commit() is re-delivered by the next poll
    AND by a restarted stream; after commit() it is not."""
    t = wh.create_table("db", "ack", "id int")
    t.insert_values([(1,)])
    ck = str(tmp_path / "ck.json")
    s = TableStream(t, checkpoint_path=ck)
    b = s.poll(commit=False)
    assert b is not None and b[0].count() == 1
    # sink "crashed": no commit — the same batch comes again
    b2 = s.poll(commit=False)
    assert b2 is not None and (b2[1], b2[2]) == (b[1], b[2])
    # and a RESTARTED stream re-delivers it too (checkpoint not advanced)
    s_restart = TableStream(t, checkpoint_path=ck)
    b3 = s_restart.poll(commit=False)
    assert b3 is not None and b3[0].count() == 1
    s_restart.commit()
    assert s_restart.poll() is None
    # restart after commit: nothing re-delivered
    assert TableStream(t, checkpoint_path=ck).poll() is None


def test_skip_replacements_handles_cow_delete(wh, spark):
    """Copy-on-write DELETE rewrites the manifest (operation 'delete'),
    which incremental_scan rejects; skip_replacements must find the
    replacement boundary by the same manifest-subset rule instead of
    trusting operation names (pre-fix: max([]) ValueError)."""
    t = wh.create_table("db", "cowskip", "id int")
    t.insert_values([(1,), (2,)])
    s = TableStream(t, skip_replacements=True)
    s.poll()  # initial batch
    t.delete_where("id = 1", mode="copy-on-write")  # replacing snapshot
    t.insert_values([(3,)])
    b = s.poll()
    assert b is not None
    # only the append AFTER the rewrite is emitted (consumers saw 1,2)
    assert sorted(r.id for r in b[0].collect()) == [3]


def test_skip_replacements_ignores_wap_branch_snapshots(wh, spark):
    """A WAP-branch-staged snapshot between two main commits must not
    become the recovery base (it is invisible to main; using its id
    makes the retried incremental scan raise)."""
    t = wh.create_table("db", "wapskip", "id int")
    t.insert_values([(1,)])
    s = TableStream(t, skip_replacements=True)
    s.poll()
    t.overwrite(spark.createDataFrame([(9,)], "id int"))  # replacing on main
    t.create_ref("audit", "BRANCH")
    t.insert_values([(99,)], branch="audit")  # branch-staged snapshot
    t.insert_values([(2,)])  # main append
    b = s.poll()
    assert b is not None
    assert sorted(r.id for r in b[0].collect()) == [2]
