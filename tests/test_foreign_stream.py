"""ForeignTableStream: poll-based micro-batches over a foreign Iceberg
table's open metadata — manifest-list diffs, at-least-once commit
protocol, loud failure on expired checkpoints and non-append intervals."""

from __future__ import annotations

import pytest

from minio_iceberg_polaris_lakehouse_spark.sources.iceberg_reader import (
    incremental_read_iceberg_table,
)
from minio_iceberg_polaris_lakehouse_spark.sources.iceberg_writer import (
    append_iceberg_table,
)
from minio_iceberg_polaris_lakehouse_spark.streaming.foreign_source import (
    ForeignTableStream,
)
from minio_iceberg_polaris_lakehouse_spark.warehouse import Warehouse, WarehouseError


def _ids(df):
    return sorted(r.id for r in df.collect())


@pytest.fixture()
def tab(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    t = wh.create_table("db", "ft", "id int, v string")
    t.insert_values([(1, "a")])
    return t


def test_incremental_read_appends_only(spark, tab):
    t = tab
    t.insert_values([(2, "b")])
    t.insert_values([(3, "c")])
    # foreign-metadata snapshot ids mirror the engine's (1,2,3)
    got = incremental_read_iceberg_table(spark, t.path, 1, 3)
    assert _ids(got) == [2, 3]
    assert _ids(incremental_read_iceberg_table(spark, t.path, 2)) == [3]
    assert incremental_read_iceberg_table(spark, t.path, 3, 3).count() == 0


def test_incremental_read_refuses_non_append_interval(spark, tab):
    t = tab
    t.insert_values([(2, "b")])
    t.delete_where("id = 1")  # copy-on-write: rewrites the manifest
    with pytest.raises(ValueError, match="replac|DELETE"):
        incremental_read_iceberg_table(spark, t.path, 1)


def test_incremental_read_schema_evolution_alignment(spark, tab):
    t = tab
    t.add_column("note", "string")
    t.rename_column("note", "memo")
    t.insert_values([(2, "b", "m2")])
    got = incremental_read_iceberg_table(spark, t.path, 1)
    assert got.columns == ["id", "v", "memo"]
    assert [tuple(r) for r in got.collect()] == [(2, "b", "m2")]


def test_stream_initial_then_appends_with_checkpoint(spark, tab, tmp_path):
    t = tab
    ckpt = str(tmp_path / "ckpt.json")
    s = ForeignTableStream(spark, t.path, checkpoint_path=ckpt)
    df, frm, cur = s.poll()
    assert (_ids(df), frm, cur) == ([1], 0, 1)
    assert s.poll() is None  # no advance
    # a FOREIGN writer appends through the open metadata
    append_iceberg_table(
        spark, t.path, spark.createDataFrame([(2, "b")], "id int, v string")
    )
    df2, frm2, cur2 = s.poll()
    assert (_ids(df2), frm2) == ([2], 1)
    # restart from the checkpoint: no re-emission
    s2 = ForeignTableStream(spark, t.path, checkpoint_path=ckpt)
    assert s2.poll() is None
    # (further writes stay on the FOREIGN path: an engine-log write
    # would re-export metadata from the engine's own snapshot log,
    # which never saw the foreign append — the documented single-owner
    # contract of mixed writers)
    append_iceberg_table(
        spark, t.path, spark.createDataFrame([(3, "c")], "id int, v string")
    )
    df3, _, _ = s2.poll()
    assert _ids(df3) == [3]


def test_stream_staged_commit_redelivers(spark, tab, tmp_path):
    t = tab
    s = ForeignTableStream(spark, t.path, checkpoint_path=str(tmp_path / "c.json"))
    s.poll()  # initial
    t.insert_values([(2, "b")])
    df, _, _ = s.poll(commit=False)
    assert _ids(df) == [2]
    # not committed: the same batch re-delivers
    df_again, _, _ = s.poll(commit=False)
    assert _ids(df_again) == [2]
    s.commit()
    assert s.poll() is None


def test_stream_expired_checkpoint_fails_loudly(spark, tab, tmp_path):
    t = tab
    s = ForeignTableStream(spark, t.path, checkpoint_path=str(tmp_path / "c.json"))
    s.poll()
    t.insert_values([(2, "b")])
    t.insert_values([(3, "c")])
    t.expire_snapshots(keep_last=1)  # snapshot 1 (the checkpoint) gone
    with pytest.raises(WarehouseError, match="expired"):
        s.poll()
