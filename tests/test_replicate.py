"""CDC replication: a native table mirrors a FOREIGN Iceberg table by
applying its changelog (streaming/replicate.py) — inserts via upsert,
pure deletes via delete_keys, commits in ordinal order. Plus the
delete_keys primitive itself."""

from __future__ import annotations

import pytest

from minio_iceberg_polaris_lakehouse_spark.sources.iceberg_writer import (
    append_iceberg_table,
    delete_iceberg_table_where,
    upsert_iceberg_table,
)
from minio_iceberg_polaris_lakehouse_spark.streaming.foreign_source import (
    ForeignTableStream,
)
from minio_iceberg_polaris_lakehouse_spark.streaming.replicate import (
    apply_cdc_batch,
    replicate_foreign,
)
from minio_iceberg_polaris_lakehouse_spark.warehouse import Warehouse, WarehouseError


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_delete_keys_primitive(wh, spark):
    t = wh.create_table("db", "dk", "id int, v string")
    t.set_identifier_fields("id")
    t.insert_values([(1, "a"), (2, "b"), (3, "c")])
    # delete keys 2 and 9 (9 absent: no-op per key, the CDC contract)
    t.delete_keys(spark.createDataFrame([(2,), (9,)], "id int"))
    assert _rows(t.read()) == [(1, "a"), (3, "c")]
    assert t._resolve()["operation"] == "delete"
    # re-insert resurrects (v2 sequence rule)
    t.append(spark.createDataFrame([(2, "back")], t.schema()))
    assert _rows(t.read()) == [(1, "a"), (2, "back"), (3, "c")]
    # empty key set: no snapshot committed
    before = t.current_snapshot_id()
    assert t.delete_keys(spark.createDataFrame([], "id int")) == before
    assert t.current_snapshot_id() == before
    # no identifier fields -> loud
    t2 = wh.create_table("db", "dk2", "id int")
    with pytest.raises(WarehouseError, match="identifier fields"):
        t2.delete_keys(spark.createDataFrame([(1,)], "id int"))


def test_replicate_foreign_table_end_to_end(wh, spark, tmp_path):
    """The mirror converges through appends, upserts (raw eq deletes in
    the SOURCE), and row deletes — across several polls and a stream
    restart from its checkpoint."""
    src_wh = Warehouse(spark, str(tmp_path / "src"))
    src = src_wh.create_table("db", "events_src", "id int, v string")
    src.set_identifier_fields("id")
    src.insert_values([(1, "a"), (2, "b")])

    target = wh.create_table("db", "mirror", "id int, v string")
    target.set_identifier_fields("id")
    ckpt = str(tmp_path / "ckpt.json")

    stream = ForeignTableStream(spark, src.path, mode="cdc", checkpoint_path=ckpt)
    assert replicate_foreign(stream, target) == 1  # initial replay
    assert _rows(target.read()) == [(1, "a"), (2, "b")]

    # source churn: a foreign upsert (eq delete + data in ONE snapshot),
    # an append, and a positional delete
    upsert_iceberg_table(
        spark, src.path, spark.createDataFrame([(2, "B2"), (3, "c")], "id int, v string")
    )
    append_iceberg_table(spark, src.path, spark.createDataFrame([(4, "d")], "id int, v string"))
    assert replicate_foreign(stream, target) == 1  # one poll window, 2 commits
    assert _rows(target.read()) == _rows(src_wh.spark.createDataFrame(
        [(1, "a"), (2, "B2"), (3, "c"), (4, "d")], "id int, v string"))

    delete_iceberg_table_where(spark, src.path, "id = 1")
    assert replicate_foreign(stream, target) == 1
    assert _rows(target.read()) == [(2, "B2"), (3, "c"), (4, "d")]

    # restart from checkpoint: nothing new -> no batches, state intact
    stream2 = ForeignTableStream(spark, src.path, mode="cdc", checkpoint_path=ckpt)
    assert replicate_foreign(stream2, target) == 0
    # more churn applies exactly once through the restarted stream
    upsert_iceberg_table(
        spark, src.path, spark.createDataFrame([(4, "D4")], "id int, v string")
    )
    assert replicate_foreign(stream2, target) == 1
    assert _rows(target.read()) == [(2, "B2"), (3, "c"), (4, "D4")]


def test_apply_cdc_batch_orders_commits(wh, spark):
    """A multi-commit window where a key dies in commit N and returns in
    commit N+1 must converge to the re-inserted row — ordinal order, not
    change-type order."""
    t = wh.create_table("db", "ord", "id int, v string")
    t.set_identifier_fields("id")
    t.insert_values([(5, "old")])
    batch = spark.createDataFrame(
        [
            (5, "old", "delete", 10, 0),   # commit 0: key 5 deleted
            (5, "new", "insert", 11, 1),   # commit 1: key 5 re-inserted
            (6, "six", "insert", 11, 1),
        ],
        "id int, v string, _change_type string, _commit_snapshot_id long, _change_ordinal int",
    )
    assert apply_cdc_batch(t, batch) == 2
    assert _rows(t.read()) == [(5, "new"), (6, "six")]
