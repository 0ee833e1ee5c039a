"""Lifecycle tests for the warehouse table format — encodes the
reference's success criteria (SETUP_GUIDE_WIN.md:453-464: namespaces,
tables, INSERT, SELECT, persistence, time travel, schema evolution) plus
the golden Hello/World and users/orders fixtures."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from minio_iceberg_polaris_lakehouse_spark.warehouse import Warehouse, WarehouseError


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "warehouse"))


def test_namespace_lifecycle(wh):
    wh.create_namespace("my_warehouse")
    assert "my_warehouse" in wh.list_namespaces()
    wh.create_table("my_warehouse", "t1", "id int, name string")
    assert wh.list_tables("my_warehouse") == ["t1"]
    with pytest.raises(WarehouseError):
        wh.drop_namespace("my_warehouse")
    wh.drop_namespace("my_warehouse", cascade=True)
    assert "my_warehouse" not in wh.list_namespaces()


def test_hello_world_roundtrip(wh):
    # reference golden: getting_started.ipynb:87-160
    t = wh.create_table("test_db", "test_table", "id int, name string")
    t.insert_values([(1, "Hello"), (2, "World")])
    rows = sorted(tuple(r) for r in t.read().collect())
    assert rows == [(1, "Hello"), (2, "World")]
    assert t.read().count() == 2
    props = t.properties()
    assert props["format-version"] == "2"
    assert props["write.parquet.compression-codec"] == "zstd"
    assert props["current-snapshot-id"] == "1"


def test_duplicate_append_semantics(wh):
    # INSERT is append-only; re-running duplicates (SETUP_GUIDE_WIN.md:362-371)
    t = wh.create_table("db", "dup", "id int, name string")
    t.insert_values([(1, "Hello"), (2, "World")])
    t.insert_values([(1, "Hello"), (2, "World")])
    assert t.read().count() == 4
    assert t.read().select("id").distinct().count() == 2


def test_snapshots_history_time_travel(wh, spark):
    t = wh.create_table("db", "tt", "id int, v string")
    v1 = t.insert_values([(1, "a")])
    time.sleep(0.01)
    mid_ms = int(time.time() * 1000)
    time.sleep(0.01)
    v2 = t.insert_values([(2, "b")])
    assert (v1, v2) == (1, 2)

    hist = t.history().collect()
    assert [r.snapshot_id for r in hist] == [1, 2]
    assert hist[0].parent_id is None and hist[1].parent_id == 1

    snaps = {r.snapshot_id: r for r in t.snapshots().collect()}
    assert snaps[1].operation == "append" and snaps[2].operation == "append"
    assert snaps[2].summary["added-records"] == "1"

    # VERSION AS OF
    assert t.read(version=1).count() == 1
    assert t.read(version=2).count() == 2
    # TIMESTAMP AS OF
    assert t.read(as_of_ms=mid_ms).count() == 1
    # snapshot isolation: current read unaffected by old version handles
    assert t.read().count() == 2


def test_schema_evolution_null_backfill(wh):
    # ADD COLUMN without rewriting files (README.md:132-133)
    t = wh.create_table("db", "evo", "id int, name string")
    t.insert_values([(1, "x")])
    t.add_column("email", "string")
    t.insert_values([(2, "y", "y@example.com")])
    rows = {r.id: r.email for r in t.read().collect()}
    assert rows == {1: None, 2: "y@example.com"}
    # old snapshot still readable with backfilled schema
    assert t.read(version=1).columns == ["id", "name", "email"]
    t.rename_column("email", "contact")
    assert [c for c, _ in t.describe()] == ["id", "name", "contact"]


def test_overwrite_delete_merge(wh, spark):
    t = wh.create_table("db", "dml", "id int, amount double")
    t.insert_values([(1, 10.0), (2, 20.0), (3, 30.0)])
    t.delete_where("id = 2")
    assert sorted(r.id for r in t.read().collect()) == [1, 3]

    src = spark.createDataFrame([(1, 11.0), (9, 90.0)], "id int, amount double")
    t.merge_into(src, on="id")
    got = {r.id: r.amount for r in t.read().collect()}
    assert got == {1: 11.0, 3: 30.0, 9: 90.0}

    t.overwrite(spark.createDataFrame([(42, 1.0)], "id int, amount double"))
    assert [tuple(r) for r in t.read().collect()] == [(42, 1.0)]
    ops = [r.operation for r in t.snapshots().collect()]
    assert ops == ["append", "delete", "merge", "overwrite"]
    # time travel across DML: pre-delete snapshot still has id=2
    assert sorted(r.id for r in t.read(version=1).collect()) == [1, 2, 3]


def test_partitioned_table_hidden_pruning(wh, spark):
    # PARTITIONED BY day(ts) — filter on the raw column (README.md:126-127)
    t = wh.create_table(
        "db", "part", "id int, created_at timestamp", partition_by="created_at", transform="day"
    )
    df = spark.createDataFrame(
        [(1, "2024-11-25 10:00:00"), (2, "2024-11-26 11:00:00")], "id int, created_at string"
    ).select("id", F.col("created_at").cast("timestamp"))
    t.append(df)
    got = t.scan(eq={"created_at": "2024-11-25 10:00:00"}).collect()
    assert [r.id for r in got] == [1]
    # both days present without filter
    assert t.read().count() == 2


def test_compaction_and_expire(wh, spark):
    t = wh.create_table("db", "cmp", "id bigint")
    for i in range(4):
        t.append(spark.range(i * 10, (i + 1) * 10).repartition(4))
    files_before = t.data_file_count()
    assert files_before >= 8
    t.compact(target_partitions=1)
    assert t.read().count() == 40
    assert t.data_file_count() < files_before
    # expire old snapshots, GC unreferenced data dirs, current read intact
    removed = t.expire_snapshots(keep_last=1)
    assert removed >= 1
    assert t.read().count() == 40
    assert len(t.history().collect()) == 1


def test_pandas_export(wh):
    t = wh.create_table("db", "pd", "id int, name string")
    t.insert_values([(1, "a"), (2, "b")])
    pdf = t.to_pandas()
    assert len(pdf) == 2 and list(pdf.columns) == ["id", "name"]


def test_users_orders_fixture_join(wh, spark):
    # reference fixture: iceberg_queries.ipynb:93-100,254-270 + join :291-299
    users = wh.create_table(
        "my_warehouse", "users", "id int, name string, email string, created_date date",
        partition_by="created_date",
    )
    users.insert_values(
        [
            (1, "Alice", "alice@example.com", __import__("datetime").date(2025, 1, 1)),
            (2, "Bob", "bob@example.com", __import__("datetime").date(2025, 1, 2)),
            (3, "Charlie", "charlie@example.com", __import__("datetime").date(2025, 1, 3)),
            (4, "Diana", "diana@example.com", __import__("datetime").date(2025, 1, 4)),
        ]
    )
    orders = wh.create_table(
        "my_warehouse", "orders", "order_id int, user_id int, amount double, order_date date",
        partition_by="order_date",
    )
    orders.insert_values(
        [
            (101, 1, 150.50, __import__("datetime").date(2025, 1, 10)),
            (102, 2, 200.00, __import__("datetime").date(2025, 1, 11)),
            (103, 1, 75.25, __import__("datetime").date(2025, 1, 12)),
            (104, 3, 300.00, __import__("datetime").date(2025, 1, 13)),
        ]
    )
    joined = (
        users.read()
        .alias("u")
        .join(orders.read().alias("o"), F.col("u.id") == F.col("o.user_id"))
        .orderBy("o.order_id")
        .select("u.name", "o.order_id", "o.amount")
        .collect()
    )
    assert [r.name for r in joined] == ["Alice", "Bob", "Alice", "Charlie"]
    assert joined[0].amount == 150.50


def test_drop_column_metadata_only(wh, spark):
    t = wh.create_table("db", "dropc", "id int, name string, extra string")
    t.insert_values([(1, "a", "x"), (2, "b", "y")])
    files_before = t.data_file_count()
    t.drop_column("extra")
    assert t.describe() == [("id", "int"), ("name", "string")]
    assert t.data_file_count() == files_before  # nothing rewritten
    rows = sorted(tuple(r) for r in t.read().collect())
    assert rows == [(1, "a"), (2, "b")]
    # new writes don't need the dropped column
    t.insert_values([(3, "c")])
    assert t.read().count() == 3
    with pytest.raises(WarehouseError):
        t.drop_column("nope")


def test_partition_spec_evolution_without_rewrite(wh, spark):
    # unpartitioned history, then evolve to day(ts): old dirs stay put,
    # new writes are laid out by day, scans stay correct across both
    t = wh.create_table("db", "evo", "id int, ts timestamp")
    old = spark.createDataFrame(
        [(1, "2024-11-25 10:00:00"), (2, "2024-11-26 11:00:00")], "id int, ts string"
    ).select("id", F.col("ts").cast("timestamp"))
    t.append(old)
    files_before = t.data_file_count()
    t.evolve_partition_spec("ts", "day")
    assert t.data_file_count() == files_before  # metadata-only
    new = spark.createDataFrame(
        [(3, "2024-11-25 12:00:00"), (4, "2024-11-27 09:00:00")], "id int, ts string"
    ).select("id", F.col("ts").cast("timestamp"))
    t.append(new)
    # rows from BOTH eras must survive a pruned scan on the raw column
    got = sorted(
        r.id for r in t.scan(between={"ts": ("2024-11-25 00:00:00", "2024-11-25 23:59:59")}).collect()
    )
    assert got == [1, 3]
    assert t.read().count() == 4
    # evolving to an unknown column or transform is rejected
    with pytest.raises(WarehouseError):
        t.evolve_partition_spec("missing", "day")
    # partition source cannot be dropped
    with pytest.raises(WarehouseError):
        t.drop_column("ts")
