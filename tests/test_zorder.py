"""Z-order rewrite (rewrite_data_files strategy => 'sort', sort_order =>
'zorder(a, b)'): interleaved-bit clustering makes parquet footer bounds
tight on EVERY zorder column, so scan-time file skipping works for
predicates on any of them — the multi-dimensional upgrade over
one-dimensional WRITE ORDERED BY."""

from __future__ import annotations

import datetime
import random

import pytest

from minio_iceberg_polaris_lakehouse_spark.warehouse import Warehouse, WarehouseError


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "warehouse"))


def _files_read(df) -> int:
    return len(df.inputFiles())


def _grid_table(wh, spark, name, n=32):
    t = wh.create_table("db", name, "x int, y int, payload string")
    pts = [(x, y, f"p{x}_{y}") for x in range(n) for y in range(n)]
    random.Random(7).shuffle(pts)
    t.append(spark.createDataFrame(pts, t.schema()))
    return t


def test_zorder_skips_on_both_dimensions(wh, spark):
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        t = _grid_table(wh, spark, "z1")
        t.compact(target_partitions=8, zorder=["x", "y"])
        total = _files_read(t.read())
        assert total >= 8
        sx = t.scan(between={"x": (0, 3)})
        sy = t.scan(between={"y": (0, 3)})
        # both dimensions prune — the point of z-order over linear sort
        assert _files_read(sx) < total
        assert _files_read(sy) < total
        # and the pruned scans stay correct
        assert sx.count() == 4 * 32
        assert sy.count() == 4 * 32
        assert sorted(tuple(r) for r in t.scan(eq={"x": 5}).select("x", "y").collect()) == [
            (5, y) for y in range(32)
        ]
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_linear_sort_only_prunes_leading_column(wh, spark):
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        t = _grid_table(wh, spark, "z2")
        t.compact(target_partitions=8, sort_by=["x"])
        total = _files_read(t.read())
        # leading column prunes …
        assert _files_read(t.scan(between={"x": (0, 3)})) < total
        # … the trailing column cannot (every file spans all y values)
        assert _files_read(t.scan(between={"y": (0, 3)})) == total
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_zorder_temporal_column(wh, spark):
    t = wh.create_table("db", "z3", "d date, v int")
    rows = [
        (datetime.date(2024, 1, 1) + datetime.timedelta(days=i % 100), i)
        for i in range(400)
    ]
    random.Random(3).shuffle(rows)
    t.append(spark.createDataFrame(rows, t.schema()))
    t.compact(target_partitions=4, zorder=["d", "v"])
    out = t.scan(between={"d": (datetime.date(2024, 1, 1), datetime.date(2024, 1, 5))})
    assert out.count() == 20
    assert _files_read(out) < _files_read(t.read())


def test_zorder_rejects_string_columns(wh, spark):
    t = wh.create_table("db", "z4", "x int, s string")
    t.insert_values([(1, "a")])
    with pytest.raises(WarehouseError):
        t.compact(zorder=["s"])


def test_zorder_preserves_rows_and_history(wh, spark):
    t = _grid_table(wh, spark, "z5", n=8)
    before = sorted(tuple(r) for r in t.read().collect())
    sid = t.compact(target_partitions=4, zorder=["x", "y"])
    snap = t._resolve(sid)
    assert snap["operation"] == "replace"
    assert snap["summary"]["zorder"] == "x,y"
    assert sorted(tuple(r) for r in t.read().collect()) == before
    # replace snapshots stay silent in the changelog
    assert t.changes(from_version=1).count() == 0


def test_rewrite_data_files_zorder_sql(spark, tmp_path):
    from minio_iceberg_polaris_lakehouse_spark.sql_frontend import LakehouseSQL

    lake = LakehouseSQL(spark, str(tmp_path / "wh"))
    lake.sql("CREATE TABLE polaris.db.zt (x INT, y INT) USING ICEBERG")
    lake.sql(
        "INSERT INTO polaris.db.zt VALUES "
        + ", ".join(f"({x}, {y})" for x in range(8) for y in range(8))
    )
    out = lake.sql(
        "CALL polaris.system.rewrite_data_files(table => 'db.zt', "
        "strategy => 'sort', sort_order => 'zorder(x, y)', target_partitions => 4)"
    ).collect()[0]
    assert out.added_data_files_count >= 1
    tab = lake.wh.table("db", "zt")
    assert tab._resolve()["summary"].get("zorder") == "x,y"
    assert lake.sql("SELECT COUNT(*) AS n FROM polaris.db.zt").collect()[0].n == 64
