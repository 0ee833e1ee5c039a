"""ANALYZE TABLE / CALL system.compute_table_stats: persisted table and
column statistics (null counts, approximate NDV, min/max), staleness
tracking, and the DESCRIBE EXTENDED surfacing."""

from __future__ import annotations

import pytest

from minio_iceberg_polaris_lakehouse_spark.sql_frontend import LakehouseSQL
from minio_iceberg_polaris_lakehouse_spark.warehouse import WarehouseError


@pytest.fixture()
def lake(spark, tmp_path):
    lake = LakehouseSQL(spark, str(tmp_path / "warehouse"))
    lake.sql("CREATE NAMESPACE IF NOT EXISTS db")
    lake.sql("CREATE TABLE db.t (id INT, v STRING, amt DECIMAL(10,2)) USING iceberg")
    lake.sql("INSERT INTO db.t VALUES (1, 'a', 10.50), (2, 'b', 20.00), (3, NULL, 10.50), (4, 'a', NULL)")
    return lake


def test_analyze_for_all_columns(lake):
    rows = {
        r.column: r
        for r in lake.sql("ANALYZE TABLE db.t COMPUTE STATISTICS FOR ALL COLUMNS").collect()
    }
    assert set(rows) == {"id", "v", "amt"}
    assert rows["id"].null_count == 0
    assert rows["id"].ndv == 4
    assert (rows["id"].min, rows["id"].max) == ("1", "4")
    assert rows["v"].null_count == 1
    assert rows["v"].ndv == 2  # 'a', 'b'
    assert rows["amt"].null_count == 1
    assert rows["amt"].ndv == 2  # 10.50, 20.00
    assert not rows["id"].stale
    stats = lake.wh.table("db", "t").statistics()
    assert stats["row_count"] == 4
    assert stats["size_in_bytes"] > 0


def test_analyze_subset_and_unknown_column(lake):
    rows = lake.sql("ANALYZE TABLE db.t COMPUTE STATISTICS FOR COLUMNS id, v").collect()
    assert {r.column for r in rows} == {"id", "v"}
    with pytest.raises(WarehouseError, match="unknown"):
        lake.sql("ANALYZE TABLE db.t COMPUTE STATISTICS FOR COLUMNS nope")


def test_analyze_table_level_only(lake):
    out = lake.sql("ANALYZE TABLE db.t COMPUTE STATISTICS").collect()
    assert out == []  # no column stats requested
    stats = lake.wh.table("db", "t").statistics()
    assert stats["row_count"] == 4
    assert stats["columns"] == {}


def test_stats_go_stale_after_commit(lake):
    lake.sql("ANALYZE TABLE db.t COMPUTE STATISTICS FOR ALL COLUMNS")
    tab = lake.wh.table("db", "t")
    assert tab.statistics()["stale"] is False
    lake.sql("INSERT INTO db.t VALUES (5, 'c', 1.00)")
    assert tab.statistics()["stale"] is True
    assert all(r.stale for r in tab.column_stats().collect())


def test_describe_extended_shows_statistics(lake):
    lake.sql("ANALYZE TABLE db.t COMPUTE STATISTICS")
    rows = lake.sql("DESCRIBE EXTENDED db.t").collect()
    stat_rows = [r for r in rows if r.col_name == "Statistics"]
    assert len(stat_rows) == 1
    assert "4 rows" in stat_rows[0].data_type
    assert "stale" not in stat_rows[0].data_type
    lake.sql("INSERT INTO db.t VALUES (5, 'c', 1.00)")
    rows = lake.sql("DESCRIBE EXTENDED db.t").collect()
    stat_rows = [r for r in rows if r.col_name == "Statistics"]
    assert "(stale)" in stat_rows[0].data_type


def test_compute_table_stats_procedure(lake):
    out = lake.sql(
        "CALL polaris.system.compute_table_stats(table => 'db.t', columns => ARRAY('id'))"
    ).collect()[0]
    assert out.row_count == 4
    stats = lake.wh.table("db", "t").statistics()
    assert set(stats["columns"]) == {"id"}
    # no-columns form analyzes everything
    lake.sql("CALL polaris.system.compute_table_stats(table => 'db.t')")
    assert set(lake.wh.table("db", "t").statistics()["columns"]) == {"id", "v", "amt"}
