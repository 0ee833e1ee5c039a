"""`add_files` — zero-copy import of an existing parquet directory as an
append snapshot (Iceberg's migrate-in-place procedure)."""

from __future__ import annotations

import os

import pytest

from minio_iceberg_polaris_lakehouse_spark.sql_frontend import LakehouseSQL
from minio_iceberg_polaris_lakehouse_spark.warehouse import Warehouse, WarehouseError


@pytest.fixture()
def lake(spark, tmp_path):
    return LakehouseSQL(spark, str(tmp_path / "wh"))


def _write_source(spark, path, rows):
    spark.createDataFrame(rows, "id int, v string").coalesce(2).write.parquet(str(path))
    return str(path)


def test_add_files_zero_copy_import(lake, spark, tmp_path):
    src = _write_source(spark, tmp_path / "legacy", [(1, "a"), (2, "b"), (3, "c")])
    lake.sql("CREATE TABLE polaris.db.t (id INT, v STRING) USING ICEBERG")
    lake.sql("INSERT INTO db.t VALUES (0, 'engine')")

    row = lake.sql(
        f"CALL polaris.system.add_files(table => 'db.t', source_table => '{src}')"
    ).collect()[0]
    assert row.added_files_count >= 1

    got = sorted((r.id, r.v) for r in lake.sql("SELECT id, v FROM db.t").collect())
    assert got == [(0, "engine"), (1, "a"), (2, "b"), (3, "c")]

    # zero copy: the imported dir holds only symlinks to the source files
    t = lake.wh.table("db", "t")
    import_dirs = [d for d in os.listdir(t.path) if d.startswith("data-import-")]
    assert len(import_dirs) == 1
    links = [
        f for f in os.listdir(os.path.join(t.path, import_dirs[0])) if f.endswith(".parquet")
    ]
    assert links and all(
        os.path.islink(os.path.join(t.path, import_dirs[0], f)) for f in links
    )

    # time travel: the pre-import snapshot still reads without the import
    pre = lake.sql("SELECT id FROM db.t VERSION AS OF 1").collect()
    assert [r.id for r in pre] == [0]

    # provenance in the snapshot summary
    snaps = t.snapshots().collect()
    assert any(s.summary.get("import-source") == src for s in snaps)


def test_add_files_file_skipping_on_imported_footers(lake, spark, tmp_path):
    """Footer bounds harvested from imported files drive scan-time file
    skipping exactly as for engine-written dirs."""
    lake.sql("CREATE TABLE polaris.db.s (id INT, v STRING) USING ICEBERG")
    a = _write_source(spark, tmp_path / "a", [(i, f"x{i}") for i in range(10)])
    b = _write_source(spark, tmp_path / "b", [(i, f"x{i}") for i in range(100, 110)])
    t = lake.wh.table("db", "s")
    t.add_files(a)
    t.add_files(b)
    full = t.scan()
    pruned = t.scan(between={"id": (100, 120)})
    assert pruned.count() == 10
    assert pruned.inputFiles() and len(pruned.inputFiles()) < len(full.inputFiles())


def test_add_files_schema_and_partition_guards(lake, spark, tmp_path):
    src_bad = str(tmp_path / "bad")
    spark.createDataFrame([(1, 2.5)], "id int, v double").write.parquet(src_bad)
    lake.sql("CREATE TABLE polaris.db.g (id INT, v STRING) USING ICEBERG")
    with pytest.raises(WarehouseError, match="source column v"):
        lake.wh.table("db", "g").add_files(src_bad)

    src_extra = str(tmp_path / "extra")
    spark.createDataFrame([(1, "a", 9)], "id int, v string, z int").write.parquet(src_extra)
    with pytest.raises(WarehouseError, match="not in table schema"):
        lake.wh.table("db", "g").add_files(src_extra)

    lake.sql(
        "CREATE TABLE polaris.db.p (id INT, d DATE) USING ICEBERG PARTITIONED BY (d)"
    )
    with pytest.raises(WarehouseError, match="unpartitioned"):
        lake.wh.table("db", "p").add_files(str(tmp_path / "a"))


def test_add_files_subset_schema_null_backfills(lake, spark, tmp_path):
    """Imported files missing a newer column read with NULL backfill,
    like any dir written before a schema evolution."""
    src = _write_source(spark, tmp_path / "old", [(7, "legacy")])
    lake.sql("CREATE TABLE polaris.db.e (id INT, v STRING) USING ICEBERG")
    lake.sql("ALTER TABLE db.e ADD COLUMN note STRING")
    lake.wh.table("db", "e").add_files(src)
    rows = lake.sql("SELECT id, v, note FROM db.e").collect()
    assert [(r.id, r.v, r.note) for r in rows] == [(7, "legacy", None)]


def test_add_files_source_survives_table_drop(lake, spark, tmp_path):
    src = _write_source(spark, tmp_path / "keep", [(1, "a")])
    lake.sql("CREATE TABLE polaris.db.d (id INT, v STRING) USING ICEBERG")
    lake.wh.table("db", "d").add_files(src)
    lake.sql("DROP TABLE db.d")
    # source files untouched by dropping the importing table
    assert sorted(
        (r.id, r.v) for r in spark.read.parquet(src).collect()
    ) == [(1, "a")]


def test_add_files_rejects_mixed_footer_schemas(lake, spark, tmp_path):
    """int file + long file would silently widen under a merged read —
    refuse, like Iceberg's procedure."""
    mixed = tmp_path / "mixed"
    mixed.mkdir()
    spark.createDataFrame([(1, "a")], "id int, v string").coalesce(1).write.parquet(
        str(mixed / "p1")
    )
    spark.createDataFrame([(2, "b")], "id bigint, v string").coalesce(1).write.parquet(
        str(mixed / "p2")
    )
    import shutil

    for sub in ["p1", "p2"]:
        for f in (mixed / sub).glob("*.parquet"):
            shutil.move(str(f), str(mixed / f"{sub}_{f.name}"))
        shutil.rmtree(mixed / sub)
    lake.sql("CREATE TABLE polaris.db.m (id BIGINT, v STRING) USING ICEBERG")
    with pytest.raises(WarehouseError, match="differing schemas"):
        lake.wh.table("db", "m").add_files(str(mixed))


def test_snapshot_procedure_migrates_in_place(lake, spark, tmp_path):
    """CALL system.snapshot: new table over an existing parquet dir,
    schema from footers, zero copy, source untouched."""
    src = _write_source(spark, tmp_path / "hive_era", [(1, "a"), (2, "b")])
    row = lake.sql(
        f"CALL polaris.system.snapshot(source_table => '{src}', table => 'db.snap')"
    ).collect()[0]
    assert row.imported_files_count >= 1
    got = sorted((r.id, r.v) for r in lake.sql("SELECT id, v FROM db.snap").collect())
    assert got == [(1, "a"), (2, "b")]
    assert [f.name for f in lake.wh.table("db", "snap").schema().fields] == ["id", "v"]
    # further engine writes land in engine-owned dirs; source untouched
    lake.sql("INSERT INTO db.snap VALUES (3, 'c')")
    assert lake.sql("SELECT COUNT(*) AS n FROM db.snap").collect()[0].n == 3
    assert sorted((r.id, r.v) for r in spark.read.parquet(src).collect()) == [(1, "a"), (2, "b")]
    with pytest.raises(WarehouseError, match="already exists"):
        lake.sql(
            f"CALL polaris.system.snapshot(source_table => '{src}', table => 'db.snap')"
        )
