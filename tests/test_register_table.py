"""`CALL <catalog>.system.register_table` — attach an existing Iceberg
table to the catalog by its metadata files (reference README.md:28) and
use it by name in SQL: SELECT, JOIN against a native table, DESCRIBE,
SHOW TABLES, time travel, DROP-to-detach."""

from __future__ import annotations

import pytest

from minio_iceberg_polaris_lakehouse_spark.sql_frontend import LakehouseSQL
from minio_iceberg_polaris_lakehouse_spark.warehouse import Warehouse, WarehouseError
from tests.test_iceberg_reader import _build_foreign_table


@pytest.fixture()
def lake(spark, tmp_path):
    return LakehouseSQL(spark, str(tmp_path / "wh"))


def _register(lake, root, name="ext.ft"):
    return lake.sql(
        f"CALL polaris.system.register_table(table => '{name}', "
        f"metadata_file => '{root}')"
    ).collect()[0]


def test_register_select_join_describe_roundtrip(lake, spark, tmp_path):
    root = _build_foreign_table(tmp_path)
    row = _register(lake, root)
    # Iceberg procedure shape, computed from the manifest list
    assert row.current_snapshot_id == 3
    assert row.total_data_files == 2 and row.total_records == 5

    # SELECT by name (deletes + sequence rule applied: see fixture doc)
    got = sorted(
        (r.id, r.name) for r in lake.sql("SELECT id, name FROM ext.ft").collect()
    )
    assert got == [(3, "reborn"), (4, "d")]

    # JOIN against a NATIVE table by name, plus DataFrame entry point
    lake.sql("CREATE TABLE polaris.ext.dim (id INT, label STRING) USING ICEBERG")
    lake.sql("INSERT INTO polaris.ext.dim VALUES (3, 'three'), (4, 'four')")
    j = lake.sql(
        "SELECT f.id, f.name, d.label FROM ext.ft f "
        "JOIN ext.dim d ON f.id = d.id ORDER BY f.id"
    ).collect()
    assert [(r.id, r.name, r.label) for r in j] == [
        (3, "reborn", "three"),
        (4, "d", "four"),
    ]
    assert sorted(r.id for r in lake.table("ext.ft").collect()) == [3, 4]

    # DESCRIBE [EXTENDED]
    desc = lake.sql("DESCRIBE ext.ft").collect()
    assert [(r.col_name, r.data_type) for r in desc[:2]] == [
        ("id", "int"),
        ("name", "string"),
    ]
    ext = lake.sql("DESCRIBE EXTENDED polaris.ext.ft").collect()
    kinds = {r.col_name: r.data_type for r in ext}
    assert kinds.get("Registration") == "foreign (read-only)"
    assert kinds.get("Provider") == "iceberg"

    # SHOW TABLES lists foreign and native side by side
    names = {r.tableName for r in lake.sql("SHOW TABLES IN ext").collect()}
    assert names == {"ft", "dim"}

    # DROP TABLE detaches the registration but never deletes the files
    lake.sql("DROP TABLE ext.ft")
    assert "ext.ft" not in lake.wh.foreign_tables()
    import os

    assert os.path.isdir(f"{root}/data")
    with pytest.raises(Exception, match="(?i)not.*found|cannot be found"):
        lake.sql("SELECT * FROM ext.ft WHERE id = 1").collect()


def test_register_time_travel_and_own_export(lake, spark, tmp_path):
    """Re-registering a table THIS engine exported (the README's
    disaster-recovery recipe) — including VERSION AS OF through the
    open metadata."""
    other = Warehouse(spark, str(tmp_path / "other_wh"))
    t = other.create_table("db", "src", "id int, v string")
    t.insert_values([(1, "a")])
    t.insert_values([(2, "b")])
    _register(lake, t.path, name="mirror.src")
    assert sorted(
        (r.id, r.v) for r in lake.sql("SELECT id, v FROM mirror.src").collect()
    ) == [(1, "a"), (2, "b")]
    tt = lake.sql("SELECT id, v FROM mirror.src VERSION AS OF 1").collect()
    assert [(r.id, r.v) for r in tt] == [(1, "a")]
    # foreign commits after registration stay visible (location is
    # re-resolved through version-hint at every read)
    t.insert_values([(3, "c")])
    assert sorted(r.id for r in lake.sql("SELECT id FROM mirror.src").collect()) == [1, 2, 3]


def test_register_conflicts_and_guards(lake, spark, tmp_path):
    root = _build_foreign_table(tmp_path)
    lake.sql("CREATE TABLE polaris.ext.nat (id INT) USING ICEBERG")
    with pytest.raises(WarehouseError, match="native table"):
        _register(lake, root, name="ext.nat")
    _register(lake, root, name="ext.ft")
    with pytest.raises(WarehouseError, match="already registered"):
        _register(lake, root, name="ext.ft")
    # a native table can't be created over the registration
    with pytest.raises(WarehouseError, match="foreign table"):
        lake.sql("CREATE TABLE polaris.ext.ft (id INT) USING ICEBERG")
    # bad location fails at CALL time, not first SELECT
    with pytest.raises(Exception):
        _register(lake, str(tmp_path / "nope"), name="ext.bad")
    assert "ext.bad" not in lake.wh.foreign_tables()
    # a registration PINNED to one metadata file refuses appends (they
    # would land in a version the pin never serves)
    from minio_iceberg_polaris_lakehouse_spark.sources.iceberg_reader import (
        resolve_metadata_path,
    )

    _register(lake, resolve_metadata_path(root), name="ext.pinned")
    with pytest.raises(WarehouseError, match="pinned"):
        lake.sql("INSERT INTO polaris.ext.pinned VALUES (9, 'x')")


def test_foreign_metadata_tables_on_fixture(lake, spark, tmp_path):
    """.snapshots/.history/.files on a registered foreign table, derived
    purely from the open metadata: the hand-authored Flink-style fixture
    (one snapshot, three manifests, raw delete files)."""
    root = _build_foreign_table(tmp_path)
    _register(lake, root)

    snaps = lake.sql("SELECT * FROM ext.ft.snapshots").collect()
    assert len(snaps) == 1
    s = snaps[0]
    assert s.snapshot_id == 3 and s.parent_id is None
    assert s.manifest_list.endswith("snap-3-manifest-list.avro")

    hist = lake.sql("SELECT * FROM ext.ft.history").collect()
    assert [(h.snapshot_id, h.is_current_ancestor) for h in hist] == [(3, True)]

    files = lake.sql(
        "SELECT content, file_path, record_count FROM ext.ft.files ORDER BY file_path"
    ).collect()
    by_name = {f.file_path.rsplit("/", 1)[-1]: f for f in files}
    assert set(by_name) == {"a.parquet", "b.parquet", "eqdel.parquet", "posdel.parquet"}
    assert (by_name["a.parquet"].content, by_name["a.parquet"].record_count) == (0, 4)
    assert (by_name["eqdel.parquet"].content, by_name["eqdel.parquet"].record_count) == (2, 2)
    assert (by_name["posdel.parquet"].content, by_name["posdel.parquet"].record_count) == (1, 1)
    assert by_name["b.parquet"].content == 0

    # SQL aggregates compose over the metadata views
    n = lake.sql(
        "SELECT CAST(SUM(record_count) AS BIGINT) AS rc FROM ext.ft.files WHERE content = 0"
    ).collect()[0].rc
    assert n == 5

    # a fixture without a refs map still lists an empty .refs view
    assert lake.sql("SELECT * FROM ext.ft.refs").collect() == []

    # metadata tables the open format can't provide fail loudly:
    # .partitions is served from the spec's partition-statistics file,
    # so a table that never published one refuses rather than guessing
    import pytest as _pytest

    with _pytest.raises(Exception, match="no partition-statistics"):
        lake.sql("SELECT * FROM ext.ft.partitions").collect()
    with _pytest.raises(WarehouseError, match="not available"):
        lake.sql("SELECT * FROM ext.ft.entries").collect()


def test_foreign_metadata_tables_on_own_export(lake, spark, tmp_path):
    """Against a multi-snapshot table THIS engine exported: column parity
    with the native metadata views, parent chaining, ancestry flags."""
    other = Warehouse(spark, str(tmp_path / "other_wh"))
    t = other.create_table("db", "src", "id int, v string")
    t.insert_values([(1, "a")])
    t.insert_values([(2, "b")])
    t.insert_values([(3, "c")])
    _register(lake, t.path, name="mirror.src")

    native_cols = t.snapshots().columns
    snaps = lake.sql("SELECT * FROM mirror.src.snapshots ORDER BY snapshot_id")
    assert snaps.columns == native_cols
    rows = snaps.collect()
    assert [r.snapshot_id for r in rows] == [1, 2, 3]
    assert [r.parent_id for r in rows] == [None, 1, 2]
    assert all(r.operation == "append" for r in rows)

    hist = lake.sql("SELECT * FROM mirror.src.history ORDER BY snapshot_id")
    assert hist.columns == t.history().columns
    assert [(h.snapshot_id, h.parent_id, h.is_current_ancestor) for h in hist.collect()] == [
        (1, None, True),
        (2, 1, True),
        (3, 2, True),
    ]

    files = lake.sql("SELECT * FROM mirror.src.files").collect()
    assert sum(f.record_count for f in files if f.content == 0) == 3


def test_foreign_ref_time_travel_and_refs_table(lake, spark, tmp_path):
    """Branch/tag refs ride the metadata document's `refs` map: a tag
    created before registration is visible in .refs and usable in
    VERSION AS OF '<name>' on the registered foreign name."""
    other = Warehouse(spark, str(tmp_path / "other_wh"))
    t = other.create_table("db", "src", "id int, v string")
    t.insert_values([(1, "a")])
    t.create_ref("audit-v1", "tag", snapshot_id=1)
    t.insert_values([(2, "b")])
    _register(lake, t.path, name="mirror.src")

    refs = {
        r.name: (r.type, r.snapshot_id)
        for r in lake.sql("SELECT * FROM mirror.src.refs").collect()
    }
    assert refs["audit-v1"] == ("TAG", 1)
    assert refs["main"][0] == "BRANCH"

    tagged = lake.sql("SELECT id, v FROM mirror.src VERSION AS OF 'audit-v1'").collect()
    assert [(r.id, r.v) for r in tagged] == [(1, "a")]
    assert sorted(r.id for r in lake.sql("SELECT id FROM mirror.src").collect()) == [1, 2]

    with pytest.raises(Exception, match="no branch or tag"):
        lake.sql("SELECT * FROM mirror.src VERSION AS OF 'nope'").collect()


def test_foreign_pruned_scan_setup_idempotent(spark):
    """Retry safety for the ref_foreign_pruned_scan golden: if an
    earlier invocation registered ext.users_fp but died before caching
    its state, a retried invocation must reuse the registration (no
    name-conflict) and return the identical result."""
    from minio_iceberg_polaris_lakehouse_spark.operators import reference_golden as RG

    first = RG.ref_foreign_pruned_scan(spark, "/root/testdata/sf0.001").collect()
    # simulate the torn state: registration exists, cache entry lost
    RG._FPRUNE_STATE.clear()
    second = RG.ref_foreign_pruned_scan(spark, "/root/testdata/sf0.001").collect()
    assert [tuple(r) for r in first] == [tuple(r) for r in second]
    assert first[0].pruned == 1
