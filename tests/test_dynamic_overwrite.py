"""Dynamic partition overwrite: replace only touched partitions, in one
merge-on-read snapshot; untouched partitions and time travel intact."""

from __future__ import annotations

import pytest

from minio_iceberg_polaris_lakehouse_spark.warehouse import Warehouse, WarehouseError


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_dynamic_overwrite_replaces_only_touched_partitions(wh, spark):
    t = wh.create_table("db", "dy", "id int, lang string, v string", partition_by="lang")
    t.insert_values([(1, "en", "a"), (2, "en", "b"), (3, "fr", "c"), (4, "de", "d")])
    before = t.current_snapshot_id()
    # overwrite partitions en + es (es is NEW — first write, no tombstones
    # for it); fr/de untouched
    sid = t.overwrite_partitions(
        spark.createDataFrame([(9, "en", "A9"), (8, "es", "hola")], t.schema())
    )
    assert _rows(t.read()) == [(3, "fr", "c"), (4, "de", "d"), (8, "es", "hola"), (9, "en", "A9")]
    snap = t._resolve()
    assert snap["operation"] == "overwrite"
    assert snap["summary"]["overwrite-mode"] == "dynamic"
    assert snap["summary"]["replaced-partitions"] == 2
    assert snap["summary"]["added-position-deletes"] == 2  # the two en rows
    # merge-on-read: the original data files are untouched; time travel
    assert _rows(t.read(version=before)) == [
        (1, "en", "a"),
        (2, "en", "b"),
        (3, "fr", "c"),
        (4, "de", "d"),
    ]
    assert sid == t.current_snapshot_id()


def test_dynamic_overwrite_hidden_transform_partition(wh, spark):
    """Hidden partitioning: replacement is by TRANSFORMED value — an
    overwrite touching one day replaces every row of that day, whatever
    their timestamps."""
    import datetime

    t = wh.create_table("db", "dyd", "id int, ts timestamp", partition_by="ts", transform="day")
    t.insert_values(
        [
            (1, datetime.datetime(2024, 1, 1, 3)),
            (2, datetime.datetime(2024, 1, 1, 22)),
            (3, datetime.datetime(2024, 1, 2, 9)),
        ]
    )
    t.overwrite_partitions(
        spark.createDataFrame([(9, datetime.datetime(2024, 1, 1, 12))], t.schema())
    )
    assert _rows(t.read()) == [
        (3, datetime.datetime(2024, 1, 2, 9)),
        (9, datetime.datetime(2024, 1, 1, 12)),
    ]


def test_dynamic_overwrite_property_routes_sql_insert_overwrite(wh, spark, tmp_path):
    from minio_iceberg_polaris_lakehouse_spark.sql_frontend import LakehouseSQL

    lake = LakehouseSQL(spark, str(tmp_path / "lake_dy"))
    lake.sql(
        "CREATE TABLE polaris.db.dsales (id INT, region STRING, amt INT) USING ICEBERG "
        "PARTITIONED BY (region) TBLPROPERTIES ('write.overwrite-mode'='dynamic')"
    )
    lake.sql(
        "INSERT INTO db.dsales VALUES (1, 'eu', 10), (2, 'us', 20), (3, 'ap', 30)"
    )
    lake.sql("INSERT OVERWRITE TABLE db.dsales VALUES (9, 'eu', 99)")
    got = _rows(lake.sql("SELECT id, region, amt FROM db.dsales"))
    assert got == [(2, "us", 20), (3, "ap", 30), (9, "eu", 99)]


def test_dynamic_overwrite_guards_and_compaction(wh, spark):
    t = wh.create_table("db", "dyu", "id int, v string")  # unpartitioned
    with pytest.raises(WarehouseError, match="partitioned"):
        t.overwrite_partitions(spark.createDataFrame([(1, "a")], t.schema()))
    # and the property on an unpartitioned table falls back to full
    # overwrite rather than erroring
    t.set_properties({"write.overwrite-mode": "dynamic"})
    t.insert_values([(1, "a")])
    t.overwrite(spark.createDataFrame([(2, "b")], t.schema()))
    assert _rows(t.read()) == [(2, "b")]

    # tombstones from dynamic overwrites fold away under compaction
    t2 = wh.create_table("db", "dyc", "id int, lang string", partition_by="lang")
    t2.insert_values([(1, "en"), (2, "fr")])
    t2.overwrite_partitions(spark.createDataFrame([(9, "en")], t2.schema()))
    t2.compact()
    assert _rows(t2.read()) == [(2, "fr"), (9, "en")]
    assert not t2._resolve().get("delete_dirs")


def test_foreign_dynamic_overwrite(wh, spark, tmp_path):
    """The open-metadata twin: dynamic overwrite on a foreign table —
    one snapshot of tombstones + partitioned data files; any reader
    flips atomically; prior snapshot time-travels."""
    import json as _json

    from minio_iceberg_polaris_lakehouse_spark.sources.iceberg_reader import (
        read_iceberg_table,
    )
    from minio_iceberg_polaris_lakehouse_spark.sources.iceberg_writer import (
        overwrite_iceberg_table_partitions,
    )

    src_wh = Warehouse(spark, str(tmp_path / "fsrc"))
    t = src_wh.create_table("db", "fdy", "id int, lang string, v string", partition_by="lang")
    t.insert_values([(1, "en", "a"), (2, "en", "b"), (3, "fr", "c")])

    new_path = overwrite_iceberg_table_partitions(
        spark,
        t.path,
        spark.createDataFrame([(9, "en", "A9"), (8, "es", "hola")], t.schema()),
    )
    got = read_iceberg_table(spark, t.path)
    assert _rows(got.select("id", "lang", "v")) == [
        (3, "fr", "c"),
        (8, "es", "hola"),
        (9, "en", "A9"),
    ]
    md = _json.loads(open(new_path).read())
    snap = next(s for s in md["snapshots"] if s["snapshot-id"] == md["current-snapshot-id"])
    assert snap["summary"]["overwrite-mode"] == "dynamic"
    assert snap["summary"]["added-position-deletes"] == "2"
    prev = md["snapshots"][0]["snapshot-id"]
    assert _rows(read_iceberg_table(spark, t.path, snapshot_id=prev).select("id")) == [
        (1,),
        (2,),
        (3,),
    ]
    # derived-transform specs refuse
    t2 = src_wh.create_table("db", "fdy2", "id int, ts timestamp", partition_by="ts", transform="day")
    t2.insert_values([(1, __import__("datetime").datetime(2024, 1, 1, 2))])
    with pytest.raises(ValueError, match="identity"):
        overwrite_iceberg_table_partitions(
            spark, t2.path,
            spark.createDataFrame([(2, __import__("datetime").datetime(2024, 1, 2, 2))], t2.schema()),
        )
