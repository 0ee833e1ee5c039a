"""Flink/CDC-style UPSERT writes (Iceberg ``write.upsert.enabled`` shape):
one snapshot = equality-delete over the batch's identifier keys + the new
rows. Pins the sequence semantics (old rows die, batch rows survive),
identity DDL, SQL routing, CDC/changelog output, time travel, WAP
branches, export → foreign-reader parity, and the duplicate-key guard."""

from __future__ import annotations

import pytest

from minio_iceberg_polaris_lakehouse_spark.warehouse import Warehouse, WarehouseError


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "warehouse"))


def _t(wh, name):
    t = wh.create_table("db", name, "id int, v string")
    t.set_identifier_fields("id")
    return t


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_upsert_inserts_and_replaces(wh, spark):
    t = _t(wh, "u1")
    t.insert_values([(1, "a"), (2, "b"), (3, "c")])
    t.upsert(spark.createDataFrame([(2, "B2"), (4, "d")], t.schema()))
    assert _rows(t.read()) == [(1, "a"), (2, "B2"), (3, "c"), (4, "d")]
    snap = t._resolve()
    assert snap["operation"] == "overwrite"
    assert snap["summary"]["upsert"] == "true"
    assert snap["summary"]["added-records"] == 2
    assert snap["summary"]["added-equality-deletes"] == 2
    # merge-on-read: the first snapshot's data files are untouched
    assert set(t._resolve(version=1)["manifest"]) <= set(snap["manifest"])


def test_upsert_needs_identifier_fields(wh, spark):
    t = wh.create_table("db", "u2", "id int, v string")
    with pytest.raises(WarehouseError, match="identifier fields"):
        t.upsert(spark.createDataFrame([(1, "a")], t.schema()))


def test_upsert_duplicate_key_batch_refused_and_nothing_commits(wh, spark):
    t = _t(wh, "u3")
    t.insert_values([(1, "a")])
    before = t.current_snapshot_id()
    with pytest.raises(WarehouseError, match="multiple rows for identifier key"):
        t.upsert(spark.createDataFrame([(2, "x"), (2, "y")], t.schema()))
    assert t.current_snapshot_id() == before
    assert _rows(t.read()) == [(1, "a")]


def test_upsert_twice_latest_wins_and_time_travel(wh, spark):
    t = _t(wh, "u4")
    t.insert_values([(1, "a")])
    t.upsert(spark.createDataFrame([(1, "v2")], t.schema()))
    t.upsert(spark.createDataFrame([(1, "v3")], t.schema()))
    assert _rows(t.read()) == [(1, "v3")]
    assert _rows(t.read(version=2)) == [(1, "v2")]
    assert _rows(t.read(version=1)) == [(1, "a")]


def test_upsert_composite_key(wh, spark):
    t = wh.create_table("db", "u5", "a int, b string, v double")
    t.set_identifier_fields("a", "b")
    t.insert_values([(1, "x", 1.0), (1, "y", 2.0)])
    t.upsert(spark.createDataFrame([(1, "x", 9.0), (2, "x", 3.0)], t.schema()))
    assert _rows(t.read()) == [(1, "x", 9.0), (1, "y", 2.0), (2, "x", 3.0)]


def test_write_upsert_enabled_routes_sql_insert(wh, spark):
    t = _t(wh, "u6")
    t.set_properties({"write.upsert.enabled": "true"})
    t.insert_values([(1, "a"), (2, "b")])  # append() -> upsert()
    t.insert_values([(2, "B2"), (3, "c")])
    assert _rows(t.read()) == [(1, "a"), (2, "B2"), (3, "c")]
    assert t._resolve()["summary"]["upsert"] == "true"


def test_upsert_changelog_emits_delete_then_insert(wh, spark):
    t = _t(wh, "u7")
    t.insert_values([(1, "a"), (2, "b")])
    sid = t.upsert(spark.createDataFrame([(2, "B2"), (3, "c")], t.schema()))
    ch = t.changes(from_version=1, to_version=sid)
    got = sorted(
        (r.id, r.v, r._change_type) for r in ch.collect()
    )
    # key 2: old row deleted + new row inserted; key 3: insert only;
    # key 1: untouched, no event
    assert got == [
        (2, "B2", "insert"),
        (2, "b", "delete"),
        (3, "c", "insert"),
    ]


def test_upsert_key_never_present_is_plain_insert(wh, spark):
    t = _t(wh, "u8")
    t.insert_values([(1, "a")])
    t.upsert(spark.createDataFrame([(9, "z")], t.schema()))
    assert _rows(t.read()) == [(1, "a"), (9, "z")]


def test_upsert_on_wap_branch_invisible_until_publish(wh, spark):
    t = _t(wh, "u9")
    t.insert_values([(1, "a"), (2, "b")])
    t.create_ref("audit", "branch")
    t.upsert(spark.createDataFrame([(2, "staged")], t.schema()), branch="audit")
    assert _rows(t.read()) == [(1, "a"), (2, "b")], "main unchanged"
    assert _rows(t.read(version="audit")) == [(1, "a"), (2, "staged")]
    t.fast_forward("audit")
    assert _rows(t.read()) == [(1, "a"), (2, "staged")]


def test_upsert_export_foreign_reader_parity(wh, spark):
    from minio_iceberg_polaris_lakehouse_spark.sources.iceberg_reader import (
        read_iceberg_table,
    )

    t = _t(wh, "u10")
    t.insert_values([(1, "a"), (2, "b"), (3, "c")])
    t.upsert(spark.createDataFrame([(2, "B2"), (4, "d")], t.schema()))
    got = read_iceberg_table(spark, t.path)
    assert _rows(got.select("id", "v")) == _rows(t.read())


def test_identifier_fields_sql_roundtrip(wh, spark, tmp_path):
    from minio_iceberg_polaris_lakehouse_spark.sql_frontend import LakehouseSQL

    lake = LakehouseSQL(spark, str(tmp_path / "lake"))
    lake.sql("CREATE TABLE polaris.db.k (id INT, ver INT, v STRING) USING ICEBERG")
    lake.sql("ALTER TABLE polaris.db.k SET IDENTIFIER FIELDS id, ver")
    tab = lake.wh.table("db", "k")
    assert tab.identifier_fields() == ["id", "ver"]
    lake.sql("ALTER TABLE polaris.db.k DROP IDENTIFIER FIELDS ver")
    assert tab.identifier_fields() == ["id"]
    with pytest.raises(WarehouseError, match="not identifier fields"):
        lake.sql("ALTER TABLE polaris.db.k DROP IDENTIFIER FIELDS nope")
    with pytest.raises(WarehouseError, match="not in schema"):
        lake.sql("ALTER TABLE polaris.db.k SET IDENTIFIER FIELDS missing_col")
    # full SQL upsert flow: property routes INSERT INTO through upsert
    lake.sql("ALTER TABLE polaris.db.k SET TBLPROPERTIES ('write.upsert.enabled'='true')")
    lake.sql("INSERT INTO polaris.db.k VALUES (1, 1, 'a'), (2, 1, 'b')")
    lake.sql("INSERT INTO polaris.db.k VALUES (1, 2, 'A2'), (3, 1, 'c')")
    got = _rows(lake.sql("SELECT id, ver, v FROM polaris.db.k"))
    assert got == [(1, 2, "A2"), (2, 1, "b"), (3, 1, "c")]


def test_identifier_fields_in_open_metadata_export(wh, spark):
    import json
    import os

    t = _t(wh, "u11")
    t.insert_values([(1, "a")])
    mdir = os.path.join(t.path, "metadata")
    latest = sorted(f for f in os.listdir(mdir) if f.endswith(".metadata.json"))[-1]
    doc = json.load(open(os.path.join(mdir, latest)))
    schema = doc["schemas"][doc["current-schema-id"]] if isinstance(
        doc.get("schemas"), dict
    ) else next(s for s in doc["schemas"] if s["schema-id"] == doc["current-schema-id"])
    id_field = next(f for f in schema["fields"] if f["name"] == "id")
    assert schema.get("identifier-field-ids") == [id_field["id"]]


def test_upsert_then_eq_compaction_folds_tombstones(wh, spark):
    t = _t(wh, "u12")
    t.insert_values([(1, "a"), (2, "b")])
    t.upsert(spark.createDataFrame([(2, "B2")], t.schema()))
    t.compact()
    assert _rows(t.read()) == [(1, "a"), (2, "B2")]
    snap = t._resolve()
    assert not snap.get("eq_deletes"), "compaction absorbs equality tombstones"


def test_upsert_partitioned_table(wh, spark):
    """Engine-side upsert on a hidden-partitioned table: the batch lands
    partitioned as any write does; the equality delete applies
    table-wide regardless of partition."""
    t = wh.create_table("db", "u13", "id int, lang string, v string", partition_by="lang")
    t.set_identifier_fields("id")
    t.insert_values([(1, "en", "a"), (2, "fr", "b")])
    # key 2 moves partitions (fr -> en) — the eq delete still kills the
    # old row because identity is the key, not the partition
    t.upsert(spark.createDataFrame([(2, "en", "B2"), (3, "de", "c")], t.schema()))
    assert _rows(t.read()) == [(1, "en", "a"), (2, "en", "B2"), (3, "de", "c")]


def test_fuzz_upsert_model_check(wh, spark):
    """Model check: a random interleaving of plain inserts, upserts, and
    key deletes against a dict model — after every commit the table must
    equal the model exactly, and every prior snapshot must still
    time-travel to its own recorded state. Catches sequence-rule
    regressions (an upsert's delete leaking onto its own batch, a
    resurrected key staying dead) under arbitrary operation orders."""
    import random

    rng = random.Random(7_007)
    t = _t(wh, "u_fuzz")
    t.set_properties({"write.delete.mode": "merge-on-read-equality",
                      "write.delete.equality-columns": "id"})
    model: dict[int, str] = {}
    history: list[tuple[int, dict[int, str]]] = []
    next_val = 0

    def fresh(k):
        nonlocal next_val
        next_val += 1
        return f"v{next_val}"

    for step in range(18):
        op = rng.choice(["upsert", "upsert", "insert_new", "delete"])
        if op == "upsert":
            ks = rng.sample(range(8), rng.randint(1, 3))
            rows = [(k, fresh(k)) for k in ks]
            t.upsert(spark.createDataFrame(rows, t.schema()))
            model.update(dict(rows))
        elif op == "insert_new":
            # plain append of keys NOT present (append would duplicate
            # present keys — the model is a dict, so only new keys here)
            ks = [k for k in rng.sample(range(8, 16), rng.randint(1, 2)) if k not in model]
            if not ks:
                continue
            rows = [(k, fresh(k)) for k in ks]
            t.append(spark.createDataFrame(rows, t.schema()))
            model.update(dict(rows))
        else:
            if not model:
                continue
            k = rng.choice(sorted(model))
            t.delete_where(f"id = {k}")
            del model[k]
        history.append((t.current_snapshot_id(), dict(model)))
        got = {r.id: r.v for r in t.read().collect()}
        assert got == model, f"step {step} ({op}): {got} != {model}"

    # all snapshots time-travel to their recorded states
    for sid, state in rng.sample(history, min(6, len(history))):
        got = {r.id: r.v for r in t.read(version=sid).collect()}
        assert got == state, f"snapshot {sid}"


def test_upsert_survives_snapshot_expiry(wh, spark):
    """Equality-delete applicability must survive expire_snapshots: the
    sequence numbers live in persisted dir_seqs, not in the snapshot log
    the expiry truncates."""
    t = _t(wh, "u14")
    t.insert_values([(1, "a"), (2, "b")])
    t.upsert(spark.createDataFrame([(2, "B2"), (3, "c")], t.schema()))
    t.upsert(spark.createDataFrame([(1, "A2")], t.schema()))
    t.expire_snapshots(keep_last=1)
    assert _rows(t.read()) == [(1, "A2"), (2, "B2"), (3, "c")]
    # maintenance after expiry still folds the tombstones
    t.compact()
    assert _rows(t.read()) == [(1, "A2"), (2, "B2"), (3, "c")]
    assert not t._resolve().get("eq_deletes")
    # and new upserts keep working on the compacted table
    t.upsert(spark.createDataFrame([(3, "C2")], t.schema()))
    assert _rows(t.read()) == [(1, "A2"), (2, "B2"), (3, "C2")]
