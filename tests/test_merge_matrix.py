"""The full MERGE matrix (warehouse.merge_into_arms + the SQL
general-form handler): ordered multi-arm WHEN MATCHED, assignment
expressions, conditional INSERT, and WHEN NOT MATCHED BY SOURCE
UPDATE/DELETE — Spark 3.5 / Iceberg semantics."""

from __future__ import annotations

import pytest

from minio_iceberg_polaris_lakehouse_spark.sql_frontend import LakehouseSQL
from minio_iceberg_polaris_lakehouse_spark.warehouse import Warehouse, WarehouseError


@pytest.fixture()
def lake(spark, tmp_path):
    lk = LakehouseSQL(spark, str(tmp_path / "wh"))
    lk.sql("CREATE NAMESPACE polaris.db")
    lk.sql(
        "CREATE TABLE polaris.db.acct (id INT, bal INT, status STRING) USING ICEBERG"
    )
    lk.sql(
        "INSERT INTO polaris.db.acct VALUES "
        "(1, 100, 'ok'), (2, -5, 'ok'), (3, 0, 'ok'), (4, 50, 'old')"
    )
    return lk


def _state(lake):
    return {
        r.id: (r.bal, r.status)
        for r in lake.sql("SELECT * FROM polaris.db.acct").collect()
    }


def test_multi_arm_first_match_fires(lake):
    """Two ordered MATCHED arms + fallthrough: negative balances DELETE,
    zero balances get a status rewrite, positive matches carry over
    (no arm fires), unmatched source rows insert."""
    lake.sql(
        "MERGE INTO polaris.db.acct t USING (SELECT * FROM VALUES "
        "(1, 0, 'x'), (2, 0, 'x'), (3, 0, 'x'), (9, 9, 'new') AS s(id, bal, status)) s "
        "ON t.id = s.id "
        "WHEN MATCHED AND t.bal < 0 THEN DELETE "
        "WHEN MATCHED AND t.bal = 0 THEN UPDATE SET status = 'zeroed' "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    got = _state(lake)
    assert 2 not in got  # first arm deleted the negative balance
    assert got[3] == (0, "zeroed")  # second arm fired
    assert got[1] == (100, "ok")  # matched, no arm fired → carried
    assert got[9] == (9, "new")  # inserted
    assert got[4] == (50, "old")  # never matched by source → untouched


def test_arm_order_matters(lake):
    """A catch-all first arm shadows later arms — in-order semantics."""
    lake.sql(
        "MERGE INTO polaris.db.acct t USING (SELECT * FROM VALUES "
        "(2, 1, 'y') AS s(id, bal, status)) s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET status = 'first' "
        "WHEN MATCHED AND t.bal < 0 THEN DELETE"
    )
    assert _state(lake)[2] == (-5, "first")  # shadowed DELETE never fired


def test_assignment_expressions_reference_both_sides(lake):
    lake.sql(
        "MERGE INTO polaris.db.acct t USING (SELECT * FROM VALUES "
        "(1, 7, 'x') AS s(id, bal, status)) s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET bal = t.bal + s.bal, status = concat(t.status, '+')"
    )
    assert _state(lake)[1] == (107, "ok+")


def test_conditional_insert_arm(lake):
    lake.sql(
        "MERGE INTO polaris.db.acct t USING (SELECT * FROM VALUES "
        "(8, 80, 'new'), (9, -1, 'new') AS s(id, bal, status)) s ON t.id = s.id "
        "WHEN NOT MATCHED AND s.bal > 0 THEN INSERT *"
    )
    got = _state(lake)
    assert got[8] == (80, "new")
    assert 9 not in got  # failed the insert condition


def test_not_matched_by_source_update(lake):
    """The sync form Spark 3.5 added: rows the source no longer carries
    get FLAGGED rather than deleted."""
    lake.sql(
        "MERGE INTO polaris.db.acct t USING (SELECT * FROM VALUES "
        "(1, 1, 'x') AS s(id, bal, status)) s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET bal = s.bal "
        "WHEN NOT MATCHED BY SOURCE AND t.status = 'ok' THEN UPDATE SET status = 'stale'"
    )
    got = _state(lake)
    assert got[1] == (1, "ok")
    assert got[2] == (-5, "stale") and got[3] == (0, "stale")
    assert got[4] == (50, "old")  # failed the NBS condition → carried


def test_not_matched_by_source_conditional_delete(lake):
    lake.sql(
        "MERGE INTO polaris.db.acct t USING (SELECT * FROM VALUES "
        "(1, 1, 'x') AS s(id, bal, status)) s ON t.id = s.id "
        "WHEN NOT MATCHED BY SOURCE AND t.bal <= 0 THEN DELETE"
    )
    got = _state(lake)
    assert set(got) == {1, 4}  # 2 and 3 dropped; 1 matched, 4 failed cond


def test_null_condition_does_not_fire(lake, spark):
    """Three-valued logic: a NULL arm condition means the arm does NOT
    fire — the row falls through to later arms / carry-over."""
    lake.sql("INSERT INTO polaris.db.acct VALUES (5, NULL, 'ok')")
    lake.sql(
        "MERGE INTO polaris.db.acct t USING (SELECT * FROM VALUES "
        "(5, 1, 'x') AS s(id, bal, status)) s ON t.id = s.id "
        "WHEN MATCHED AND t.bal > 0 THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET status = 'caught'"
    )
    assert _state(lake)[5] == (None, "caught")


def test_row_lineage_preserved_across_arms(lake):
    rows0 = lake.sql(
        "SELECT id, _row_id FROM polaris.db.acct ORDER BY id"
    ).collect()
    before = {r.id: r._row_id for r in rows0}
    lake.sql(
        "MERGE INTO polaris.db.acct t USING (SELECT * FROM VALUES "
        "(1, 1, 'x'), (7, 70, 'new') AS s(id, bal, status)) s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET bal = s.bal "
        "WHEN NOT MATCHED THEN INSERT * "
        "WHEN NOT MATCHED BY SOURCE AND t.id = 2 THEN DELETE"
    )
    rows1 = lake.sql(
        "SELECT id, _row_id FROM polaris.db.acct ORDER BY id"
    ).collect()
    after = {r.id: r._row_id for r in rows1}
    for i in (1, 3, 4):  # updated and carried rows keep identity
        assert after[i] == before[i]
    assert after[7] not in set(before.values())  # fresh id for the insert


def test_simple_forms_still_route_to_simple_handlers(lake):
    """The classic two-arm upsert must keep working (covered by the
    narrow patterns, first-match dispatch)."""
    lake.sql(
        "MERGE INTO polaris.db.acct t USING (SELECT * FROM VALUES "
        "(1, 11, 'u'), (6, 60, 'new') AS s(id, bal, status)) s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    )
    got = _state(lake)
    assert got[1] == (11, "u") and got[6] == (60, "new")


def test_cardinality_violation_still_detected(lake):
    with pytest.raises(WarehouseError, match="multiple source rows"):
        lake.sql(
            "MERGE INTO polaris.db.acct t USING (SELECT * FROM VALUES "
            "(1, 1, 'a'), (1, 2, 'b') AS s(id, bal, status)) s ON t.id = s.id "
            "WHEN MATCHED AND t.bal > 999 THEN DELETE "
            "WHEN MATCHED THEN UPDATE SET bal = s.bal"
        )


def test_garbled_clause_is_loud(lake):
    with pytest.raises(WarehouseError, match="cannot parse MERGE clause"):
        lake.sql(
            "MERGE INTO polaris.db.acct t USING (SELECT * FROM VALUES "
            "(1, 1, 'a') AS s(id, bal, status)) s ON t.id = s.id "
            "WHEN MATCHED THEN FROB "
            "WHEN NOT MATCHED BY SOURCE THEN DELETE"
        )


def test_python_api_multi_arm(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "w2"))
    t = wh.create_table("db", "m", "id int, v int")
    t.insert_values([(1, 10), (2, -1), (3, 5)])
    src = spark.createDataFrame([(1, 0), (2, 0), (9, 90)], "id int, v int")
    t.merge_into_arms(
        src,
        on="id",
        matched_arms=[
            {"cond": "t.v < 0", "action": "delete"},
            {"cond": None, "action": "update", "set": {"v": "t.v + s.v + 100"}},
        ],
        insert_arm={"cond": "s.v > 50"},
    )
    got = {r.id: r.v for r in t.read().collect()}
    assert got == {1: 110, 3: 5, 9: 90}
