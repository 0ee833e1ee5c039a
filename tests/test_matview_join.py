"""JOIN materialized views maintained incrementally by the delta-join
rule Δ(A⋈B) = ΔA⋈B_new ∪ A_old⋈ΔB.

The invariant everything here checks: after REFRESH, the MV's contents
equal re-running its defining query against the current base state —
and the returned `mode` column proves WHICH maintenance path produced
them (incremental must be incremental; a MIN/MAX view with a delete in
either window must take the full path rather than a wrong answer)."""

from __future__ import annotations

import tempfile

import pytest

from minio_iceberg_polaris_lakehouse_spark.matview import parse_incremental_join
from minio_iceberg_polaris_lakehouse_spark.sql_frontend import LakehouseSQL


@pytest.fixture()
def lake(spark):
    lk = LakehouseSQL(spark, tempfile.mkdtemp(prefix="lh_mvj_"))
    lk.sql(
        "CREATE TABLE polaris.db.ords (cust_id INT, amount DECIMAL(10,2), qty INT)"
        " USING ICEBERG"
    )
    lk.sql(
        "CREATE TABLE polaris.db.custs (cust_id INT, segment STRING) USING ICEBERG"
    )
    lk.sql("INSERT INTO db.custs VALUES (1, 'gold'), (2, 'gold'), (3, 'silver')")
    lk.sql(
        "INSERT INTO db.ords VALUES (1, 10.00, 1), (2, 5.50, 2), (3, 7.25, NULL),"
        " (1, 2.00, 4)"
    )
    return lk


MV_DEF = (
    "SELECT c.segment, SUM(o.amount) AS total, COUNT(*) AS n, COUNT(o.qty) AS n_qty "
    "FROM db.ords o JOIN db.custs c ON o.cust_id = c.cust_id "
    "GROUP BY c.segment"
)


def _key(row):
    return tuple((x is None, str(x)) for x in row)


def _rows(lake, sql):
    return sorted((tuple(r) for r in lake.sql(sql).collect()), key=_key)


def _refresh_mode(lake, mv="db.mv"):
    return lake.sql(f"REFRESH MATERIALIZED VIEW {mv}").collect()[0]["mode"]


def test_parse_join_spec_shapes():
    spec = parse_incremental_join(MV_DEF)
    assert spec is not None
    assert spec.on == [("cust_id", "cust_id")]
    assert spec.group_cols == ["c.segment"]
    assert [a for _, _, a in spec.aggs] == ["total", "n", "n_qty"]
    # disqualified shapes fall back to full mode (None)
    assert parse_incremental_join(MV_DEF.replace("JOIN", "LEFT JOIN")) is None
    assert (
        parse_incremental_join(
            "SELECT segment, COUNT(*) AS n FROM db.ords o JOIN db.custs c "
            "ON o.cust_id = c.cust_id GROUP BY segment"
        )
        is None
    )  # unqualified group key
    assert (
        parse_incremental_join(
            "SELECT c.segment, MEDIAN(o.amount) AS a FROM db.ords o JOIN db.custs c "
            "ON o.cust_id = c.cust_id GROUP BY c.segment"
        )
        is None
    )  # holistic aggregates are not self-maintainable


def test_create_join_mv_and_query(lake):
    lake.sql(f"CREATE MATERIALIZED VIEW db.mv AS {MV_DEF}")
    assert _rows(lake, "SELECT * FROM db.mv") == _rows(lake, MV_DEF)
    shows = {
        (r["viewName"], r["incremental"], r["base"])
        for r in lake.sql("SHOW MATERIALIZED VIEWS IN db").collect()
    }
    assert ("mv", True, "db.ords,db.custs") in shows


def test_incremental_insert_left(lake):
    lake.sql(f"CREATE MATERIALIZED VIEW db.mv AS {MV_DEF}")
    lake.sql("INSERT INTO db.ords VALUES (3, 100.00, 9), (2, 1.00, NULL)")
    assert _refresh_mode(lake) == "incremental"
    assert _rows(lake, "SELECT * FROM db.mv") == _rows(lake, MV_DEF)


def test_incremental_insert_right_fans_out(lake):
    lake.sql(f"CREATE MATERIALIZED VIEW db.mv AS {MV_DEF}")
    # a NEW customer arrives for orders that pre-date it: A_old ⋈ ΔB
    lake.sql("INSERT INTO db.ords VALUES (4, 50.00, 1)")
    assert _refresh_mode(lake) == "incremental"
    lake.sql("INSERT INTO db.custs VALUES (4, 'bronze')")
    assert _refresh_mode(lake) == "incremental"
    assert _rows(lake, "SELECT * FROM db.mv") == _rows(lake, MV_DEF)


def test_incremental_both_sides_same_window(lake):
    lake.sql(f"CREATE MATERIALIZED VIEW db.mv AS {MV_DEF}")
    # ΔA⋈ΔB rows must count exactly once (covered by ΔA⋈B_new)
    lake.sql("INSERT INTO db.custs VALUES (5, 'gold')")
    lake.sql("INSERT INTO db.ords VALUES (5, 3.00, 1)")
    assert _refresh_mode(lake) == "incremental"
    assert _rows(lake, "SELECT * FROM db.mv") == _rows(lake, MV_DEF)


def test_incremental_delete_signed_sum_count(lake):
    lake.sql(f"CREATE MATERIALIZED VIEW db.mv AS {MV_DEF}")
    lake.sql("DELETE FROM db.ords WHERE amount = 10.00")
    assert _refresh_mode(lake) == "incremental"
    assert _rows(lake, "SELECT * FROM db.mv") == _rows(lake, MV_DEF)
    # deleting the dimension row kills the whole segment's joined rows
    lake.sql("DELETE FROM db.custs WHERE cust_id = 3")
    assert _refresh_mode(lake) == "incremental"
    assert _rows(lake, "SELECT * FROM db.mv") == _rows(lake, MV_DEF)


def test_group_vanishes_when_last_joined_row_dies(lake):
    lake.sql(f"CREATE MATERIALIZED VIEW db.mv AS {MV_DEF}")
    lake.sql("DELETE FROM db.ords WHERE cust_id = 3")
    assert _refresh_mode(lake) == "incremental"
    rows = _rows(lake, "SELECT * FROM db.mv")
    assert rows == _rows(lake, MV_DEF)
    assert not any(r[0] == "silver" for r in rows)


def test_minmax_join_insert_only_incremental(lake):
    defn = (
        "SELECT c.segment, MIN(o.amount) AS lo, MAX(o.amount) AS hi, COUNT(*) AS n "
        "FROM db.ords o JOIN db.custs c ON o.cust_id = c.cust_id GROUP BY c.segment"
    )
    lake.sql(f"CREATE MATERIALIZED VIEW db.mvx AS {defn}")
    lake.sql("INSERT INTO db.ords VALUES (1, 0.50, 1), (3, 99.00, 2)")
    assert _refresh_mode(lake, "db.mvx") == "incremental"
    assert _rows(lake, "SELECT * FROM db.mvx") == _rows(lake, defn)


def test_minmax_join_delete_forces_full(lake):
    defn = (
        "SELECT c.segment, MAX(o.amount) AS hi, COUNT(*) AS n "
        "FROM db.ords o JOIN db.custs c ON o.cust_id = c.cust_id GROUP BY c.segment"
    )
    lake.sql(f"CREATE MATERIALIZED VIEW db.mvx AS {defn}")
    lake.sql("DELETE FROM db.ords WHERE amount = 10.00")  # the gold MAX
    assert _refresh_mode(lake, "db.mvx") == "full"
    assert _rows(lake, "SELECT * FROM db.mvx") == _rows(lake, defn)


def test_noop_when_both_bases_unchanged(lake):
    lake.sql(f"CREATE MATERIALIZED VIEW db.mv AS {MV_DEF}")
    assert _refresh_mode(lake) == "noop"


def test_where_and_multi_key_join(lake):
    defn = (
        "SELECT c.segment, SUM(o.amount) AS total "
        "FROM db.ords o JOIN db.custs c ON o.cust_id = c.cust_id "
        "WHERE o.qty IS NOT NULL GROUP BY c.segment"
    )
    lake.sql(f"CREATE MATERIALIZED VIEW db.mvw AS {defn}")
    lake.sql("INSERT INTO db.ords VALUES (1, 70.00, NULL), (2, 30.00, 5)")
    assert _refresh_mode(lake, "db.mvw") == "incremental"
    assert _rows(lake, "SELECT * FROM db.mvw") == _rows(lake, defn)


def test_repeated_refresh_schema_stable(lake):
    lake.sql(f"CREATE MATERIALIZED VIEW db.mv AS {MV_DEF}")
    before = [(f.name, f.dataType.simpleString()) for f in
              lake.sql("SELECT * FROM db.mv").schema.fields]
    for _ in range(3):
        lake.sql("INSERT INTO db.ords VALUES (1, 1.00, 1)")
        assert _refresh_mode(lake) == "incremental"
    after = [(f.name, f.dataType.simpleString()) for f in
             lake.sql("SELECT * FROM db.mv").schema.fields]
    assert before == after
    assert _rows(lake, "SELECT * FROM db.mv") == _rows(lake, MV_DEF)


def test_avg_join_mv_incremental_under_churn(lake):
    defn = (
        "SELECT c.segment, AVG(o.amount) AS avg_amt, COUNT(*) AS n "
        "FROM db.ords o JOIN db.custs c ON o.cust_id = c.cust_id GROUP BY c.segment"
    )
    lake.sql(f"CREATE MATERIALIZED VIEW db.mva AS {defn}")
    assert _rows(lake, "SELECT * FROM db.mva") == _rows(lake, defn)
    lake.sql("INSERT INTO db.ords VALUES (1, 40.00, 1), (3, 1.25, 2)")
    lake.sql("DELETE FROM db.ords WHERE amount = 5.50")
    assert _refresh_mode(lake, "db.mva") == "incremental"
    assert _rows(lake, "SELECT * FROM db.mva") == _rows(lake, defn)
    # hidden AVG components never surface
    cols = lake.sql("SELECT * FROM db.mva").columns
    assert cols == ["segment", "avg_amt", "n"]


def test_join_mv_randomized_churn(lake):
    """Seeded random interleaving of inserts/deletes on BOTH bases with a
    refresh after every step: the MV must equal a fresh recompute at
    every point. Exercises ΔA⋈B_new, A_old⋈ΔB, ΔA⋈ΔB-in-one-window,
    group death, and signed folds under arbitrary churn."""
    import random

    rng = random.Random(20260815)
    lake.sql(f"CREATE MATERIALIZED VIEW db.mv AS {MV_DEF}")
    next_cust = 10
    next_amt = 1
    for step in range(14):
        op = rng.choice(["ins_ord", "ins_ord", "ins_cust", "del_ord", "del_cust"])
        if op == "ins_ord":
            cid = rng.randrange(1, next_cust)
            qty = rng.choice(["NULL", str(rng.randrange(1, 9))])
            lake.sql(
                f"INSERT INTO db.ords VALUES ({cid}, {next_amt}.00, {qty})"
            )
            next_amt += 1
        elif op == "ins_cust":
            seg = rng.choice(["gold", "silver", "bronze"])
            lake.sql(f"INSERT INTO db.custs VALUES ({next_cust}, '{seg}')")
            next_cust += 1
        elif op == "del_ord":
            lake.sql(f"DELETE FROM db.ords WHERE cust_id = {rng.randrange(1, next_cust)}")
        else:
            lake.sql(f"DELETE FROM db.custs WHERE cust_id = {rng.randrange(1, next_cust)}")
        mode = _refresh_mode(lake)
        assert mode in ("incremental", "noop"), f"step {step}: {mode}"
        assert _rows(lake, "SELECT * FROM db.mv") == _rows(lake, MV_DEF), f"step {step} ({op})"
