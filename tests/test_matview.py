"""Materialized views: create/refresh/drop, incremental (changelog-
driven) maintenance vs full recompute, guards, persistence.

The invariant everything here checks: after REFRESH, the MV's contents
equal re-running its defining query against the current base state —
regardless of which maintenance path (incremental delta fold vs full
recompute) produced them."""

from __future__ import annotations

import tempfile

import pytest

from minio_iceberg_polaris_lakehouse_spark.matview import parse_incremental
from minio_iceberg_polaris_lakehouse_spark.sql_frontend import LakehouseSQL
from minio_iceberg_polaris_lakehouse_spark.warehouse import WarehouseError


@pytest.fixture()
def lake(spark):
    return LakehouseSQL(spark, tempfile.mkdtemp(prefix="lh_mv_"))


def _mk_sales(lake):
    lake.sql(
        "CREATE TABLE polaris.db.sales (region STRING, amount DECIMAL(10,2), qty INT)"
        " USING ICEBERG"
    )
    lake.sql(
        "INSERT INTO db.sales VALUES ('eu', 10.00, 1), ('eu', 5.50, 2), ('us', 7.25, NULL)"
    )


def _key(row):
    return tuple((x is None, str(x)) for x in row)


def _rows(lake, sql):
    return sorted((tuple(r) for r in lake.sql(sql).collect()), key=_key)


def _recompute(lake, defn):
    return _rows(lake, defn)


MV_DEF = (
    "SELECT region, SUM(amount) AS total, COUNT(*) AS n, COUNT(qty) AS n_qty "
    "FROM db.sales GROUP BY region"
)


def _mv_state(lake):
    return _rows(lake, "SELECT * FROM db.mv")


def test_create_and_query(lake):
    _mk_sales(lake)
    lake.sql(f"CREATE MATERIALIZED VIEW db.mv AS {MV_DEF}")
    assert _mv_state(lake) == _recompute(lake, MV_DEF)
    # hidden maintenance column is invisible to SELECT * and DESCRIBE
    assert "_lh_count" not in lake.sql("SELECT * FROM db.mv").columns
    desc_cols = [r.col_name for r in lake.sql("DESCRIBE db.mv").collect()]
    assert "_lh_count" not in desc_cols
    assert lake.table("db.mv").columns == ["region", "total", "n", "n_qty"]
    shown = lake.sql("SHOW MATERIALIZED VIEWS IN db").collect()
    assert [(r.viewName, r.incremental, r.base) for r in shown] == [("mv", True, "db.sales")]


def test_incremental_refresh_inserts_and_deletes(lake):
    _mk_sales(lake)
    lake.sql(f"CREATE MATERIALIZED VIEW db.mv AS {MV_DEF}")
    lake.sql("INSERT INTO db.sales VALUES ('eu', 1.00, 9), ('ap', 2.00, NULL)")
    r = lake.sql("REFRESH MATERIALIZED VIEW db.mv").collect()[0]
    assert r.mode == "incremental"
    assert _mv_state(lake) == _recompute(lake, MV_DEF)
    # delete the only 'ap' row: the group must disappear entirely
    lake.sql("DELETE FROM db.sales WHERE region = 'ap'")
    r = lake.sql("REFRESH MATERIALIZED VIEW db.mv").collect()[0]
    assert r.mode == "incremental"
    state = _mv_state(lake)
    assert state == _recompute(lake, MV_DEF)
    assert not any(row[0] == "ap" for row in state)
    # no base change since: refresh is a metadata-only noop
    assert lake.sql("REFRESH MATERIALIZED VIEW db.mv").collect()[0].mode == "noop"


def test_incremental_with_where_and_null_groups(lake):
    lake.sql("CREATE TABLE polaris.db.ev (k STRING, x INT) USING ICEBERG")
    lake.sql("INSERT INTO db.ev VALUES ('a', 1), (NULL, 2), ('a', NULL), (NULL, 4)")
    defn = "SELECT k, SUM(x) AS sx, COUNT(*) AS n FROM db.ev WHERE x IS NULL OR x < 100 GROUP BY k"
    lake.sql(f"CREATE MATERIALIZED VIEW db.mv2 AS {defn}")
    lake.sql("INSERT INTO db.ev VALUES (NULL, 10), ('b', 500)")  # 500 filtered out
    r = lake.sql("REFRESH MATERIALIZED VIEW db.mv2").collect()[0]
    assert r.mode == "incremental"
    assert _rows(lake, "SELECT * FROM db.mv2") == _recompute(lake, defn)
    # NULL-keyed group present and correctly maintained
    nulls = [row for row in _rows(lake, "SELECT * FROM db.mv2") if row[0] is None]
    assert nulls == [(None, 16, 3)]


def test_update_flows_through_changelog(lake):
    _mk_sales(lake)
    lake.sql(f"CREATE MATERIALIZED VIEW db.mv AS {MV_DEF}")
    lake.sql("UPDATE db.sales SET amount = 100.00 WHERE region = 'us'")
    r = lake.sql("REFRESH MATERIALIZED VIEW db.mv").collect()[0]
    assert r.mode == "incremental"
    assert _mv_state(lake) == _recompute(lake, MV_DEF)


def test_full_recompute_for_nonincremental_definition(lake):
    _mk_sales(lake)
    lake.sql("CREATE TABLE polaris.db.dim (region STRING, zone STRING) USING ICEBERG")
    lake.sql("INSERT INTO db.dim VALUES ('eu', 'emea'), ('us', 'amer')")
    # LEFT JOIN is outside every incremental shape (unmatched-side NULL
    # groups are not self-maintainable) — the honest full path runs
    defn = (
        "SELECT d.zone AS zone, AVG(s.amount) AS avg_amount FROM db.sales s "
        "LEFT JOIN db.dim d ON s.region = d.region GROUP BY d.zone"
    )
    lake.sql(f"CREATE MATERIALIZED VIEW db.mvj AS {defn}")
    assert lake.sql("SHOW MATERIALIZED VIEWS").collect()[0].incremental is False
    assert _rows(lake, "SELECT * FROM db.mvj") == _recompute(lake, defn)
    lake.sql("INSERT INTO db.sales VALUES ('us', 2.75, 1)")
    r = lake.sql("REFRESH MATERIALIZED VIEW db.mvj").collect()[0]
    assert r.mode == "full"
    assert _rows(lake, "SELECT * FROM db.mvj") == _recompute(lake, defn)


def test_expired_base_snapshot_falls_back_to_full(lake):
    _mk_sales(lake)
    lake.sql(f"CREATE MATERIALIZED VIEW db.mv AS {MV_DEF}")
    lake.sql("INSERT INTO db.sales VALUES ('eu', 1.00, 1)")
    lake.sql("INSERT INTO db.sales VALUES ('ap', 3.00, 2)")
    # expire everything but the latest snapshot: the synced one is gone
    lake.sql("CALL polaris.system.expire_snapshots(table => 'db.sales', retain_last => 1)")
    r = lake.sql("REFRESH MATERIALIZED VIEW db.mv").collect()[0]
    assert r.mode == "full"
    assert _mv_state(lake) == _recompute(lake, MV_DEF)
    # and incremental maintenance resumes from the new synced point
    lake.sql("INSERT INTO db.sales VALUES ('ap', 4.00, 2)")
    assert lake.sql("REFRESH MATERIALIZED VIEW db.mv").collect()[0].mode == "incremental"
    assert _mv_state(lake) == _recompute(lake, MV_DEF)


def test_dml_and_drop_guards(lake):
    _mk_sales(lake)
    lake.sql(f"CREATE MATERIALIZED VIEW db.mv AS {MV_DEF}")
    for stmt in [
        "INSERT INTO db.mv VALUES ('xx', 1.00, 1, 1)",
        "DELETE FROM db.mv WHERE region = 'eu'",
        "UPDATE db.mv SET n = 0 WHERE region = 'eu'",
        "TRUNCATE TABLE db.mv",
        "MERGE INTO db.mv t USING db.sales s ON t.region = s.region "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
    ]:
        with pytest.raises(WarehouseError, match="materialized view"):
            lake.sql(stmt)
    with pytest.raises(WarehouseError, match="materialized view"):
        lake.sql("DROP TABLE db.mv")
    # duplicate name refused; IF NOT EXISTS is a no-op
    with pytest.raises(WarehouseError, match="exists"):
        lake.sql(f"CREATE MATERIALIZED VIEW db.mv AS {MV_DEF}")
    lake.sql(f"CREATE MATERIALIZED VIEW IF NOT EXISTS db.mv AS {MV_DEF}")
    lake.sql("DROP MATERIALIZED VIEW db.mv")
    assert lake.sql("SHOW MATERIALIZED VIEWS").count() == 0
    with pytest.raises(Exception, match="cannot be found|does not exist"):
        lake.sql("SELECT * FROM db.mv").collect()
    with pytest.raises(WarehouseError, match="does not exist"):
        lake.sql("DROP MATERIALIZED VIEW db.mv")
    lake.sql("DROP MATERIALIZED VIEW IF EXISTS db.mv")


def test_registry_survives_session_reattach(lake, spark):
    _mk_sales(lake)
    lake.sql(f"CREATE MATERIALIZED VIEW db.mv AS {MV_DEF}")
    lake.sql("INSERT INTO db.sales VALUES ('ap', 9.00, 1)")
    lake2 = LakehouseSQL(spark, lake.wh.root)
    r = lake2.sql("REFRESH MATERIALIZED VIEW db.mv").collect()[0]
    assert r.mode == "incremental"
    assert _rows(lake2, "SELECT * FROM db.mv") == _recompute(lake2, MV_DEF)


def test_view_over_matview_and_time_travel(lake):
    _mk_sales(lake)
    lake.sql(f"CREATE MATERIALIZED VIEW db.mv AS {MV_DEF}")
    lake.sql("CREATE VIEW db.v AS SELECT region, total FROM db.mv WHERE total > 8")
    assert _rows(lake, "SELECT * FROM db.v") == [("eu", 15.50)]
    lake.sql("INSERT INTO db.sales VALUES ('eu', 1.00, 1)")
    lake.sql("REFRESH MATERIALIZED VIEW db.mv")
    # storage history is real table history: version 1 = the creation
    v1 = _rows(lake, "SELECT * FROM db.mv VERSION AS OF 1")
    assert sorted(v1) == sorted(
        [("eu", 15.50, 2, 2), ("us", 7.25, 1, 0)]
    )
    assert all(len(t) == 4 for t in v1)  # hidden column stays hidden


def test_parse_incremental_shapes():
    ok = parse_incremental(
        "SELECT a, b AS bb, SUM(x * (1 - y)) AS s, COUNT(*) AS n, COUNT(x) AS nx "
        "FROM ns.t WHERE x > 0 GROUP BY a, b"
    )
    assert ok is not None
    assert ok.group_aliases == ["a", "bb"]
    assert [k for k, *_ in ok.aggs] == ["sum", "count_star", "count"]
    mm = parse_incremental("SELECT a, MIN(x) AS lo, MAX(x) AS hi FROM ns.t GROUP BY a")
    assert mm is not None and [k for k, *_ in mm.aggs] == ["min", "max"]
    av = parse_incremental("SELECT a, AVG(x) AS m FROM ns.t GROUP BY a")
    assert av is not None and [k for k, *_ in av.aggs] == ["avg"]
    ex = parse_incremental(
        "SELECT upper(a) AS ua, SUM(x) AS s FROM ns.t GROUP BY upper(a)"
    )
    assert ex is not None and ex.group_cols == ["upper(a)"]
    # shapes that must fall back to full recompute
    for bad in [
        "SELECT a, MEDIAN(x) AS m FROM ns.t GROUP BY a",
        "SELECT a, SUM(DISTINCT x) AS s FROM ns.t GROUP BY a",
        "SELECT a, SUM(x) AS s FROM ns.t JOIN ns.u ON t.a = u.a GROUP BY a",
        "SELECT a, SUM(x) AS s FROM ns.t GROUP BY a HAVING SUM(x) > 1",
        # expression key NOT repeated verbatim in the select list
        "SELECT a, SUM(x) AS s FROM ns.t GROUP BY upper(a)",
        # unaliased expression key
        "SELECT upper(a), SUM(x) AS s FROM ns.t GROUP BY upper(a)",
        "SELECT a, SUM(x) FROM ns.t GROUP BY a",  # unaliased aggregate
        "SELECT SUM(x) AS s FROM ns.t",  # no GROUP BY
        "WITH c AS (SELECT * FROM ns.t) SELECT a, SUM(x) AS s FROM c GROUP BY a",
    ]:
        assert parse_incremental(bad) is None, bad


def test_minmax_incremental_append_only_and_delete_fallback(lake):
    """MIN/MAX maintain incrementally while the refresh window is
    insert-only; a delete in the window forces a (correct) full
    recompute, after which incremental maintenance resumes."""
    lake.sql("CREATE TABLE polaris.db.mm (k STRING, x INT) USING ICEBERG")
    lake.sql("INSERT INTO db.mm VALUES ('a', 5), ('a', 9), ('b', 3)")
    defn = "SELECT k, MIN(x) AS lo, MAX(x) AS hi, COUNT(*) AS n FROM db.mm GROUP BY k"
    lake.sql(f"CREATE MATERIALIZED VIEW db.mvm AS {defn}")
    assert _rows(lake, "SELECT * FROM db.mvm") == _recompute(lake, defn)
    # insert-only window: new global max, new group
    lake.sql("INSERT INTO db.mm VALUES ('a', 100), ('c', 1)")
    r = lake.sql("REFRESH MATERIALIZED VIEW db.mvm").collect()[0]
    assert r.mode == "incremental"
    assert _rows(lake, "SELECT * FROM db.mvm") == _recompute(lake, defn)
    # delete the current max: not invertible → full recompute, right answer
    lake.sql("DELETE FROM db.mm WHERE x = 100")
    r = lake.sql("REFRESH MATERIALIZED VIEW db.mvm").collect()[0]
    assert r.mode == "full"
    state = _rows(lake, "SELECT * FROM db.mvm")
    assert state == _recompute(lake, defn)
    assert ("a", 5, 9, 2) in state
    # and incremental resumes on the next insert-only window
    lake.sql("INSERT INTO db.mm VALUES ('b', -7)")
    r = lake.sql("REFRESH MATERIALIZED VIEW db.mvm").collect()[0]
    assert r.mode == "incremental"
    assert _rows(lake, "SELECT * FROM db.mvm") == _recompute(lake, defn)


def test_matview_over_foreign_base_incremental(lake, spark, tmp_path):
    """An MV whose base is a REGISTERED FOREIGN Iceberg table maintains
    incrementally from the open-metadata manifest diff: foreign appends
    fold in as pure-insert deltas (MIN/MAX included — the interval is
    append-only by construction); a foreign row-level DELETE makes the
    interval non-append and forces a correct full recompute."""
    from minio_iceberg_polaris_lakehouse_spark.sources.iceberg_writer import (
        append_iceberg_table,
        delete_iceberg_table_where,
    )
    from minio_iceberg_polaris_lakehouse_spark.warehouse import Warehouse

    src_wh = Warehouse(spark, str(tmp_path / "src"))
    t = src_wh.create_table("db", "ft", "k string, x int")
    t.insert_values([("a", 1), ("a", 5), ("b", 2)])
    lake.sql(
        "CALL polaris.system.register_table(table => 'ext.ft', "
        f"metadata_file => '{t.path}')"
    )
    defn = "SELECT k, SUM(x) AS sx, MAX(x) AS hi, COUNT(*) AS n FROM ext.ft GROUP BY k"
    lake.sql(f"CREATE MATERIALIZED VIEW db.fmv AS {defn}")
    assert lake.sql("SHOW MATERIALIZED VIEWS IN db").collect()[0].incremental is True
    assert _rows(lake, "SELECT * FROM db.fmv") == _recompute(lake, defn)
    # FOREIGN append (another engine wrote): incremental fold
    append_iceberg_table(
        spark, t.path, spark.createDataFrame([("a", 100), ("c", 7)], "k string, x int")
    )
    r = lake.sql("REFRESH MATERIALIZED VIEW db.fmv").collect()[0]
    assert r.mode == "incremental"
    assert _rows(lake, "SELECT * FROM db.fmv") == _recompute(lake, defn)
    assert ("a", 106, 100, 3) in _rows(lake, "SELECT * FROM db.fmv")
    # noop when the foreign table hasn't moved
    assert lake.sql("REFRESH MATERIALIZED VIEW db.fmv").collect()[0].mode == "noop"
    # foreign DELETE: interval is not pure appends → full recompute
    delete_iceberg_table_where(spark, t.path, "x = 100")
    r = lake.sql("REFRESH MATERIALIZED VIEW db.fmv").collect()[0]
    assert r.mode == "full"
    assert _rows(lake, "SELECT * FROM db.fmv") == _recompute(lake, defn)
    # and incremental resumes
    append_iceberg_table(spark, t.path, spark.createDataFrame([("b", 9)], "k string, x int"))
    assert lake.sql("REFRESH MATERIALIZED VIEW db.fmv").collect()[0].mode == "incremental"
    assert _rows(lake, "SELECT * FROM db.fmv") == _recompute(lake, defn)


def test_avg_mv_incremental_under_churn(lake):
    _mk_sales(lake)
    defn = (
        "SELECT region, AVG(amount) AS avg_amt, SUM(qty) AS q "
        "FROM db.sales GROUP BY region"
    )
    lake.sql(f"CREATE MATERIALIZED VIEW db.mva AS {defn}")
    assert _rows(lake, "SELECT * FROM db.mva") == _recompute(lake, defn)
    lake.sql("INSERT INTO db.sales VALUES ('eu', 100.00, 7), ('ap', 3.00, 1)")
    lake.sql("DELETE FROM db.sales WHERE amount = 10.00")
    res = lake.sql("REFRESH MATERIALIZED VIEW db.mva").collect()[0]
    assert res.mode == "incremental"
    assert _rows(lake, "SELECT * FROM db.mva") == _recompute(lake, defn)
    # a group whose rows all die disappears; hidden columns stay hidden
    lake.sql("DELETE FROM db.sales WHERE region = 'ap'")
    assert lake.sql("REFRESH MATERIALIZED VIEW db.mva").collect()[0].mode == "incremental"
    assert _rows(lake, "SELECT * FROM db.mva") == _recompute(lake, defn)
    assert lake.sql("SELECT * FROM db.mva").columns == ["region", "avg_amt", "q"]
    desc = {r.col_name for r in lake.sql("DESCRIBE TABLE db.mva").collect()}
    assert not any(c.startswith("_lh_") for c in desc)


def test_avg_all_null_group_stays_null(lake):
    _mk_sales(lake)
    defn = "SELECT region, AVG(qty) AS avg_qty FROM db.sales GROUP BY region"
    lake.sql(f"CREATE MATERIALIZED VIEW db.mvn AS {defn}")
    # 'us' has only NULL qty → avg NULL; insert another NULL-qty row and
    # refresh: the folded count component stays 0 and avg stays NULL
    lake.sql("INSERT INTO db.sales VALUES ('us', 1.00, NULL)")
    assert lake.sql("REFRESH MATERIALIZED VIEW db.mvn").collect()[0].mode == "incremental"
    assert _rows(lake, "SELECT * FROM db.mvn") == _recompute(lake, defn)


def test_time_bucket_rollup_mv_incremental(lake):
    """The continuous-aggregate shape: GROUP BY a deterministic
    expression key (hourly date_trunc bucket) maintains incrementally —
    an expression key is functional per row, so the signed delta fold is
    exactly as valid as for a plain column."""
    lake.sql(
        "CREATE TABLE polaris.db.evts (ts TIMESTAMP, kind STRING, v INT) USING ICEBERG"
    )
    lake.sql(
        "INSERT INTO db.evts VALUES"
        " (TIMESTAMP '2025-01-01 10:05:00', 'click', 1),"
        " (TIMESTAMP '2025-01-01 10:55:00', 'click', 2),"
        " (TIMESTAMP '2025-01-01 11:10:00', 'view', 3)"
    )
    defn = (
        "SELECT date_trunc('hour', ts) AS bucket, kind, COUNT(*) AS n, "
        "SUM(v) AS total FROM db.evts GROUP BY date_trunc('hour', ts), kind"
    )
    lake.sql(f"CREATE MATERIALIZED VIEW db.hourly AS {defn}")
    assert lake.sql("SHOW MATERIALIZED VIEWS").collect()[0].incremental is True
    assert _rows(lake, "SELECT * FROM db.hourly") == _recompute(lake, defn)
    lake.sql(
        "INSERT INTO db.evts VALUES"
        " (TIMESTAMP '2025-01-01 11:30:00', 'click', 10),"
        " (TIMESTAMP '2025-01-01 12:01:00', 'view', 20)"
    )
    lake.sql("DELETE FROM db.evts WHERE v = 2")
    r = lake.sql("REFRESH MATERIALIZED VIEW db.hourly").collect()[0]
    assert r.mode == "incremental"
    assert _rows(lake, "SELECT * FROM db.hourly") == _recompute(lake, defn)


def test_foreign_sum_mv_incremental_through_deletes_and_upserts(lake, spark, tmp_path):
    """SUM/COUNT foreign MVs now fold DELETE-carrying windows from the
    open-metadata changelog: a positional delete and a Flink-style
    upsert commit (equality delete + data in one snapshot) both refresh
    INCREMENTALLY; only MIN/MAX views gate to full on deletes."""
    from minio_iceberg_polaris_lakehouse_spark.sources.iceberg_writer import (
        delete_iceberg_table_where,
        upsert_iceberg_table,
    )
    from minio_iceberg_polaris_lakehouse_spark.warehouse import Warehouse

    src_wh = Warehouse(spark, str(tmp_path / "src2"))
    t = src_wh.create_table("db", "ft2", "id int, k string, x int")
    t.set_identifier_fields("id")
    t.insert_values([(1, "a", 1), (2, "a", 5), (3, "b", 2)])
    lake.sql(
        "CALL polaris.system.register_table(table => 'ext.ft2', "
        f"metadata_file => '{t.path}')"
    )
    defn = "SELECT k, SUM(x) AS sx, COUNT(*) AS n FROM ext.ft2 GROUP BY k"
    lake.sql(f"CREATE MATERIALIZED VIEW db.fmv2 AS {defn}")
    assert _rows(lake, "SELECT * FROM db.fmv2") == _recompute(lake, defn)

    # foreign positional DELETE: signed fold, still incremental
    delete_iceberg_table_where(spark, t.path, "id = 2")
    r = lake.sql("REFRESH MATERIALIZED VIEW db.fmv2").collect()[0]
    assert r.mode == "incremental"
    assert _rows(lake, "SELECT * FROM db.fmv2") == _recompute(lake, defn)

    # foreign UPSERT (eq delete + data, one snapshot): key 3 moves group
    # b -> a with a new value, key 4 is new — one incremental fold
    upsert_iceberg_table(
        spark,
        t.path,
        spark.createDataFrame([(3, "a", 30), (4, "b", 4)], "id int, k string, x int"),
    )
    r = lake.sql("REFRESH MATERIALIZED VIEW db.fmv2").collect()[0]
    assert r.mode == "incremental"
    got = _rows(lake, "SELECT * FROM db.fmv2")
    assert got == _recompute(lake, defn)
    assert ("a", 31, 2) in got and ("b", 4, 1) in got  # group move applied


def test_continuous_aggregate_loop_over_streaming_commits(lake, spark):
    """The continuous-aggregate composition: a stream of micro-batch
    commits (exactly-once TableSink) interleaved with incremental MV
    refreshes — after every trigger the MV equals a fresh recompute and
    the refresh mode stays 'incremental' (never a base rescan)."""
    from minio_iceberg_polaris_lakehouse_spark.streaming.table_sink import TableSink

    lake.sql(
        "CREATE TABLE polaris.db.clicks (user_id INT, n INT) USING ICEBERG"
    )
    lake.sql("INSERT INTO db.clicks VALUES (1, 1), (2, 1)")
    defn = "SELECT user_id, SUM(n) AS total, COUNT(*) AS hits FROM db.clicks GROUP BY user_id"
    lake.sql(f"CREATE MATERIALIZED VIEW db.click_agg AS {defn}")
    sink = TableSink(lake.wh.table("db", "clicks"), "clickstream")
    for batch_id, rows in enumerate(
        [[(1, 2), (3, 1)], [(2, 5)], [(3, 1), (3, 1), (1, 1)]]
    ):
        sink.write_batch(spark.createDataFrame(rows, "user_id int, n int"), batch_id)
        r = lake.sql("REFRESH MATERIALIZED VIEW db.click_agg").collect()[0]
        assert r.mode == "incremental"
        assert _rows(lake, "SELECT * FROM db.click_agg") == _recompute(lake, defn)
    # replayed batch: sink dedups, refresh is a noop
    sink.write_batch(spark.createDataFrame([(2, 5)], "user_id int, n int"), 1)
    assert lake.sql("REFRESH MATERIALIZED VIEW db.click_agg").collect()[0].mode == "noop"


def test_unexpected_delta_error_raises_not_downgrades(lake, monkeypatch):
    """The r7 postmortem fix: REFRESH downgrades to full recompute ONLY
    on the typed recoverable causes (expired snapshot, MIN/MAX delete
    window, schema drift). An unexpected exception in the delta path is
    a bug and must PROPAGATE — a blanket catch would mask it forever
    behind the always-correct fallback (and hash-fail goldens that pin
    mode='incremental')."""
    import minio_iceberg_polaris_lakehouse_spark.matview as MV

    _mk_sales(lake)
    lake.sql(f"CREATE MATERIALIZED VIEW db.mv AS {MV_DEF}")
    lake.sql("INSERT INTO db.sales VALUES ('eu', 1.00, 1)")

    def boom(*a, **k):
        raise RuntimeError("injected delta bug")

    monkeypatch.setattr(MV, "apply_delta", boom)
    with pytest.raises(RuntimeError, match="injected delta bug"):
        lake.sql("REFRESH MATERIALIZED VIEW db.mv")


def test_downgrade_reason_recorded_in_result_row(lake):
    """A legitimate downgrade carries its cause in the result row's
    downgrade_reason column; clean refreshes leave it NULL."""
    _mk_sales(lake)
    lake.sql(f"CREATE MATERIALIZED VIEW db.mv AS {MV_DEF}")
    lake.sql("INSERT INTO db.sales VALUES ('eu', 1.00, 1)")
    r = lake.sql("REFRESH MATERIALIZED VIEW db.mv").collect()[0]
    assert r.mode == "incremental" and r.downgrade_reason is None
    # expire the synced snapshot: typed SnapshotNotFoundError downgrade
    lake.sql("INSERT INTO db.sales VALUES ('ap', 3.00, 2)")
    lake.sql("CALL polaris.system.expire_snapshots(table => 'db.sales', retain_last => 1)")
    r = lake.sql("REFRESH MATERIALIZED VIEW db.mv").collect()[0]
    assert r.mode == "full"
    assert "SnapshotNotFoundError" in r.downgrade_reason
    # MIN/MAX delete-in-window: typed NotIncrementallyMaintainable
    lake.sql("CREATE TABLE polaris.db.mm2 (k STRING, x INT) USING ICEBERG")
    lake.sql("INSERT INTO db.mm2 VALUES ('a', 5), ('a', 9)")
    lake.sql("CREATE MATERIALIZED VIEW db.mvm2 AS SELECT k, MAX(x) AS hi FROM db.mm2 GROUP BY k")
    lake.sql("DELETE FROM db.mm2 WHERE x = 9")
    r = lake.sql("REFRESH MATERIALIZED VIEW db.mvm2").collect()[0]
    assert r.mode == "full"
    assert "NotIncrementallyMaintainable" in r.downgrade_reason
