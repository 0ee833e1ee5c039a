"""Regression pins for the round-8 verdict findings: the MV downgrade
trigger is now an EXPLICIT schema-drift probe (not a blanket
AnalysisException catch), the MV goldens fail loud instead of silently
hashing a downgraded mode, and the driver-red goldens write in-driver
telemetry to DIAG_GOLDENS.jsonl."""

from __future__ import annotations

import json

import pytest

from minio_iceberg_polaris_lakehouse_spark import diag, matview as MV
from minio_iceberg_polaris_lakehouse_spark.sql_frontend import LakehouseSQL


@pytest.fixture()
def lake(spark, tmp_path):
    return LakehouseSQL(spark, str(tmp_path / "wh"))


def test_probe_binds_raises_typed_on_drift(spark):
    df = spark.createDataFrame([(1, "a")], "id int, region string")
    ok = MV.MatviewSpec(
        table_text="t", where=None, group_cols=["region"],
        group_aliases=["region"], aggs=[("count_star", "*", "n")],
    )
    MV.probe_binds(df, ok)  # binds: no raise
    drifted = MV.MatviewSpec(
        table_text="t", where=None, group_cols=["gone_col"],
        group_aliases=["gone_col"], aggs=[("sum", "amount", "total")],
    )
    with pytest.raises(MV.NotIncrementallyMaintainable, match="no longer binds"):
        MV.probe_binds(df, drifted)


def test_probe_binds_join_checks_on_and_where(spark):
    ldf = spark.createDataFrame([(1, 2.0)], "cust_id int, amount double")
    rdf = spark.createDataFrame([(1, "g")], "cust_id int, segment string")
    spec = MV.parse_incremental_join(
        "SELECT c.segment, SUM(o.amount) AS total, COUNT(*) AS n "
        "FROM db.o o JOIN db.c c ON o.cust_id = c.cust_id GROUP BY c.segment"
    )
    assert spec is not None
    MV.probe_binds_join(ldf, rdf, spec)  # binds: no raise
    with pytest.raises(MV.NotIncrementallyMaintainable, match="no longer binds"):
        MV.probe_binds_join(ldf.drop("amount"), rdf, spec)
    with pytest.raises(MV.NotIncrementallyMaintainable, match="no longer binds"):
        MV.probe_binds_join(ldf, rdf.drop("cust_id"), spec)


def test_refresh_downgrades_only_on_drift_not_other_analysis_errors(lake):
    """Schema drift on the base still downgrades (recorded reason), and
    the refresh result stays correct via the full recompute."""
    lake.sql("CREATE TABLE polaris.db.dr (region STRING, amount DECIMAL(10,2)) USING ICEBERG")
    lake.sql("INSERT INTO db.dr VALUES ('eu', 1.00), ('us', 2.00)")
    lake.sql(
        "CREATE MATERIALIZED VIEW db.dr_mv AS "
        "SELECT region, SUM(amount) AS total FROM db.dr GROUP BY region"
    )
    lake.sql("INSERT INTO db.dr VALUES ('eu', 3.00)")
    # drift: drop the aggregated column via replace-shaped evolution
    lake.sql("ALTER TABLE db.dr RENAME COLUMN amount TO amt")
    row = lake.sql("REFRESH MATERIALIZED VIEW db.dr_mv").collect()[0]
    assert row.mode == "full"
    assert "no longer binds" in (row.downgrade_reason or "")


def test_mv_golden_fail_loud_on_downgrade(spark, tmp_path, monkeypatch):
    """A REFRESH that does not run 'incremental' raises with the named
    cause (driver records err) instead of hashing a silent wrong mode;
    the telemetry line lands in DIAG_GOLDENS.jsonl either way."""
    from pyspark.sql import Row

    from minio_iceberg_polaris_lakehouse_spark.operators import reference_golden as RG

    diag_file = tmp_path / "DIAG.jsonl"
    monkeypatch.setattr(diag, "DIAG_PATH", diag_file)

    class FakeResult:
        def collect(self):
            return [
                Row(
                    view="db.mv", mode="full", synced_snapshot=7,
                    downgrade_reason="SnapshotNotFoundError: expired",
                )
            ]

    class FakeLake:
        def sql(self, stmt):
            return FakeResult()

    with pytest.raises(RuntimeError, match="mode='full'.*expired"):
        RG._refresh_checked(FakeLake(), spark, "ref_matview_incremental", "REFRESH")
    line = json.loads(diag_file.read_text().splitlines()[-1])
    assert line["name"] == "ref_matview_incremental"
    assert line["payload"]["refresh"]["mode"] == "full"
    assert line["confs"]["spark.master"].startswith("local")
    assert line["invocation"] >= 1


def test_diag_record_never_raises(spark, tmp_path, monkeypatch):
    # unwritable path: record must swallow the failure
    monkeypatch.setattr(diag, "DIAG_PATH", tmp_path / "no_dir" / "x" / "d.jsonl")
    diag.record("x", spark, {"k": object()})  # unserializable payload too


def test_bench_summary_fits_driver_tail_window():
    """The driver keeps only the last 2000 bytes of stdout; three rounds
    of perf record were lost to a final JSON line that outgrew it. The
    compact summary must fit with margin even with the sf1 section and
    worst-case query timings present."""
    import bench

    result = {
        "metric": "headline_queries_total_runtime",
        "value": 123.456789,
        "unit": "sec",
        "sf": 0.1,
        "queries": {name: 12345.6789 for name in bench.HEADLINE},
        "extended": {name: 1.0 for name in bench.EXTENDED},
        "stddev": {name: 0.123456 for name in bench.HEADLINE},
        "iters": 5,
        "probe_degraded": False,
        "load_contaminated": False,
        "cpu_probe_s": 0.987654,
        "sf1_scale_check": {
            "total": 9999.123,
            "worst_query_scaling": {
                "query": "rel_q9_profit_by_nation_year", "ratio": 3.56,
            },
        },
    }
    line = __import__("json").dumps(bench._summarize(result), separators=(",", ":"))
    assert len(line.encode()) <= bench.SUMMARY_BUDGET_B
    # and the summary still satisfies the driver contract fields
    parsed = __import__("json").loads(line)
    for k in ("metric", "value", "unit", "queries", "sf"):
        assert k in parsed
    assert parsed["sf1_total"] == 9999.12
