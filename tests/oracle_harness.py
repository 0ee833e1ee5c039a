"""Local replica of the driver's correctness gate: run each registered
Spark query and its DuckDB oracle on the same parquet tables, compare
row count, column names, and order-insensitive values exactly."""

from __future__ import annotations

import decimal
import math
from typing import Any

import duckdb

from minio_iceberg_polaris_lakehouse_spark.sources.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v: Any) -> Any:
    """Normalize a cell for cross-engine comparison."""
    if isinstance(v, decimal.Decimal):
        # Canonicalize to float: the driver's hasher renders decimals
        # differently per engine (DuckDB→pandas float64 prints '16.5',
        # Spark Decimal prints '16.50'), so Decimal must never reach a
        # compared output anyway — compare() red-flags it (the r7-r9
        # ref_matview_* three-round blind spot: keeping Decimal as
        # Decimal on both sides made the replica structurally unable to
        # reproduce the driver's hash mismatch).
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):  # date/datetime
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, bool):
        return bool(v)
    return v


def normalize_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, normalize cells, sort rows — the driver's
    order-insensitive value comparison."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda r: tuple((x is None, str(x)) for x in r))


def compare(spark, con, spark_fn, oracle: str, sf_dir: str, require_rows: bool = False) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass).
    ``require_rows`` guards against vacuous empty-vs-empty passes: queries
    whose literals must select real corpus rows fail if they return none."""
    problems: list[str] = []
    sdf = spark_fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    # A DECIMAL-typed compared column is a driver hash hazard even when
    # every value matches (the driver renders DuckDB decimals as pandas
    # float64 and Spark decimals as Decimal — '16.5' vs '16.50'). This
    # replica compares in normalized float space, so it WOULD pass where
    # the driver fails; flag the schema itself instead.
    from pyspark.sql.types import DecimalType

    dec_cols = [f.name for f in sdf.schema.fields if isinstance(f.dataType, DecimalType)]
    if dec_cols:
        problems.append(
            f"DECIMAL-typed output column(s) {dec_cols}: the driver's hasher "
            "renders decimals differently per engine — CAST the final "
            "projection to DOUBLE/BIGINT on both sides"
        )
    s_rows = [tuple(r) for r in sdf.collect()]
    if require_rows:
        empty = not s_rows or (
            # single-row aggregates report emptiness as n_lines = 0
            len(s_rows) == 1
            and "n_lines" in s_cols
            and s_rows[0][s_cols.index("n_lines")] == 0
        )
        if empty:
            problems.append("vacuously empty result (literals select nothing from the corpus)")

    res = con.execute(oracle)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duck={len(d_rows)}")

    sn = normalize_rows(s_cols, s_rows)
    dn = normalize_rows(d_cols, d_rows)
    if sn != dn:
        diff_count = 0
        for i, (a, b) in enumerate(zip(sn, dn)):
            if a != b:
                if diff_count < 3:
                    problems.append(f"row {i}: spark={a!r} duck={b!r}")
                diff_count += 1
        if diff_count:
            problems.append(f"... {diff_count} differing rows of {len(sn)}")
        elif len(sn) != len(dn):
            pass  # row-count problem already recorded
    return problems
