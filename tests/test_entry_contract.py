"""Smoke checks of the driver contract in __spark_entry__.py."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"nation", "revenue", "n_items"}


def test_queries_and_oracles_consistent():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 40
    assert set(oracles).issubset(set(qs))
    for name, sql in oracles.items():
        # FROM-first and the PIVOT statement are valid DuckDB (the
        # rel_from_first / rel_pivot_statement identical-text goldens)
        assert isinstance(sql, str) and sql.strip().upper().startswith(
            ("SELECT", "WITH", "FROM", "PIVOT")
        ), name


def test_each_query_callable(spark, sf_dir):
    qs = entrymod.queries()
    df = qs["rel_topk_orders"](spark, sf_dir)
    assert df.count() == 10
