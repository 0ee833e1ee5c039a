"""Every registered query with an oracle must match DuckDB exactly at the
smoke scale factor — the same comparison the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from minio_iceberg_polaris_lakehouse_spark.registry import all_queries

from tests.oracle_harness import compare, duck_connection

QUERIES = all_queries()
ORACLE_QUERIES = sorted(n for n, q in QUERIES.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, q in QUERIES.items() if q.oracle is None)

# Queries whose literals were tuned to the corpus value domains: an empty
# result means the tuning regressed and the oracle hash would pass
# vacuously (empty == empty), so emptiness itself is a failure here.
NON_EMPTY = {
    "flagship_revenue_by_nation",
    "rel_join_anti",
    "rel_scalar_subquery",
    "dedup_embedding_cosine",
    "rel_q2_min_cost_supplier",
    "rel_q5_local_supplier_volume",
    "rel_q6_forecast_revenue",
    "rel_q7_volume_shipping",
    "rel_q8_market_share",
    "rel_q9_profit_by_nation_year",
    "rel_q16_supplier_part_counts",
    "rel_q17_small_quantity_revenue",
    "rel_q19_disjunctive_predicates",
    "rel_q21_waiting_supplier",
    "rel_q22_idle_customers",
    "text_bm25_topk",
}


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, duck, sf_dir, name):
    q = QUERIES[name]
    problems = compare(spark, duck, q.spark, q.oracle, sf_dir, require_rows=name in NON_EMPTY)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, sf_dir, name):
    q = QUERIES[name]
    df = q.spark(spark, sf_dir)
    rows = df.collect()
    assert df.columns  # stable schema
    assert rows is not None
