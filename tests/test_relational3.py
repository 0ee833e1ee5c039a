"""Bounds for the approximate-sketch operators (no oracle by design)."""

from __future__ import annotations

from pyspark.sql import functions as F

from minio_iceberg_polaris_lakehouse_spark.registry import all_queries
from minio_iceberg_polaris_lakehouse_spark.sources.tables import load_table

QUERIES = all_queries()


def test_approx_sketches_near_exact(spark, sf_dir):
    row = QUERIES["rel_approx_sketches"].spark(spark, sf_dir).collect()[0]
    o = load_table(spark, sf_dir, "orders")
    exact_customers = o.select("o_custkey").distinct().count()
    exact_median = o.agg(F.expr("percentile(o_totalprice, 0.5)")).collect()[0][0]
    assert abs(row.approx_customers - exact_customers) / exact_customers < 0.05
    assert abs(row.approx_median_price - exact_median) / exact_median < 0.05


def test_approx_p99_within_bounds(spark, sf_dir):
    """p99 sketch bound — evidence for the rows-only rel_approx_sketches
    entry: percentile_approx(0.99) must sit within 5% relative error of
    the exact percentile."""
    row = QUERIES["rel_approx_sketches"].spark(spark, sf_dir).collect()[0]
    o = load_table(spark, sf_dir, "orders")
    exact_p99 = o.agg(F.expr("percentile(o_totalprice, 0.99)")).collect()[0][0]
    assert abs(row.approx_p99_price - exact_p99) / exact_p99 < 0.05
