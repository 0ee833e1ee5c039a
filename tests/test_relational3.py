"""Bounds for the approximate-sketch operators: rel_approx_sketches now
emits its error-bound contract in-plan (value-checked by the driver
oracle); these tests independently recompute the bounds with raw sketch
calls so a bound loosened by accident in the query would still be
caught."""

from __future__ import annotations

from pyspark.sql import functions as F

from minio_iceberg_polaris_lakehouse_spark.registry import all_queries
from minio_iceberg_polaris_lakehouse_spark.sources.tables import load_table

QUERIES = all_queries()


def test_approx_sketches_bounds_hold(spark, sf_dir):
    row = QUERIES["rel_approx_sketches"].spark(spark, sf_dir).collect()[0]
    o = load_table(spark, sf_dir, "orders")
    assert row.exact_customers == o.select("o_custkey").distinct().count()
    assert row.hll_within_3rsd is True
    assert row.median_within_rank_band is True
    assert row.p99_within_rank_band is True


def test_raw_sketches_near_exact(spark, sf_dir):
    """The underlying sketches themselves (not just the in-plan booleans):
    HLL and both approx percentiles within 5% relative error of exact."""
    o = load_table(spark, sf_dir, "orders")
    row = o.agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("ac"),
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("am"),
        F.percentile_approx("o_totalprice", 0.99, 10000).alias("a99"),
        F.count_distinct("o_custkey").alias("ec"),
        F.expr("percentile(o_totalprice, 0.5)").alias("em"),
        F.expr("percentile(o_totalprice, 0.99)").alias("e99"),
    ).collect()[0]
    assert abs(row.ac - row.ec) / row.ec < 0.05
    assert abs(row.am - row.em) / row.em < 0.05
    assert abs(row.a99 - row.e99) / row.e99 < 0.05
