"""Bucketed co-located joins: same-bucketed tables must join without a
shuffle, and results must match the plain join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from minio_iceberg_polaris_lakehouse_spark.plans.inspect import shuffle_count
from minio_iceberg_polaris_lakehouse_spark.sources import bucketed as B
from minio_iceberg_polaris_lakehouse_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    B.write_bucketed(l, "b_lineitem", "l_orderkey", buckets=8)
    B.write_bucketed(o, "b_orders", "l_orderkey", buckets=8)
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_colocated_join_has_no_shuffle(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    joined = B.colocated_join(spark, lt, rt, "l_orderkey")
    # no Exchange on either input: bucket i joins bucket i in-task
    assert shuffle_count(joined) == 0, joined._jdf.queryExecution().executedPlan().toString()


def test_colocated_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    got = B.colocated_join(spark, lt, rt, "l_orderkey").count()
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    want = l.join(o, l.l_orderkey == o.o_orderkey).count()
    assert got == want
