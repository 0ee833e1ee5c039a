"""Bloom-filter decontamination: exactness (no false negatives — the
Bloom path must equal the naive join bit-for-bit), mechanical thinning
(the prefilter really rejects shingles), and plan shape (broadcast
confirm join, no cartesian)."""

from __future__ import annotations

from pyspark.sql import functions as F

from minio_iceberg_polaris_lakehouse_spark.functions.bloom import (
    K_HASHES,
    M_BITS,
    bloom_contains,
    build_bloom_bits,
    decontaminate,
)


def test_bloom_equals_naive_join(spark, sf_dir):
    got = [tuple(r) for r in decontaminate(spark, sf_dir, use_bloom=True).collect()]
    want = [tuple(r) for r in decontaminate(spark, sf_dir, use_bloom=False).collect()]
    assert got == want
    assert len(got) > 0


def test_bloom_no_false_negatives_and_thinning(spark):
    # Members 0..999 inserted; probe a disjoint range — every member must
    # test positive (no false negatives), and the false-positive rate on
    # 10k non-members must be far below 1 (the filter actually thins).
    members = spark.range(1000).select(F.xxhash64("id").alias("s"))
    bits = F.lit(build_bloom_bits(members)).cast("array<long>")
    member_hits = members.select(bloom_contains(bits, F.col("s")).alias("p")).agg(
        F.sum(F.col("p").cast("int")).alias("n")
    ).collect()[0]["n"]
    assert member_hits == 1000
    non = spark.range(100_000, 110_000).select(F.xxhash64("id").alias("s"))
    fp = non.select(bloom_contains(bits, F.col("s")).alias("p")).agg(
        F.sum(F.col("p").cast("int")).alias("n")
    ).collect()[0]["n"]
    # 1000 keys in 2^20 bits with k=4 → theoretical fp ~ (k*n/m)^k ≈ 2e-10;
    # allow enormous slack while still proving real rejection.
    assert fp < 100


def test_bloom_positions_in_range(spark):
    df = spark.range(5000).select(F.xxhash64("id").alias("s"))
    from minio_iceberg_polaris_lakehouse_spark.functions.bloom import _positions

    pos = df.select(F.explode(F.array(*_positions(F.col("s")))).alias("p"))
    row = pos.agg(F.min("p").alias("lo"), F.max("p").alias("hi")).collect()[0]
    assert 0 <= row["lo"] and row["hi"] < M_BITS
    assert K_HASHES >= 2


def test_bloom_plan_no_cartesian_broadcast_confirm(spark, sf_dir):
    df = decontaminate(spark, sf_dir, use_bloom=True)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
