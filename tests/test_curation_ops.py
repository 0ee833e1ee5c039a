"""PII scrubbing and cross-corpus decontamination: redaction
completeness, injection arithmetic, and the semi/anti-join consistency
of the train-vs-held-out dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from minio_iceberg_polaris_lakehouse_spark.functions.text import (
    PII_EMAIL,
    PII_IP,
    PII_PHONE,
    pii_scrub,
)
from minio_iceberg_polaris_lakehouse_spark.registry import all_queries

QUERIES = all_queries()


def test_pii_scrub_redacts_all_three_kinds(spark):
    rows = [
        ("mail me at jo.doe+x@sub.example.org thanks",),
        ("call 555-123-4567 or visit 192.168.0.1 today",),
        ("clean text with no pii at all",),
        ("a@b.io 10.0.0.255 111-222-3333",),
    ]
    df = spark.createDataFrame(rows, "t string").select(pii_scrub(F.col("t")).alias("c"))
    got = [r.c for r in df.collect()]
    assert got[0] == "mail me at <EMAIL> thanks"
    assert got[1] == "call <PHONE> or visit <IP> today"
    assert got[2] == "clean text with no pii at all"
    assert got[3] == "<EMAIL> <IP> <PHONE>"
    # nothing PII-shaped survives
    resid = spark.createDataFrame([(g,) for g in got], "c string").filter(
        F.col("c").rlike(PII_EMAIL) | F.col("c").rlike(PII_PHONE) | F.col("c").rlike(PII_IP)
    )
    assert resid.count() == 0


def test_pii_scrub_query_reports_zero_residual(spark, sf_dir):
    rows = QUERIES["text_pii_scrub"].spark(spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r.residual_pii == 0 for r in rows)
    assert sum(r.emails_redacted for r in rows) > 0
    assert sum(r.chars_removed for r in rows) > 0


def test_cross_corpus_counts_are_consistent(spark, sf_dir):
    r = QUERIES["dedup_cross_corpus"].spark(spark, sf_dir).collect()[0]
    assert r.n_train == r.n_dropped + r.n_kept
    assert r.n_train > 0 and r.kept_chars > 0
    # dropped docs really do have a fingerprint twin outside src0
    from minio_iceberg_polaris_lakehouse_spark.operators.dedup import tokens_expr
    from minio_iceberg_polaris_lakehouse_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    fp = F.sha2(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens_expr()))), 256)
    fps = d.select("source", fp.alias("fp"))
    twins = (
        fps.filter(F.col("source") == "src0")
        .join(fps.filter(F.col("source") != "src0").select("fp").distinct(), "fp", "inner")
        .count()
    )
    assert twins == r.n_dropped
