"""Mixture sampling: rate arithmetic, budget adherence, reproducibility,
and the broadcast plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from minio_iceberg_polaris_lakehouse_spark.functions.mixing import (
    _HASH,
    mixture_sample,
    source_rates,
)
from minio_iceberg_polaris_lakehouse_spark.registry import all_queries
from minio_iceberg_polaris_lakehouse_spark.sources.tables import load_table

QUERIES = all_queries()


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")


def test_rates_match_python_arithmetic(spark, sf_dir):
    d = _docs(spark, sf_dir)
    per = {
        r.source: r.chars
        for r in d.groupBy("source").agg(F.sum("n_chars").alias("chars")).collect()
    }
    weights = {s: ord(s[0]) % 3 + 1 for s in per}
    total, sumw = sum(per.values()), sum(weights.values())
    budget = (3 * total) // 10
    rows = {r.source: r for r in source_rates(d).collect()}
    assert rows.keys() == per.keys()
    for s, r in rows.items():
        assert r.weight == weights[s] and r.chars == per[s]
        assert r.permille == min(1000, (weights[s] * budget * 1000) // (sumw * per[s]))


def test_cut_is_reproducible_and_rate_accurate(spark, sf_dir):
    d = _docs(spark, sf_dir)
    a = sorted(r.doc_id for r in mixture_sample(d).collect())
    b = sorted(r.doc_id for r in mixture_sample(d.repartition(13)).collect())
    assert a == b  # partitioning-independent — a pure function of doc_id
    # achieved doc share per source tracks permille within binomial noise
    rates = {r.source: r.permille for r in source_rates(d).collect()}
    n_tot = {r.source: r.n for r in d.groupBy("source").agg(F.count("*").alias("n")).collect()}
    kept = {
        r.source: r.n
        for r in mixture_sample(d).groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for s, p in rates.items():
        if p == 1000:
            assert kept.get(s, 0) == n_tot[s]  # small sources fully kept
        else:
            assert abs(kept.get(s, 0) / n_tot[s] - p / 1000) < 0.2


def test_hash_decorrelates_from_id_order():
    """The multiplicative hash must not keep a contiguous doc_id prefix
    (doc_id % 1000 would): the kept set under permille 100 is spread
    across the id range."""
    kept = [i for i in range(10_000) if ((i % 131071) * _HASH) % 1000 < 100]
    assert 800 < len(kept) < 1200
    assert max(kept) > 9000 and min(kept) < 1000
    # no long runs of consecutive ids
    runs = max(
        len(list(range(a, b)))
        for a, b in zip(kept, kept[1:])
    ) if len(kept) > 1 else 0
    assert runs < 100


def test_rate_join_is_broadcast(spark, sf_dir):
    plan = mixture_sample(_docs(spark, sf_dir))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_registered_query_schema(spark, sf_dir):
    out = QUERIES["text_mixture_sample"].spark(spark, sf_dir)
    assert out.columns == ["source", "permille", "n_docs", "kept_chars"]
    rows = out.collect()
    assert len(rows) > 0
    assert all(r.n_docs > 0 for r in rows)


def test_all_empty_source_gets_full_rate(spark):
    """A source whose docs are all zero-char must sample at permille
    1000, not divide by zero."""
    rows = [(1, "s_empty", 0), (2, "s_empty", 0), (3, "t_big", 500), (4, "t_big", 500)]
    d = spark.createDataFrame(rows, "doc_id bigint, source string, n_chars bigint")
    rates = {r.source: r.permille for r in source_rates(d).collect()}
    assert rates["s_empty"] == 1000
    kept = mixture_sample(d)
    assert kept.filter(kept.source == "s_empty").count() == 2
