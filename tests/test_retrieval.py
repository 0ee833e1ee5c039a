"""BM25 retrieval + cross-document boilerplate detection
(functions/retrieval.py). Oracle parity runs in test_oracle_parity; here
we pin the properties the hash can't see: partitioning-independence,
value-domain sanity, and the plan shapes that keep the operators linear
at scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from minio_iceberg_polaris_lakehouse_spark.functions.retrieval import (
    BM25_TOP_K,
    BOILER_MIN_DOCS,
    QUERY_TERMS,
    text_bm25_topk,
    text_boilerplate_ngrams,
)
from minio_iceberg_polaris_lakehouse_spark.operators.dedup import tokens_expr
from minio_iceberg_polaris_lakehouse_spark.sources.tables import load_table


def test_bm25_scores_positive_ranked_and_capped(spark, sf_dir):
    rows = text_bm25_topk(spark, sf_dir).collect()
    assert 0 < len(rows) <= BM25_TOP_K
    assert [r.rn for r in rows] == list(range(1, len(rows) + 1))
    scores = [r.bm25 for r in rows]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)


def test_bm25_only_matching_docs_scored(spark, sf_dir):
    """Every returned doc really contains a query term (inverted-index
    contract: non-matching docs never enter the scorer)."""
    ids = [r.doc_id for r in text_bm25_topk(spark, sf_dir).collect()]
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isin(ids))
        .select("doc_id", tokens_expr().alias("t"))
        .collect()
    )
    for r in d:
        assert any(term in r.t for term in QUERY_TERMS), r.doc_id


def test_bm25_partitioning_independent(spark, sf_dir):
    """The decimal-summed score is identical under any input partitioning
    (IEEE double summation would not be)."""
    base = [tuple(r) for r in text_bm25_topk(spark, sf_dir).collect()]
    few = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        again = [tuple(r) for r in text_bm25_topk(spark, sf_dir).collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", few)
    assert base == again


def test_boilerplate_fractions_sane_and_nonvacuous(spark, sf_dir):
    rows = text_boilerplate_ngrams(spark, sf_dir).collect()
    assert rows
    assert sum(r.boiler_grams for r in rows) > 0, (
        f"no trigram recurs in >= {BOILER_MIN_DOCS} docs at this SF - "
        "threshold tuning regressed and the oracle passes vacuously"
    )
    for r in rows:
        assert 0 <= r.boiler_grams <= r.total_grams
        assert 0.0 <= r.avg_boiler_frac <= 1.0
        assert 0 <= r.docs_mostly_boiler <= r.n_docs


def test_retrieval_plans_have_no_cartesian_joins(spark, sf_dir):
    """Both operators must stay linear: the only nested-loop allowed is
    the broadcast of the one-row corpus-stats aggregate."""
    for fn in (text_bm25_topk, text_boilerplate_ngrams):
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, plan
