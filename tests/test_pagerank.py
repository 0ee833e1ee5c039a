"""PageRank: independent pure-Python replay parity, dangling/teleport
semantics, partitioning-independence, and plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from minio_iceberg_polaris_lakehouse_spark.operators.pagerank import (
    DAMPING,
    _SCALE,
    ml_pagerank_trade,
    pagerank,
)


def _reference_pagerank(nodes, edges, n_iter):
    """Pure-Python replay of the documented semantics (rounding included)."""
    n = float(len(nodes))
    outw = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0.0) + float(w)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(n_iter):
        contrib = {}
        for s, d, w in edges:
            term = round(r[s] * w / outw[s], _SCALE)
            contrib[d] = contrib.get(d, 0.0) + term
        r = {v: round(0.15 / n + DAMPING * contrib.get(v, 0.0), _SCALE) for v in nodes}
    return r


GRAPH = [
    # a hub (h) everyone links to, a spoke chain, one dangling node (x)
    ("a", "h", 3),
    ("b", "h", 1),
    ("c", "h", 2),
    ("h", "a", 1),
    ("a", "b", 1),
    ("b", "c", 4),
]
NODES = ["a", "b", "c", "h", "x"]


def test_matches_pure_python_replay(spark):
    nodes = spark.createDataFrame([(v,) for v in NODES], "node string")
    edges = spark.createDataFrame(GRAPH, "src string, dst string, w long")
    got = {r.node: r.r for r in pagerank(nodes, edges, 3).collect()}
    want = _reference_pagerank(NODES, GRAPH, 3)
    assert got == want  # exact — both sides replay identical arithmetic
    # the hub must outrank everything; the dangling no-inbound node sits
    # at the teleport floor
    assert got["h"] == max(got.values())
    assert got["x"] == round(0.15 / len(NODES), _SCALE)
    assert all(r >= 0.15 / len(NODES) for r in got.values())


def test_partitioning_independent(spark):
    nodes = spark.createDataFrame([(v,) for v in NODES], "node string")
    edges = spark.createDataFrame(GRAPH, "src string, dst string, w long")
    one = {r.node: r.r for r in pagerank(nodes, edges, 3).collect()}
    many = {
        r.node: r.r
        for r in pagerank(nodes.repartition(7), edges.repartition(5), 3).collect()
    }
    assert one == many


def test_trade_query_shape(spark, sf_dir):
    df = ml_pagerank_trade(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "partial_sum" in plan.lower() or "partial" in plan.lower()
    rows = df.collect()
    assert len(rows) == 25  # every nation, dangling included
    assert rows[0].pagerank == max(r.pagerank for r in rows)
    # ranks are a (leaky) distribution: teleport floor holds, total <= 1
    assert all(r.pagerank >= 0.15 / 25 for r in rows)
    assert sum(r.pagerank for r in rows) <= 1.0 + 1e-9
