"""Distributed Lloyd's k-means: numpy replay parity, monotone inertia,
and plan shape (broadcast assignment, partial argmin agg, no cartesian
of corpus×corpus)."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from minio_iceberg_polaris_lakehouse_spark.operators.kmeans import (
    K_CLUSTERS,
    N_ITERS,
    _assign,
    kmeans_fit,
)


def _numpy_kmeans(sf_dir: str, k: int, iters: int):
    """Independent replay: same init, 6-dp-rounded distances with cid
    tiebreak, 6-dp-rounded means."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pydict()
    ids = np.asarray(t["vec_id"])
    emb = np.asarray([np.asarray(e, dtype=np.float64) for e in t["embedding"]])
    order = np.argsort(ids)
    ids, emb = ids[order], emb[order]
    cents = {int(i): emb[ids == i][0].copy() for i in range(k)}

    def assign(cents):
        cids = sorted(cents)
        cmat = np.stack([cents[c] for c in cids])
        d = np.round(((emb[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2), 6)
        best = d.argmin(axis=1)  # argmin takes first (lowest cid) on ties
        return np.asarray([cids[b] for b in best]), d[np.arange(len(emb)), best]

    for _ in range(iters):
        lab, _ = assign(cents)
        cents = {
            int(c): np.round(emb[lab == c].mean(axis=0), 6)
            for c in np.unique(lab)
        }
    lab, dist = assign(cents)
    return lab, dist, cents


def test_kmeans_matches_numpy_replay(spark, sf_dir):
    assigned, cdf = kmeans_fit(spark, sf_dir)
    got = {r["vec_id"]: (r["cid"], r["dist"]) for r in assigned.collect()}
    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pydict()
    lab, dist, cents = _numpy_kmeans(sf_dir, K_CLUSTERS, N_ITERS)
    ids = sorted(t["vec_id"])
    for i, vid in enumerate(ids):
        assert got[vid][0] == lab[i], f"vec {vid}: {got[vid][0]} != {lab[i]}"
        assert abs(got[vid][1] - dist[i]) < 1e-6
    spark_cents = {r["cid"]: np.asarray(r["cent"]) for r in cdf.collect()}
    for c, v in cents.items():
        assert np.allclose(spark_cents[c], v, atol=2e-6)


def test_kmeans_inertia_monotone(spark, sf_dir):
    def total_inertia(iters):
        a, _ = kmeans_fit(spark, sf_dir, iters=iters)
        return a.agg(F.sum("dist").alias("s")).collect()[0]["s"]

    i0, i2 = total_inertia(0), total_inertia(N_ITERS)
    assert i2 <= i0 + 1e-6  # Lloyd's never increases the objective


def test_kmeans_plan_broadcast_no_cartesian(spark, sf_dir):
    from minio_iceberg_polaris_lakehouse_spark.operators.similarity import as_double
    from minio_iceberg_polaris_lakehouse_spark.sources.tables import load_table

    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("e")
    )
    cdf = spark.createDataFrame(
        [(0, [0.0] * 64), (1, [1.0] * 64)], "cid int, cent array<double>"
    )
    plan = _assign(v, cdf)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "Broadcast" in plan  # centroid side ships to executors
    # argmin folds map-side: partial aggregation before the exchange
    assert "partial_min" in plan or "partial" in plan.lower()
