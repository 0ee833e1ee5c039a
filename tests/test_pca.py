"""Distributed PCA (operators/pca.py) against a single-node numpy PCA
ground truth, plus determinism and gate-margin pins."""

from __future__ import annotations

import numpy as np

from minio_iceberg_polaris_lakehouse_spark.operators.pca import (
    PCA_K,
    PCA_MIN_CAPTURE,
    fit_pca,
    sim_embedding_pca,
)
from minio_iceberg_polaris_lakehouse_spark.operators.similarity import as_double
from minio_iceberg_polaris_lakehouse_spark.sources.tables import load_table


def _numpy_pca(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", as_double("embedding").alias("e"))
        .orderBy("vec_id")
        .collect()
    )
    m = np.array([r.e for r in rows])
    mean = m.mean(axis=0)
    cov = (m - mean).T @ (m - mean) / m.shape[0]
    w, vecs = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1]
    return m, mean, w[order], vecs[:, order]


def test_components_match_single_node_pca(spark, sf_dir):
    comps, eigvals, mean, n = fit_pca(spark, sf_dir)
    m, np_mean, np_w, np_v = _numpy_pca(spark, sf_dir)
    assert n == m.shape[0]
    assert np.allclose(mean, np_mean, atol=1e-9)
    assert np.allclose(eigvals, np_w[:PCA_K], rtol=1e-6)
    for k in range(PCA_K):
        # same subspace direction, up to sign (the fit fixes sign itself)
        cos = abs(float(np.dot(comps[k], np_v[:, k])))
        assert cos > 0.9999, (k, cos)


def test_fit_deterministic_under_repartition(spark, sf_dir):
    few = spark.conf.get("spark.sql.shuffle.partitions")
    comps1, eig1, mean1, _ = fit_pca(spark, sf_dir)
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        comps2, eig2, mean2, _ = fit_pca(spark, sf_dir)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", few)
    assert np.allclose(comps1, comps2, atol=1e-9)
    assert np.allclose(eig1, eig2, atol=1e-12)


def test_projected_variance_equals_eigenvalues(spark, sf_dir):
    comps, eigvals, mean, _ = fit_pca(spark, sf_dir)
    m, _, _, _ = _numpy_pca(spark, sf_dir)
    proj = (m - np.array(mean)) @ np.array(comps).T
    assert np.allclose(proj.var(axis=0), eigvals, rtol=1e-6)


def test_gates_hold_with_margin(spark, sf_dir):
    """capture_ok must not sit at its boundary, and beats_axes_ok is the
    Schur-Horn invariant — both asserted from the actual eigenvalues."""
    _, eigvals, _, _ = fit_pca(spark, sf_dir)
    m, _, np_w, _ = _numpy_pca(spark, sf_dir)
    total = float(np_w.sum())
    capture = float(sum(eigvals)) / total
    assert capture >= PCA_MIN_CAPTURE * 1.1, capture
    axes = np.sort(m.var(axis=0))[::-1][:PCA_K].sum()
    assert sum(eigvals) >= axes - 1e-9
    row = sim_embedding_pca(spark, sf_dir).collect()[0]
    assert row.capture_ok and row.beats_axes_ok
