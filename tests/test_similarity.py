"""ANN quality tests: the LSH-bucketed search must reach usable recall
against the brute-force baseline, and the centroid aggregation must match
a driver-side numpy computation."""

from __future__ import annotations

import numpy as np

from minio_iceberg_polaris_lakehouse_spark.registry import all_queries
from minio_iceberg_polaris_lakehouse_spark.sources.tables import load_table

QUERIES = all_queries()


def test_ann_lsh_recall_vs_brute_force(spark, sf_dir):
    brute = QUERIES["sim_topk_bruteforce"].spark(spark, sf_dir).collect()
    ann = QUERIES["sim_ann_lsh_topk"].spark(spark, sf_dir).collect()
    truth = {}
    for r in brute:
        truth.setdefault(r.q_id, set()).add(r.neighbor_id)
    got = {}
    for r in ann:
        got.setdefault(r.q_id, set()).add(r.neighbor_id)
    # single-table LSH (12 hyperplanes) trades recall for a 2^12 search
    # space cut; on 64-dim synthetic data ≥0.2 mean top-10 recall is the
    # sanity floor (multi-table LSH is the production knob)
    recalls = [len(truth[q] & got.get(q, set())) / len(truth[q]) for q in truth]
    assert sum(recalls) / len(recalls) >= 0.2, recalls


def test_ann_results_are_true_neighbors(spark, sf_dir):
    """Every ANN hit must carry the correct exact cosine (rescoring is
    exact even when candidate generation is approximate)."""
    ann = QUERIES["sim_ann_lsh_topk"].spark(spark, sf_dir).collect()
    emb = {r.vec_id: np.asarray(r.embedding, dtype="float64")
           for r in load_table(spark, sf_dir, "embeddings").collect()}
    for r in ann[:50]:
        a, b = emb[r.q_id], emb[r.neighbor_id]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(cos - r.cosine) < 1e-5


def test_ann_lsh_recall_gate_query(spark, sf_dir):
    rows = QUERIES["sim_ann_lsh"].spark(spark, sf_dir).collect()
    assert len(rows) == 1 and rows[0].recall_ok is True


def test_label_centroid_norm_matches_numpy(spark, sf_dir):
    rows = load_table(spark, sf_dir, "embeddings").collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(np.asarray(r.embedding, dtype="float64"))
    got = {r.label: r.centroid_norm for r in QUERIES["sim_label_centroids"].spark(spark, sf_dir).collect()}
    for label, vecs in by_label.items():
        want = float(np.linalg.norm(np.mean(np.stack(vecs), axis=0)))
        assert abs(got[label] - want) < 1e-5, label


def test_ann_ivf_recall_vs_brute_force(spark, sf_dir):
    brute = QUERIES["sim_topk_bruteforce"].spark(spark, sf_dir).collect()
    ann = QUERIES["sim_ann_ivf_topk"].spark(spark, sf_dir).collect()
    truth, got = {}, {}
    for r in brute:
        truth.setdefault(r.q_id, set()).add(r.neighbor_id)
    for r in ann:
        got.setdefault(r.q_id, set()).add(r.neighbor_id)
    # probing 4 of 16 sampled-centroid cells reads ~25% of the corpus;
    # ≥0.25 mean top-10 recall is the sanity floor (measured ~0.41 at
    # sf0.01; more probes / Lloyd-refined centroids are the knobs)
    recalls = [len(truth[q] & got.get(q, set())) / len(truth[q]) for q in truth]
    assert sum(recalls) / len(recalls) >= 0.25, recalls


def test_ann_ivf_recall_gate_query(spark, sf_dir):
    """The driver-gated sim_ann_ivf entry: one row, in-plan recall bound
    satisfied."""
    rows = QUERIES["sim_ann_ivf"].spark(spark, sf_dir).collect()
    assert len(rows) == 1
    assert rows[0].n_queries == 8 and rows[0].k == 10
    assert rows[0].recall_ok is True


def test_ann_ivf_hits_carry_exact_cosine(spark, sf_dir):
    ann = QUERIES["sim_ann_ivf_topk"].spark(spark, sf_dir).collect()
    emb = {r.vec_id: np.asarray(r.embedding, dtype="float64")
           for r in load_table(spark, sf_dir, "embeddings").collect()}
    for r in ann[:50]:
        a, b = emb[r.q_id], emb[r.neighbor_id]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(cos - r.cosine) < 1e-5


def test_ann_int8_recall_vs_brute_force(spark, sf_dir):
    from minio_iceberg_polaris_lakehouse_spark.operators.similarity import (
        INT8_RECALL_BOUND,
        N_QUERIES,
        TOP_K,
        _int8_topk,
        sim_topk_bruteforce,
    )

    ann = _int8_topk(spark, sf_dir).select("q_id", "neighbor_id")
    exact = sim_topk_bruteforce(spark, sf_dir).select("q_id", "neighbor_id")
    hits = ann.join(exact, ["q_id", "neighbor_id"]).count()
    recall = hits / (N_QUERIES * TOP_K)
    assert recall >= INT8_RECALL_BOUND
    # the exact rescore means reported cosines ARE the true cosines
    got = {
        (r.q_id, r.neighbor_id): r.cosine
        for r in _int8_topk(spark, sf_dir).collect()
    }
    truth = {
        (r.q_id, r.neighbor_id): r.cosine
        for r in sim_topk_bruteforce(spark, sf_dir).collect()
    }
    for key, cos in got.items():
        if key in truth:
            assert abs(cos - truth[key]) < 1e-9


def test_ann_int8_quantization_is_bounded(spark, sf_dir):
    # every quantized component must live in [-127, 127] — overflow or a
    # broken scale would silently corrupt the integer dot product
    from pyspark.sql import functions as F

    from minio_iceberg_polaris_lakehouse_spark.operators.similarity import as_double
    from minio_iceberg_polaris_lakehouse_spark.sources.tables import load_table

    v = load_table(spark, sf_dir, "embeddings").select(as_double("embedding").alias("e"))
    scale = v.agg((F.lit(127.0) / F.max(F.array_max(F.transform("e", F.abs)))).alias("scale"))
    q = v.crossJoin(F.broadcast(scale)).select(
        F.array_max(
            F.transform("e", lambda x: F.abs(F.round(x * F.col("scale"))))
        ).alias("mx")
    )
    assert q.agg(F.max("mx")).collect()[0][0] <= 127.0
