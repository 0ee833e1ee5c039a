"""Product-quantization ANN: recall vs the brute-force baseline,
trainer/encoder invariants, ADC table arithmetic, and the compression
accounting that motivates PQ at 100 TB."""

from __future__ import annotations

import numpy as np

from minio_iceberg_polaris_lakehouse_spark.operators.similarity import TOP_K
from minio_iceberg_polaris_lakehouse_spark.operators.similarity_pq import (
    K_CODES,
    M_SUB,
    PQ_CAND_FACTOR,
    PQ_RECALL_BOUND,
    _encode_codes,
    _pq_topk,
    _train_sample,
    train_codebook,
)
from minio_iceberg_polaris_lakehouse_spark.registry import all_queries

QUERIES = all_queries()


def test_pq_recall_vs_brute_force(spark, sf_dir):
    brute = QUERIES["sim_topk_bruteforce"].spark(spark, sf_dir).collect()
    ann = _pq_topk(spark, sf_dir).collect()
    truth, got = {}, {}
    for r in brute:
        truth.setdefault(r.q_id, set()).add(r.neighbor_id)
    for r in ann:
        got.setdefault(r.q_id, set()).add(r.neighbor_id)
    recalls = [len(truth[q] & got.get(q, set())) / len(truth[q]) for q in truth]
    assert sum(recalls) / len(recalls) >= PQ_RECALL_BOUND, recalls
    # full depth for every query
    assert all(len(v) == TOP_K for v in got.values())


def test_pq_recall_gate_query(spark, sf_dir):
    rows = QUERIES["sim_ann_pq"].spark(spark, sf_dir).collect()
    assert len(rows) == 1 and rows[0].recall_ok is True


def test_trainer_deterministic_and_full_rank():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(300, 64))
    b1, b2 = train_codebook(x), train_codebook(x)
    np.testing.assert_array_equal(b1, b2)  # fixed seed → same codebook
    assert b1.shape == (M_SUB, K_CODES, 64 // M_SUB)
    # no collapsed codebook: centroids within a subspace are distinct
    for m in range(M_SUB):
        assert len({tuple(np.round(c, 9)) for c in b1[m]}) == K_CODES


def test_trainer_repairs_empty_clusters():
    """A degenerate sample (fewer distinct points than K_CODES would
    naturally fill) still yields K_CODES usable centroids."""
    x = np.zeros((40, 64))
    x[:4] = np.arange(4)[:, None]  # only 4 distinct rows
    books = train_codebook(x)
    assert np.isfinite(books).all()
    assert books.shape == (M_SUB, K_CODES, 8)


def test_encoder_matches_numpy_argmin(spark, sf_dir):
    books = train_codebook(_train_sample(spark, sf_dir))
    from minio_iceberg_polaris_lakehouse_spark.operators.similarity import as_double
    from minio_iceberg_polaris_lakehouse_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    v = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", as_double("embedding").alias("e"))
        .limit(50)
    )
    got = {
        r.vec_id: r.codes
        for r in v.select("vec_id", _encode_codes(books)(F.col("e")).alias("codes")).collect()
    }
    sub = 64 // M_SUB
    for r in v.collect():
        x = np.array(r.e)
        expect = [
            int(((x[m * sub : (m + 1) * sub][None, :] - books[m]) ** 2).sum(axis=1).argmin())
            for m in range(M_SUB)
        ]
        assert got[r.vec_id] == expect
        assert all(0 <= c < K_CODES for c in expect)


def test_compression_accounting():
    """The point of PQ: M_SUB 4-bit-capable codes per vector versus
    EMB_DIM floats — ≥64× smaller than the float64 arrays the exact
    path scans (the broadcast codebook is ~4 KB amortized)."""
    float_bytes = 64 * 8
    code_bytes = M_SUB  # one byte per code (K_CODES=16 fits in 4 bits)
    assert float_bytes / code_bytes >= 64


def test_candidate_depth_bounded(spark, sf_dir):
    """The exact rescore touches at most PQ_CAND_FACTOR*k candidates per
    query — the O(candidates) contract that keeps rescore off the
    full-corpus path."""
    out = _pq_topk(spark, sf_dir)
    per_q = out.groupBy("q_id").count().collect()
    assert all(r["count"] <= PQ_CAND_FACTOR * TOP_K for r in per_q)
    assert all(r["count"] == TOP_K for r in per_q)  # and exactly k survive


def test_pq_persisted_index_matches_in_plan(spark, sf_dir, tmp_path):
    """build → persist (codes + codebook tables) → serve returns results
    bit-identical to the in-plan pipeline, and the at-rest codes are the
    compressed representation (M_SUB ints per vector)."""
    from minio_iceberg_polaris_lakehouse_spark.operators.similarity_pq import (
        build_pq_index,
        pq_indexed_topk,
    )

    wh = build_pq_index(spark, sf_dir, str(tmp_path / "idx"))
    codes = wh.table("ann", "pq_codes").read().collect()
    assert all(len(r.codes) == M_SUB for r in codes)
    assert all(0 <= c < K_CODES for r in codes for c in r.codes)
    book = wh.table("ann", "pq_codebook").read()
    assert book.count() == M_SUB * K_CODES
    # idempotent: a rebuild over the same root converges, not doubles
    wh2 = build_pq_index(spark, sf_dir, str(tmp_path / "idx"))
    assert wh2.table("ann", "pq_codebook").read().count() == M_SUB * K_CODES

    served = sorted(map(tuple, pq_indexed_topk(spark, sf_dir).collect()))
    inplan = sorted(map(tuple, _pq_topk(spark, sf_dir).collect()))
    assert served == inplan


def test_pq_indexed_recall_gate_query(spark, sf_dir):
    rows = QUERIES["sim_ann_pq_indexed"].spark(spark, sf_dir).collect()
    assert len(rows) == 1 and rows[0].recall_ok is True
