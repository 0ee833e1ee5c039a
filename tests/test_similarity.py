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


def test_ivf_persisted_index_partition_pruning(spark, sf_dir, tmp_path):
    """The persisted IVF index (build_ivf_index) is the literal 100 TB
    deployment of the docstring's 'write the corpus partitioned by
    cell': one parquet file per cell, a probed cell's scan touches
    EXACTLY 1/K_COARSE of the files (others are never listed), a single
    query's serve reads NPROBE/K_COARSE, and the served top-k is
    bit-identical to the in-plan variant (same quantizer formulas)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from minio_iceberg_polaris_lakehouse_spark.operators.similarity import (
        K_COARSE,
        N_QUERIES,
        NPROBE,
        _ivf_topk,
        as_double,
        build_ivf_index,
        dot,
        ivf_indexed_topk,
        norm,
    )
    from minio_iceberg_polaris_lakehouse_spark.sources.tables import load_table

    wh = build_ivf_index(spark, sf_dir, str(tmp_path / "idx"))
    idx = wh.table("ann", "ivf_index")
    total = len(idx.read().inputFiles())
    assert total == K_COARSE  # one file per cell (repartition on cell)

    # single-cell scan: exactly one file listed — manifest-level skipping
    some_cell = idx.read().select("cell").first().cell
    one = idx.scan(eq={"cell": some_cell})
    assert len(one.inputFiles()) == 1
    assert set(r.cell for r in one.select("cell").distinct().collect()) == {some_cell}

    # ONE query's serve plan: NPROBE probed cells -> NPROBE files read
    cent = wh.table("ann", "ivf_centroids").read()
    q = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select(F.col("vec_id").alias("q_id"), as_double("embedding").alias("qe"))
        .select("q_id", "qe", norm(F.col("qe")).alias("nq"))
    )
    qs = q.crossJoin(F.broadcast(cent)).select(
        "q_id", "cell",
        (dot(F.col("qe"), F.col("ce")) / (F.col("nq") * F.col("nce"))).alias("csim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("csim"), "cell")
    probed = sorted(
        r.cell
        for r in qs.select("*", F.row_number().over(w).alias("r"))
        .filter(F.col("r") <= NPROBE)
        .select("cell")
        .collect()
    )
    assert len(probed) == NPROBE
    scans = [idx.scan(eq={"cell": c}) for c in probed]
    union = scans[0]
    for s in scans[1:]:
        union = union.unionByName(s)
    assert len(union.inputFiles()) == NPROBE  # NPROBE/K_COARSE of the data

    # served result == in-plan result, and no cartesian anywhere
    served = ivf_indexed_topk(spark, sf_dir)
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, _ivf_topk(spark, sf_dir).collect())
    )
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_lsh_indexed_exact_oracle_family(spark, sf_dir, tmp_path):
    """The r11 exact-oracle LSH variant: the integer-exact hash family
    reaches the recall range of the xxhash64 family, the persisted-index
    serve matches a from-scratch in-plan recompute row-for-row (the
    build→persist→serve path loses nothing), and the build is idempotent
    (a second call must not re-write or duplicate)."""
    from minio_iceberg_polaris_lakehouse_spark.operators.similarity import (
        build_lsh_index,
        lsh_indexed_topk,
    )

    served = QUERIES["sim_ann_lsh_indexed"].spark(spark, sf_dir).collect()
    brute = QUERIES["sim_topk_bruteforce"].spark(spark, sf_dir).collect()
    truth, got = {}, {}
    for r in brute:
        truth.setdefault(r.q_id, set()).add(r.neighbor_id)
    for r in served:
        got.setdefault(r.q_id, set()).add(r.neighbor_id)
    recalls = [len(truth[q] & got.get(q, set())) / len(truth[q]) for q in truth]
    assert sum(recalls) / len(recalls) >= 0.6, recalls

    # idempotent build: second call returns with the same single snapshot
    wh = build_lsh_index(spark, sf_dir, str(tmp_path / "lsh"))
    idx = wh.table("ann", "lsh_index")
    snap1 = idx.current_snapshot_id()
    build_lsh_index(spark, sf_dir, str(tmp_path / "lsh"))
    assert idx.current_snapshot_id() == snap1
    # 8 hash tables -> 8 rows per corpus vector, partitioned by table_id
    n_vec = load_table(spark, sf_dir, "embeddings").count()
    assert idx.read().count() == 8 * n_vec
