"""SemDeDup-style semantic dedup (operators/semdedup.py). Oracle parity
runs in test_oracle_parity; here we pin the capture gate's real margin,
the cluster invariants, and the plan shapes that keep candidate
generation linear at scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from minio_iceberg_polaris_lakehouse_spark.operators.semdedup import (
    SEM_CAP,
    SEM_RECALL_BOUND,
    SEM_TOP_PAIRS,
    _cell_candidates,
    _exact_top_pairs,
    dedup_semantic,
)


def test_capture_gate_holds_with_margin(spark, sf_dir):
    """The in-plan gate must not sit at the boundary: measured capture is
    ~0.45-0.56 across SFs, the bound 0.25 — if this drops below the bound
    the driver row would go red, so the margin itself is pinned here."""
    edges = _exact_top_pairs(spark, sf_dir).select("vec_a", "vec_b")
    cand = _cell_candidates(spark, sf_dir)
    captured = edges.join(cand, ["vec_a", "vec_b"], "left_semi").count()
    total = edges.count()
    assert total == SEM_TOP_PAIRS
    assert captured / total >= SEM_RECALL_BOUND, (captured, total)


def test_cluster_rows_well_formed(spark, sf_dir):
    rows = dedup_semantic(spark, sf_dir).collect()
    assert rows, "top-pair graph produced no clusters"
    for r in rows:
        assert r.capture_ok is True
        assert r.n_members >= 2  # components come from edges: no singletons
        assert r.n_removed == r.n_members - 1
    # keep-one accounting: removed = nodes - clusters over the whole graph
    n_nodes = sum(r.n_members for r in rows)
    n_removed = sum(r.n_removed for r in rows)
    assert n_removed == n_nodes - len(rows)
    # every cluster id is the min member id, so ids are distinct and < CAP
    ids = [r.cluster_id for r in rows]
    assert len(set(ids)) == len(ids)
    assert all(0 <= i < SEM_CAP for i in ids)


def test_candidates_within_cap_and_ordered(spark, sf_dir):
    c = _cell_candidates(spark, sf_dir)
    bad = c.filter(
        (F.col("vec_a") >= F.col("vec_b"))
        | (F.col("vec_a") >= SEM_CAP)
        | (F.col("vec_b") >= SEM_CAP)
    ).count()
    assert bad == 0


def test_candidate_plan_is_equi_join_no_cartesian(spark, sf_dir):
    """The scaling half (cell-blocked candidates) must join on cell
    equality — a cartesian here is the O(n^2) trap SemDeDup exists to
    avoid. (The audit subset's exact side is allowed its bounded
    broadcast nested loop: it is capped at SEM_CAP rows by construction.)"""
    plan = _cell_candidates(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
