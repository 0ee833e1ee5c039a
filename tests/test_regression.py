"""Distributed linear/ridge regression (operators/regression.py): the
one-pass normal-equation fit — in-plan Cramer solve vs driver Gaussian
elimination vs NumPy lstsq, ridge shrinkage, singularity, and the
map-side partial-aggregation plan shape."""

from __future__ import annotations

import numpy as np
import pytest

from minio_iceberg_polaris_lakehouse_spark.operators.regression import (
    fit_linear_regression,
    ml_linear_regression,
)


def _feature_frame(spark, sf_dir):
    from minio_iceberg_polaris_lakehouse_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "documents").selectExpr(
        "LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS x1",
        "LENGTH(text) - LENGTH(REPLACE(text, 'e', '')) AS x2",
        "LENGTH(text) - LENGTH(REPLACE(text, 'a', '')) AS x3",
        "n_chars AS y",
    )


def test_three_solvers_agree(spark, sf_dir):
    """In-plan Cramer (k=2), driver elimination (k=2), and NumPy lstsq
    produce the same coefficients to 6 decimals."""
    row = ml_linear_regression(spark, sf_dir).collect()[0]
    d = _feature_frame(spark, sf_dir)
    beta = fit_linear_regression(d, ["x1", "x2"], "y")
    assert [round(b, 6) for b in beta] == [row.b0, row.b1, row.b2]
    pdf = d.toPandas()
    A = np.column_stack([np.ones(len(pdf)), pdf.x1, pdf.x2])
    ref = np.linalg.lstsq(A, pdf.y.to_numpy(), rcond=None)[0]
    assert [round(float(b), 6) for b in ref] == [row.b0, row.b1, row.b2]


def test_k3_matches_numpy(spark, sf_dir):
    """The driver solve generalizes beyond the Cramer query: k=3
    features match lstsq (the corpus features are non-collinear)."""
    d = _feature_frame(spark, sf_dir)
    beta = fit_linear_regression(d, ["x1", "x2", "x3"], "y")
    pdf = d.toPandas()
    A = np.column_stack([np.ones(len(pdf)), pdf.x1, pdf.x2, pdf.x3])
    ref = np.linalg.lstsq(A, pdf.y.to_numpy(), rcond=None)[0]
    assert np.allclose(beta, ref, atol=1e-6)


def test_ridge_shrinks_and_singular_raises(spark, sf_dir):
    d = _feature_frame(spark, sf_dir)
    ols = fit_linear_regression(d, ["x1", "x2"], "y")
    ridged = fit_linear_regression(d, ["x1", "x2"], "y", ridge=1e6)
    # a large ridge penalty pulls the (non-intercept) weights toward 0
    assert abs(ridged[1]) < abs(ols[1]) and abs(ridged[2]) < abs(ols[2])
    # perfectly collinear features → loud failure, not garbage numbers
    dup = d.selectExpr("x1", "x1 AS x2", "y")
    with pytest.raises(ValueError, match="singular"):
        fit_linear_regression(dup, ["x1", "x2"], "y")


def test_moment_pass_is_partial_aggregated(spark, sf_dir):
    """The single data pass must map-side combine: one scan, a
    partial+final HashAggregate pair — the shape that holds at 100 TB
    (one moment row per partition crosses the exchange)."""
    from minio_iceberg_polaris_lakehouse_spark.plans.inspect import plan_string, scan_count

    df = ml_linear_regression(spark, sf_dir)
    plan = plan_string(df)
    assert scan_count(df) == 1, plan
    assert "partial_sum" in plan


def test_logistic_regression_matches_numpy_replay(spark, sf_dir):
    """The distributed GD trajectory equals an independent numpy replay
    (same rounding recipe), and is partitioning-independent."""
    import numpy as np

    from minio_iceberg_polaris_lakehouse_spark.operators.regression import (
        _LR,
        _LR_ITERS,
        _RS,
        ml_logistic_regression,
    )
    from minio_iceberg_polaris_lakehouse_spark.sources.tables import load_table

    got = [
        (r.iter, r.w_bias, r.w_qty, r.w_disc)
        for r in ml_logistic_regression(spark, sf_dir).collect()
    ]
    assert len(got) == _LR_ITERS

    l = load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_discount", "l_returnflag"
    )
    rows = l.collect()
    x1 = np.array([r.l_quantity / 50.0 for r in rows])
    x2 = np.array([float(r.l_discount) for r in rows])
    y = np.array([1.0 if r.l_returnflag == "R" else 0.0 for r in rows])
    n = float(len(rows))
    w = np.zeros(3)
    want = []
    for it in range(1, _LR_ITERS + 1):
        z = w[0] + w[1] * x1 + w[2] * x2
        s = 1.0 / (1.0 + np.exp(-z))
        for j, xj in enumerate([np.ones_like(x1), x1, x2]):
            # same recipe: per-term round(12), exact summation, /n
            terms = np.round((s - y) * xj, _RS)
            g = float(sum(map(float, terms))) / n
            w[j] = w[j] - _LR * g
        w = np.array([_half_up(v, _RS) for v in w])
        want.append((it, w[0], w[1], w[2]))
    for (gi, ga, gb, gc), (wi, wa, wb, wc) in zip(got, want):
        assert gi == wi
        assert abs(ga - wa) < 1e-9 and abs(gb - wb) < 1e-9 and abs(gc - wc) < 1e-9
    # learning signal: the bias moves off zero and the trajectory is
    # monotone in iteration count (weights keep updating)
    assert got[0][1] != 0.0
    assert got[0] != got[-1]
    # partitioning-independence: exact equality, not tolerance
    l32 = ml_logistic_regression(spark, sf_dir)
    again = [(r.iter, r.w_bias, r.w_qty, r.w_disc) for r in l32.collect()]
    assert again == got


def _half_up(v: float, nd: int) -> float:
    import decimal

    return float(
        decimal.Decimal(repr(v)).quantize(
            decimal.Decimal(1).scaleb(-nd), rounding=decimal.ROUND_HALF_UP
        )
    )


def test_model_quality_filter_learns_the_teacher(spark, sf_dir):
    """The distilled filter must actually track its heuristic teacher:
    per-doc agreement between the model's keep decision and the teacher
    label is well above chance, rates vary by source, and the whole
    query is deterministic across partitionings."""
    from pyspark.sql import functions as F

    from minio_iceberg_polaris_lakehouse_spark.operators.regression import (
        text_model_quality_filter,
    )
    from minio_iceberg_polaris_lakehouse_spark.sources.tables import load_table

    out = {r.source: r for r in text_model_quality_filter(spark, sf_dir).collect()}
    assert out
    rates = [r.keep_rate for r in out.values()]
    assert 0.0 < min(rates) and max(rates) < 1.0, "filter must discriminate"

    # corpus-level agreement with the teacher rule (diversity > 0.46)
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    y = (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)) > 0.46
    teacher_pos = d.filter(y).count() / d.count()
    kept = sum(r.n_kept for r in out.values()) / sum(r.n_docs for r in out.values())
    # the model's overall keep volume lands near the teacher's positive
    # rate (a degenerate all-keep / all-drop model fails this)
    assert abs(kept - teacher_pos) < 0.25

    again = {r.source: r for r in text_model_quality_filter(spark, sf_dir).collect()}
    assert {k: tuple(v) for k, v in out.items()} == {k: tuple(v) for k, v in again.items()}
