"""Distributed PCA over the `embeddings` table: dimensionality reduction
/ embedding compression for an LLM-data pipeline (EXT scope, SURVEY.md
§2.14 X3/X4 adjacent — the lossy counterpart of the PQ/int8 quantizers in
operators/similarity_pq.py).

Algorithm (the covariance method, exactly what Spark MLlib's
`RowMatrix.computeCovariance` + `computePrincipalComponents` does):

1. ONE Arrow-batched pass over the corpus computes per-partition partial
   moments — (count, sum-vector, sum-of-outer-products d×d) — via
   `mapInPandas`; each partition emits ONE row of d + d² floats, and a
   depth-2 executor-side combine (`_merge_moments`, MLlib treeAggregate's
   shape) reduces them to at most 32 rows before the driver sees any. At
   100 TB this is the only scalable shape: the d×d Gram accumulation must
   ride the scan — never a d²-wide explode per row, never an
   O(partitions × d²) driver collect.
2. The driver assembles the covariance matrix from the tiny partial set
   and takes the top-K eigenvectors (numpy.linalg.eigh on a d×d
   symmetric matrix — milliseconds, deterministic up to sign; signs are
   fixed by forcing each component's largest-|coefficient| entry
   positive).
3. The components are broadcast back as literals and every vector is
   projected JVM-side (one zip_with/aggregate dot per component — no
   Python in the projection path, which is the part that runs over the
   full corpus in production).

Correctness framing (same split as the ANN/SemDeDup gates): the corpus
total variance is computed by BOTH engines through an order-independent
decimal accumulation and hash-compared, while two in-plan gates pin the
PCA itself: (a) the top-K projected variance captures at least
PCA_MIN_CAPTURE of the total, and (b) it is >= the best K raw
dimensions' share — guaranteed by Schur-Horn majorization (the
eigenvalue prefix-sum dominates the sorted-diagonal prefix-sum), so a
violation can only mean the implementation broke. tests/test_pca.py
additionally checks the components against a full single-node numpy PCA.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from minio_iceberg_polaris_lakehouse_spark.operators.similarity import EMB_DIM, as_double
from minio_iceberg_polaris_lakehouse_spark.registry import register
from minio_iceberg_polaris_lakehouse_spark.sources.tables import load_table

PCA_K = 8  # components kept (64 -> 8: 8x compression)
PCA_MIN_CAPTURE = 0.15  # top-K variance floor (measured ~0.2 on the corpus)

_MOMENT_SCHEMA = "n long, s array<double>, ss array<double>"


def _partial_moments(df: DataFrame) -> DataFrame:
    """Per-partition (count, Σx, Σxxᵀ) — one output row per partition."""

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        n = 0
        s = np.zeros(EMB_DIM)
        ss = np.zeros((EMB_DIM, EMB_DIM))
        for b in batches:
            if not len(b):
                continue
            m = np.stack(b["e"].to_numpy())
            n += m.shape[0]
            s += m.sum(axis=0)
            ss += m.T @ m
        if n:
            yield pd.DataFrame({"n": [n], "s": [s.tolist()], "ss": [ss.ravel().tolist()]})

    return df.mapInPandas(kernel, _MOMENT_SCHEMA)


_MERGE_GROUPS = 32


def _merge_moments(parts: DataFrame) -> DataFrame:
    """Executor-side depth-2 combine (MLlib treeAggregate's shape): the
    per-partition partials group by a CONTENT-derived key and merge in a
    deterministic within-group order, so the driver collects at most
    _MERGE_GROUPS rows however many scan partitions the corpus has — at
    100 TB the driver would otherwise hold O(partitions × d²) floats.
    Content-derived grouping + sorted merging keep the fit bit-identical
    under any task scheduling or input partitioning."""

    def merge(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np
        import pandas as pd

        pdf = pdf.assign(
            _s0=pdf["s"].map(lambda a: a[0]), _s1=pdf["s"].map(lambda a: a[1])
        ).sort_values(["n", "_s0", "_s1"], kind="mergesort")
        n = int(pdf["n"].sum())
        s = np.sum([np.array(x) for x in pdf["s"]], axis=0)
        ss = np.sum([np.array(x) for x in pdf["ss"]], axis=0)
        return pd.DataFrame({"n": [n], "s": [s.tolist()], "ss": [ss.tolist()]})

    keyed = parts.withColumn(
        "g",
        F.pmod(F.xxhash64(F.col("n"), F.element_at("s", 1)), F.lit(_MERGE_GROUPS)),
    )
    return keyed.groupBy("g").applyInPandas(merge, _MOMENT_SCHEMA)


def fit_pca(spark: SparkSession, sf_dir: str, k: int = PCA_K):
    """Covariance-method PCA fit. Returns (components k×d as lists,
    eigvals desc, mean, n). Partials are tree-combined executor-side and
    the surviving handful summed in a deterministic order (sorted by
    count then leading sum entries) so the fit does not depend on
    partition scheduling."""
    import numpy as np

    v = load_table(spark, sf_dir, "embeddings").select(as_double("embedding").alias("e"))
    parts = _merge_moments(_partial_moments(v)).collect()
    parts.sort(key=lambda r: (r.n, r.s[0], r.s[1]))
    n = sum(p.n for p in parts)
    s = np.sum([np.array(p.s) for p in parts], axis=0)
    ss = np.sum([np.array(p.ss).reshape(EMB_DIM, EMB_DIM) for p in parts], axis=0)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    w, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:k]
    comps = []
    for idx in order:
        c = vecs[:, idx]
        # deterministic sign: largest-|coefficient| entry positive
        j = int(np.argmax(np.abs(c)))
        if c[j] < 0:
            c = -c
        comps.append([float(x) for x in c])
    return comps, [float(w[i]) for i in order], [float(x) for x in mean], n


def _per_dim_variance_decimal(v: DataFrame) -> DataFrame:
    """Per-dimension population variance through order-independent
    decimal sums of x and x² (posexplode → 64-row aggregate, map-side
    partial) — the exactly-reproducible half the oracle mirrors."""
    x = v.select(F.posexplode("e").alias("dim", "x"))
    return x.groupBy("dim").agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast("decimal(28,12)")).cast("double").alias("s1"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(28,12)")).cast("double").alias("s2"),
    ).select(
        "dim",
        F.round(F.col("s2") / F.col("n") - (F.col("s1") / F.col("n")) ** 2, 8).alias("var"),
    )


@register(
    "sim_embedding_pca",
    oracle=f"""
    WITH x AS (
        SELECT u.dim AS dim, CAST(u.x AS DOUBLE) AS x
        FROM embeddings,
             LATERAL (SELECT generate_subscripts(embedding, 1) AS dim,
                             unnest(embedding) AS x) u),
    pd AS (
        SELECT dim, COUNT(*) AS n,
               CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) AS s1,
               CAST(SUM(CAST(x * x AS DECIMAL(28,12))) AS DOUBLE) AS s2
        FROM x GROUP BY dim),
    pv AS (
        SELECT ROUND(s2 / n - (s1 / n) * (s1 / n), 8) AS var FROM pd)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings) AS n_vectors,
           {EMB_DIM} AS dim,
           {PCA_K} AS top_k,
           ROUND(CAST(SUM(CAST(var AS DECIMAL(18,8))) AS DOUBLE), 6) AS total_variance,
           TRUE AS capture_ok,
           TRUE AS beats_axes_ok
    FROM pv
    """,
)
def sim_embedding_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA embedding compression, end to end: fit top-8 components from
    one distributed moment pass, project every vector JVM-side, and emit
    the corpus variance accounting. total_variance is value-hash-checked
    against DuckDB's identical decimal computation; capture_ok /
    beats_axes_ok are the in-plan PCA gates (the oracle pins them TRUE)."""
    comps, _eigvals, mean, _n = fit_pca(spark, sf_dir)
    v = load_table(spark, sf_dir, "embeddings").select(as_double("embedding").alias("e"))
    per_dim = _per_dim_variance_decimal(v)
    total = per_dim.agg(
        F.round(F.sum(F.col("var").cast("decimal(18,8)")).cast("double"), 6).alias(
            "total_variance"
        )
    )
    # top-K RAW dims' variance share (the axis-aligned baseline PCA must beat)
    axes_top = per_dim.orderBy(F.desc("var"), "dim").limit(PCA_K).agg(
        F.sum("var").alias("axes_var")
    )
    # JVM-side projection onto each (centered) component, then the
    # projected variance per component — E[p²] with E[p]=0 by centering
    # single array literals (one py4j call each) — F.array of 64 F.lit
    # columns costs ~0.5 s of driver round-trips per build for the 9
    # arrays here, for the identical Literal
    mean_arr = F.lit(mean)
    centered = F.zip_with(F.col("e"), mean_arr, lambda a, b: a - b)
    proj_cols = []
    for ki, c in enumerate(comps):
        carr = F.lit(c)
        p = F.aggregate(
            F.zip_with(centered, carr, lambda a, b: a * b), F.lit(0.0), lambda acc, y: acc + y
        )
        proj_cols.append((p * p).alias(f"p{ki}"))
    # n_vectors rides the SAME aggregate (r13): the separate v.count()
    # subtree re-scanned the corpus inside this job for a value the
    # projection agg already sees
    proj_var = v.select(*proj_cols).agg(
        *[F.avg(f"p{ki}").alias(f"v{ki}") for ki in range(PCA_K)],
        F.count("*").cast("long").alias("n_vectors"),
    )
    pca_var = proj_var.select(
        "n_vectors", sum(F.col(f"v{ki}") for ki in range(PCA_K)).alias("pca_var")
    )
    return (
        pca_var.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(axes_top))
        .select(
            "n_vectors",
            F.lit(EMB_DIM).alias("dim"),
            F.lit(PCA_K).alias("top_k"),
            "total_variance",
            (F.col("pca_var") / F.col("total_variance") >= PCA_MIN_CAPTURE).alias(
                "capture_ok"
            ),
            # Schur-Horn: eigenvalue prefix sums majorize the sorted
            # diagonal's — a tiny float tolerance absorbs rounding
            (F.col("pca_var") >= F.col("axes_var") * (1 - 1e-9)).alias("beats_axes_ok"),
        )
    )
