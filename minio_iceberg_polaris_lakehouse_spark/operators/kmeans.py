"""Distributed k-means (Lloyd's algorithm) over the `embeddings` table —
the corpus-clustering pass a training-data pipeline runs for data maps,
mixture balancing, and semantic bucketing (the same primitive the IVF/PQ
coarse quantizers train on a driver-side sample; here the FULL corpus
iterates distributedly, MLlib-style).

Execution shape per iteration — the classic Spark pattern:
  1. ASSIGN: the K×d centroid table (tiny) is broadcast against a
     partitioned corpus scan; squared distance is a JVM-side
     `aggregate(zip_with(...))` fold and the argmin folds map-side via
     `MIN(struct(dist, cid))` — partial aggregation means one row per
     vector crosses the exchange, never K rows.
  2. UPDATE: per-dimension means via posexplode + decimal-exact SUM
     (map-side partials collapse to d×K groups), re-packed to arrays.
     Only the K×d centroid table (8×64 doubles here) returns to the
     driver between iterations — the corpus never moves, exactly how
     MLlib's KMeans iterates at any scale (at 100 TB you would also
     `persist()` the double-cast corpus across the iteration jobs).

Engine-independent determinism (so a DuckDB oracle can replay the WHOLE
iteration history and hash-match the result): distances are rounded to
6 dp before the argmin with cid tiebreak; centroid means are
decimal-exact then rounded to 6 dp; the distance fold is the sequential
array-order fold the similarity operators already pin
(`list_sum(list_transform(list_zip(...)))` ≡ `aggregate(zip_with(...))`).
Empty clusters die identically in both engines (no row from the mean).

Reference scope: the reference curates corpora with stock Spark SQL
(workspace/notebooks, warehouse_helpers.py); clustering is part of the
§2.14 training-data operator surface this engine adds as first-class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from minio_iceberg_polaris_lakehouse_spark.operators.similarity import as_double, norm
from minio_iceberg_polaris_lakehouse_spark.registry import register
from minio_iceberg_polaris_lakehouse_spark.sources.tables import load_table

K_CLUSTERS = 8
N_ITERS = 2  # centroid-update rounds before the final assignment


def _dist6(e, c):
    """Squared euclidean distance, sequential array-order fold, 6 dp."""
    return F.round(
        F.aggregate(
            F.zip_with(e, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )


def _assign(v: DataFrame, cdf: DataFrame) -> DataFrame:
    """One broadcast-assignment pass → (vec_id, e, cid, dist) argmin rows."""
    scored = v.crossJoin(F.broadcast(cdf)).select(
        "vec_id", "e", "cid", _dist6(F.col("e"), F.col("cent")).alias("dist")
    )
    best = scored.groupBy("vec_id").agg(
        F.min(F.struct("dist", "cid")).alias("b"), F.first("e").alias("e")
    )
    return best.select(
        "vec_id", "e", F.col("b.cid").alias("cid"), F.col("b.dist").alias("dist")
    )


def _update(assigned: DataFrame) -> DataFrame:
    """Per-dimension decimal-exact means, re-packed to centroid arrays."""
    per_dim = (
        assigned.select("cid", F.posexplode("e").alias("d", "val"))
        .groupBy("cid", "d")
        .agg(
            F.round(
                F.sum(F.col("val").cast("decimal(28,12)")).cast("double") / F.count("*"), 6
            ).alias("m")
        )
    )
    return per_dim.groupBy("cid").agg(
        F.transform(F.array_sort(F.collect_list(F.struct("d", "m"))), lambda s: s["m"]).alias(
            "cent"
        )
    )


def kmeans_fit(
    spark: SparkSession, sf_dir: str, k: int = K_CLUSTERS, iters: int = N_ITERS
) -> tuple[DataFrame, DataFrame]:
    """Run `iters` Lloyd's rounds; returns (final_assignment, centroids).
    Initial centroids are the vectors with vec_id < k (deterministic)."""
    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("e")
    )
    cents = [
        (int(r["cid"]), list(r["cent"]))
        for r in v.filter(F.col("vec_id") < k)
        .select(F.col("vec_id").cast("int").alias("cid"), F.col("e").alias("cent"))
        .collect()
    ]
    cdf = spark.createDataFrame(cents, "cid int, cent array<double>")
    for _ in range(iters):
        cents = [(r["cid"], list(r["cent"])) for r in _update(_assign(v, cdf)).collect()]
        cdf = spark.createDataFrame(cents, "cid int, cent array<double>")
    return _assign(v, cdf), cdf


def _kmeans_oracle(k: int, iters: int) -> str:
    """Unrolled-CTE DuckDB replay of the exact same iteration history."""
    dist = (
        "ROUND(list_sum(list_transform(list_zip(v.e, c.cent), "
        "p -> (p[1] - p[2]) * (p[1] - p[2]))), 6)"
    )
    ctes = [
        "WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e"
        " FROM embeddings)",
        f"c0 AS (SELECT CAST(vec_id AS INT) AS cid, e AS cent FROM v WHERE vec_id < {k})",
    ]
    for i in range(iters + 1):
        ctes.append(
            f"a{i} AS (SELECT vec_id, cid, dist FROM ("
            f" SELECT v.vec_id, c.cid, {dist} AS dist,"
            f" ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY {dist}, c.cid) AS rn"
            f" FROM v CROSS JOIN c{i} c) WHERE rn = 1)"
        )
        if i < iters:
            ctes.append(
                f"c{i + 1} AS (SELECT cid, list(m ORDER BY d) AS cent FROM ("
                f" SELECT cid, d,"
                f" ROUND(CAST(SUM(CAST(val AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS m"
                f" FROM (SELECT a.cid AS cid, generate_subscripts(v.e, 1) AS d,"
                f" unnest(v.e) AS val FROM a{i} a JOIN v USING (vec_id))"
                f" GROUP BY cid, d) GROUP BY cid)"
            )
    final = (
        f"SELECT s.cid AS cid, CAST(s.n_points AS BIGINT) AS n_points,"
        f" ROUND(sqrt(list_sum(list_transform(c.cent, x -> x * x))), 6) AS centroid_norm,"
        f" s.inertia AS inertia"
        f" FROM (SELECT cid, COUNT(*) AS n_points,"
        f" CAST(SUM(CAST(dist AS DECIMAL(18,6))) AS DOUBLE) AS inertia"
        f" FROM a{iters} GROUP BY cid) s"
        f" JOIN c{iters} c ON s.cid = c.cid ORDER BY cid"
    )
    return ", ".join(ctes) + " " + final


@register("ml_kmeans_clusters", oracle=_kmeans_oracle(K_CLUSTERS, N_ITERS))
def ml_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster fit summary after N_ITERS distributed Lloyd's rounds:
    member count, final centroid norm, and decimal-exact inertia.  The
    DuckDB oracle replays every assignment and every centroid update of
    the iteration history — a hash match proves the distributed iterative
    fit is exactly reproducible on another engine."""
    assigned, cdf = kmeans_fit(spark, sf_dir)
    stats = assigned.groupBy("cid").agg(
        F.count("*").cast("long").alias("n_points"),
        F.sum(F.col("dist").cast("decimal(18,6)")).cast("double").alias("inertia"),
    )
    norms = cdf.select("cid", F.round(norm(F.col("cent")), 6).alias("centroid_norm"))
    return (
        stats.join(F.broadcast(norms), "cid")
        .select(F.col("cid").cast("int").alias("cid"), "n_points", "centroid_norm", "inertia")
        .orderBy("cid")
    )
