"""SemDeDup-style semantic deduplication over the `embeddings` table
(EXT scope, SURVEY.md §2.14 X2/X3 composed).

Abbas et al. 2023 ("SemDeDup: Data-efficient learning at web-scale
through semantic deduplication", arXiv:2303.09540, public) deduplicate a
corpus by (1) clustering embeddings with a coarse quantizer, (2)
computing pairwise cosine only WITHIN a cluster, and (3) keeping one
representative per group of semantic duplicates. Step 2 is what makes it
tractable: the quadratic term is confined to a cluster, never the corpus.

This operator reproduces that shape with the engine's existing pieces:
the IVF coarse quantizer (operators/similarity.py `_ivf_scored` — the
same cells the ANN index uses, so one quantizer serves both search and
dedup), multi-assignment to the top SEM_PROBE cells (the standard recall
lever: a pair is a candidate if the two vectors share ANY cell), and
connected-components + keep-one resolution (operators/dedup.py
`min_label_components` — the same loop the text near-dup path uses).

Correctness framing (the same honest split as the ANN recall gates): the
corpus embeddings are random, so no absolute cosine threshold separates
"duplicates" (pairs top out near 0.51); the duplicate set is therefore
defined as the TOP SEM_TOP_PAIRS most-similar pairs within a fixed
deterministic audit subset (vec_id < SEM_CAP — constant-size at every
SF, so the exact side never grows). Both engines compute that exact pair
graph and its components — a real value-hash check — while the in-plan
gate proves the cell-blocked candidate generation captured at least
SEM_RECALL_BOUND of those pairs (Spark-only; the oracle pins it TRUE).
At 100 TB the audit subset stays a sampled audit, and the production
path is candidates → exact-cosine verify → components, all linear in
corpus size outside the within-cell term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from minio_iceberg_polaris_lakehouse_spark.operators.dedup import min_label_components
from minio_iceberg_polaris_lakehouse_spark.operators.similarity import (
    _ivf_scored,
    as_double,
    dot,
    norm,
)
from minio_iceberg_polaris_lakehouse_spark.registry import register
from minio_iceberg_polaris_lakehouse_spark.sources.tables import load_table

SEM_CAP = 500  # audit subset: vec_id < SEM_CAP (constant at every SF)
SEM_TOP_PAIRS = 100  # the "semantic duplicate" pair budget inside the subset
SEM_PROBE = 2  # each vector joins its top-P cells (multi-assignment)
SEM_RECALL_BOUND = 0.25  # candidate capture floor (measured ~0.5 at sf0.01)


def _exact_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audit subset's exact duplicate graph: top SEM_TOP_PAIRS pairs
    by cosine among vec_id < SEM_CAP. Norms are hoisted per-vector below
    the pair join; ROUND(cos, 6) + (vec_a, vec_b) tiebreak makes the
    boundary deterministic across engines; TakeOrderedAndProject keeps
    the rank stage top-k, not a full sort."""
    v = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < SEM_CAP)
        .select("vec_id", as_double("embedding").alias("e"))
        .select("vec_id", "e", norm(F.col("e")).alias("n"))
    )
    a, b = v.alias("a"), v.alias("b")
    cos = dot(F.col("a.e"), F.col("b.e")) / (F.col("a.n") * F.col("b.n"))
    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id")).select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        F.round(cos, 6).alias("cosine"),
    )
    return pairs.orderBy(F.desc("cosine"), "vec_a", "vec_b").limit(SEM_TOP_PAIRS)


def _cell_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate pairs from the coarse quantizer: every vector joins its
    SEM_PROBE most-similar cells; a pair is a candidate when the two
    vectors share a cell. Only the within-cell term is quadratic — the
    SemDeDup access pattern."""
    _cells, scored = _ivf_scored(spark, sf_dir)
    w = Window.partitionBy("vec_id").orderBy(F.desc("csim"), "cell")
    assign = (
        scored.filter(F.col("vec_id") < SEM_CAP)
        .select("vec_id", "cell", F.row_number().over(w).alias("r"))
        .filter(F.col("r") <= SEM_PROBE)
        .select("vec_id", "cell")
    )
    a, b = assign.alias("a"), assign.alias("b")
    return (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )


@register(
    "dedup_semantic",
    oracle=f"""
    WITH RECURSIVE v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings WHERE vec_id < {SEM_CAP}),
    n AS (
        SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x * x))) AS nv FROM v),
    pairs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               ROUND(list_sum(list_transform(list_zip(a.e, b.e), p -> p[1] * p[2]))
                     / (a.nv * b.nv), 6) AS cosine
        FROM n a JOIN n b ON a.vec_id < b.vec_id),
    top_pairs AS (
        SELECT vec_a, vec_b FROM (
            SELECT vec_a, vec_b,
                   ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_a, vec_b) AS rn
            FROM pairs) z
        WHERE rn <= {SEM_TOP_PAIRS}),
    edge AS (
        SELECT vec_a AS a, vec_b AS b FROM top_pairs
        UNION
        SELECT vec_b, vec_a FROM top_pairs),
    reach(a, b) AS (
        SELECT a, b FROM edge
        UNION
        SELECT r.a, e.b FROM reach r JOIN edge e ON r.b = e.a WHERE e.b <> r.a),
    comp AS (
        SELECT a AS vec_id, LEAST(a, MIN(b)) AS cluster_id FROM reach GROUP BY a)
    SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(COUNT(*) - 1 AS BIGINT) AS n_removed,
           TRUE AS capture_ok
    FROM comp
    GROUP BY cluster_id
    ORDER BY cluster_id
    """,
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup resolution: connected components over the audit
    subset's exact top-cosine pair graph, one representative (min vec_id)
    kept per cluster — with an in-plan proof that the IVF-cell candidate
    generation (the part that scales) captured >= SEM_RECALL_BOUND of
    those exact pairs. One row per duplicate cluster: size, rows dedup
    removes, and the capture gate (constant across rows)."""
    edges = _exact_top_pairs(spark, sf_dir).select("vec_a", "vec_b")
    cand = _cell_candidates(spark, sf_dir)
    captured = edges.join(cand, ["vec_a", "vec_b"], "left_semi")
    gate = (
        captured.agg(F.count("*").alias("c"))
        .crossJoin(F.broadcast(edges.agg(F.count("*").alias("t"))))
        .select((F.col("c") / F.col("t") >= SEM_RECALL_BOUND).alias("capture_ok"))
    )
    labels = min_label_components(
        edges.select(F.col("vec_a").alias("src"), F.col("vec_b").alias("dst"))
    )
    return (
        labels.groupBy(F.col("label").cast("long").alias("cluster_id"))
        .agg(
            F.count("*").cast("long").alias("n_members"),
            (F.count("*") - 1).cast("long").alias("n_removed"),
        )
        .crossJoin(F.broadcast(gate))
        .orderBy("cluster_id")
    )
