"""Similarity search over the `embeddings` table (EXT scope, SURVEY.md
§2.14 X3): brute-force cosine top-k as the correctness baseline, a
random-hyperplane LSH bucketed variant as the 100 TB scale path, and a
per-label centroid aggregation.

Scale design: brute-force is a broadcast of the (small) query set against a
partitioned scan of the corpus — linear, no shuffle of the corpus itself;
top-k folds into a per-partition heap via window-rank. The LSH variant
replaces the full scan with an equality join on signature buckets, turning
the search into O(candidates). Vector math is JVM-side higher-order
functions (zip_with/aggregate) — no Python, no UDF.
"""

from __future__ import annotations

import threading

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from minio_iceberg_polaris_lakehouse_spark.registry import register
from minio_iceberg_polaris_lakehouse_spark.sources.tables import load_table

N_QUERIES = 8  # vec_id < 8 are the demo query vectors
TOP_K = 10


def as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    """Sequential-fold dot product (deterministic order: array order)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


@register(
    "sim_topk_bruteforce",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings),
    q AS (SELECT vec_id AS q_id, e AS qe FROM v WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT q.q_id, v.vec_id AS neighbor_id,
               ROUND(list_sum(list_transform(list_zip(q.qe, v.e), p -> p[1] * p[2]))
                     / (sqrt(list_sum(list_transform(q.qe, x -> x * x)))
                        * sqrt(list_sum(list_transform(v.e, x -> x * x)))), 6) AS cosine
        FROM q CROSS JOIN v
        WHERE v.vec_id <> q.q_id),
    ranked AS (
        SELECT q_id, neighbor_id, cosine,
               ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, neighbor_id) AS rn
        FROM scored)
    SELECT q_id, neighbor_id, cosine, CAST(rn AS INT) AS rn
    FROM ranked WHERE rn <= {TOP_K}
    ORDER BY q_id, rn
    """,
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast the query vectors against the corpus
    scan, rank per query. Ranking uses the 6-dp-rounded cosine with
    neighbor_id tiebreak so the ordering is engine-independent.

    Norms are hoisted BELOW the cross join (one 64-element fold per
    corpus vector) instead of inside the per-(query, vector) cosine —
    which would refold the same norm N_QUERIES times per vector. The
    division keeps the exact ``dot/(norm_q*norm_v)`` operand order, so
    results stay bit-identical to the naive form and the oracle."""
    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("e")
    )
    vn = v.select("vec_id", "e", norm(F.col("e")).alias("ne"))
    q = vn.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("e").alias("qe"), F.col("ne").alias("nq")
    )
    scored = (
        vn.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(dot(F.col("qe"), F.col("e")) / (F.col("nq") * F.col("ne")), 6).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.select("*", F.row_number().over(w).cast("int").alias("rn"))
        .filter(F.col("rn") <= TOP_K)
        .orderBy("q_id", "rn")
    )


EMB_DIM = 64  # embedding width in the test corpus (FIXTURES.md)

# Per-dimension decimal-exact means, squared and added left-to-right —
# the same fold order as the Spark side, so the doubles match bitwise.
_CENTROID_SQ_TERMS = " + ".join(
    f"(CAST(SUM(CAST(embedding[{d}] AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*))"
    f" * (CAST(SUM(CAST(embedding[{d}] AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*))"
    for d in range(1, EMB_DIM + 1)
)


@register(
    "sim_label_centroids",
    oracle=f"""
    SELECT CAST(label AS INT) AS label,
           ROUND(sqrt({_CENTROID_SQ_TERMS}), 6) AS centroid_norm,
           CAST(MAX(len(embedding)) AS INT) AS dim
    FROM embeddings
    GROUP BY label
    ORDER BY label
    """,
)
def sim_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding column, reported as the centroid
    L2 norm. Implemented the scale-friendly way: posexplode → per-(label,
    position) decimal-exact mean → re-assemble the vector — one narrow
    shuffle keyed by (label, pos), never a collect."""
    emb = load_table(spark, sf_dir, "embeddings")
    flat = emb.select("label", F.posexplode("embedding").alias("pos", "val")).select(
        "label", "pos", F.col("val").cast("double").alias("val")
    )
    cent = flat.groupBy("label", "pos").agg(
        (F.sum(F.col("val").cast("decimal(28,12)")).cast("double") / F.count("*")).alias("c")
    )
    assembled = (
        cent.groupBy("label")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pairs"),
            (F.max("pos") + 1).cast("int").alias("dim"),
        )
        .select(
            F.col("label").cast("int").alias("label"),
            F.round(norm(F.transform("pairs", lambda p: p.getField("c"))), 6).alias("centroid_norm"),
            "dim",
        )
    )
    return assembled.orderBy("label")


N_TABLES = 8
PLANES_PER_TABLE = 6


def _all_projections(vec_col) -> Column:
    """All N_TABLES×PLANES_PER_TABLE hyperplane projections sign(v·h) in
    ONE aggregate pass over the vector: each element updates every
    accumulator slot (hyperplane h's ±1 components derive from
    xxhash64(dim, table, plane) — deterministic, no stored model,
    identical on every executor). One pass instead of 48 separate
    zip_with+aggregate subtrees measured 1.5× faster on the signature
    stage with bit-identical buckets."""
    nsig = N_TABLES * PLANES_PER_TABLE
    zipped = F.zip_with(
        vec_col,
        F.sequence(F.lit(0), F.size(vec_col) - 1),
        lambda x, d: F.struct(x.alias("x"), d.alias("d")),
    )
    return F.aggregate(
        zipped,
        F.array_repeat(F.lit(0.0), nsig),
        lambda acc, el: F.transform(
            acc,
            lambda a, i: a
            + el.x
            * F.when(
                F.xxhash64(
                    el.d,
                    (i / PLANES_PER_TABLE).cast("int"),
                    i % PLANES_PER_TABLE,
                ).bitwiseAND(F.lit(1))
                == 1,
                1.0,
            ).otherwise(-1.0),
        ),
    )


def lsh_buckets(proj_col) -> Column:
    """Multi-table random-hyperplane LSH buckets from a MATERIALIZED
    projections column (`_all_projections` aliased in its own select —
    CollapseProject keeps the expensive aggregate from being re-inlined
    into all 48 bit extractions): N_TABLES independent signatures of
    PLANES_PER_TABLE bits each. A query only needs to collide with a
    neighbor in ONE table — recall ≈ 1-(1-p^b)^L instead of p^b. Returns
    array<struct<table_id, bucket>> for a single explode."""
    tables = []
    for t in range(N_TABLES):
        sig = None
        for pl in range(PLANES_PER_TABLE):
            bit = F.when(
                proj_col[t * PLANES_PER_TABLE + pl] > 0, F.shiftleft(F.lit(1), pl)
            ).otherwise(0)
            sig = bit if sig is None else sig + bit
        tables.append(F.struct(F.lit(t).alias("table_id"), sig.alias("bucket")))
    return F.array(*tables)


def _lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH top-k pipeline (shared by the bench-style
    raw entry and the recall gate): corpus and queries hash to signature
    buckets; search only touches same-bucket candidates, then
    exact-rescores. At 100 TB the bucket join replaces the full-corpus
    scan per query — the classic ANN trade.

    MULTI-PROBE: each query also probes every bucket at Hamming
    distance 1 from its own signature (one hyperplane bit flipped) —
    the standard multi-probe LSH trick: a true neighbor that landed
    just across ONE separating hyperplane is still found. Probing is
    query-side only (the corpus keeps one bucket per table), so the
    corpus scan and index are unchanged; the broadcast query set grows
    ×(1+PLANES_PER_TABLE), still bytes. Lifts recall@10 from ~0.25 to
    ~0.7 for ~the cost of proportionally more candidate rescores."""
    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("e")
    )
    sigs = (
        v.select("vec_id", "e", _all_projections(F.col("e")).alias("_proj"))
        .select("vec_id", "e", F.explode(lsh_buckets(F.col("_proj"))).alias("tb"))
        .select("vec_id", "e", "tb.table_id", "tb.bucket")
    )
    probes = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(PLANES_PER_TABLE)],
    )
    q = (
        sigs.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("e").alias("qe"),
            "table_id",
            F.explode(probes).alias("bucket"),
        )
    )
    cand = (
        sigs.join(F.broadcast(q), ["table_id", "bucket"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "qe", "e")
        .dropDuplicates(["q_id", "neighbor_id"])
        .select(
            "q_id",
            "neighbor_id",
            F.round(cosine(F.col("qe"), F.col("e")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        cand.select("*", F.row_number().over(w).cast("int").alias("rn"))
        .filter(F.col("rn") <= TOP_K)
        .orderBy("q_id", "rn")
    )


K_COARSE = 16  # IVF coarse-quantizer cells
NPROBE = 4  # cells probed per query


def _ivf_scored(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(cells, scored): the coarse quantizer and every vector's cosine
    against each centroid — shared by the in-plan pipeline, the recall
    gate, and the persisted-index build (one set of formulas, so the
    materialized assignment is bit-identical to the in-plan one).

    A deterministic sample of K_COARSE corpus vectors acts as the coarse
    quantizer (xxhash64-ranked sampling — deterministic, no stored model,
    no driver-side fit); norms hoisted out of the K_COARSE-way cross
    product (one fold per vector, not per (vector, cell)); operand order
    dot/(ne*nce) matches cosine() exactly, so assignments are
    bit-identical to a direct cosine ranking."""
    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("e")
    )
    vn = v.select("vec_id", "e", norm(F.col("e")).alias("ne"))
    seeds = (
        vn.filter(F.col("vec_id") >= N_QUERIES)
        .withColumn("h", F.xxhash64("vec_id", F.lit(7)))
        .orderBy("h")
        .limit(K_COARSE)
    )
    cells = seeds.select(
        F.row_number().over(Window.orderBy("h")).cast("int").alias("cell"),
        F.col("e").alias("ce"),
        F.col("ne").alias("nce"),
    )
    scored = vn.crossJoin(F.broadcast(cells)).select(
        "vec_id",
        "e",
        "cell",
        (dot(F.col("e"), F.col("ce")) / (F.col("ne") * F.col("nce"))).alias("csim"),
    )
    return cells, scored


def _ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k pipeline (shared by the bench entry and the recall gate).

    Every corpus vector is assigned to its most-similar centroid (its
    "cell"), and a query searches only the NPROBE cells whose centroids
    are closest to it, then exact-rescores.

    Scale design: the K_COARSE centroids are a broadcast (bytes), the
    cell assignment is one narrow map over the corpus scan, and the probe
    join is an equi-join on cell id — at 100 TB the corpus is written
    partitioned by cell (build_ivf_index / sim_ann_ivf_indexed, the
    literal implementation) so a query reads NPROBE/K_COARSE of the
    data."""
    _cells, scored = _ivf_scored(spark, sf_dir)
    # cell assignment as an aggregate argmax (MAX over (csim, cell) structs,
    # lexicographic → deterministic), NOT a row_number window: the aggregate
    # pre-reduces 16 candidate rows to 1 map-side before the exchange, so at
    # 100 TB the shuffle carries one row per vector instead of K_COARSE.
    best = scored.groupBy("vec_id").agg(
        F.max(F.struct(F.col("csim"), F.col("cell"))).alias("b"),
        F.first("e").alias("e"),  # constant per vec_id
    )
    assign = best.select("vec_id", "e", F.col("b.cell").alias("cell"))
    w_probe = Window.partitionBy("vec_id").orderBy(F.desc("csim"), "cell")
    probes = (
        scored.filter(F.col("vec_id") < N_QUERIES)
        .select("*", F.row_number().over(w_probe).alias("r"))
        .filter(F.col("r") <= NPROBE)
        .select(F.col("vec_id").alias("q_id"), F.col("e").alias("qe"), "cell")
    )
    cand = (
        assign.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("qe"), F.col("e")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        cand.select("*", F.row_number().over(w).cast("int").alias("rn"))
        .filter(F.col("rn") <= TOP_K)
        .orderBy("q_id", "rn")
    )


IVF_RECALL_BOUND = 0.30  # aggregate recall@10 floor (measured 0.41 at sf0.01)


@register(
    "sim_ann_ivf",
    oracle=f"""
    SELECT CAST({N_QUERIES} AS BIGINT) AS n_queries,
           {TOP_K} AS k,
           TRUE AS recall_ok
    """,
)
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a value-checked quality contract: the ANN result is
    compared IN-PLAN against the exact brute-force top-k twin, and the
    output is the aggregate recall@k bound (the standard ANN metric).
    Cell layout and per-query hits stay quantizer-specific — what the
    oracle pins is that every query ran (n_queries), at full depth (k),
    and the index recalls >= IVF_RECALL_BOUND of the true neighbors; an
    IVF regression (broken assignment, empty probes, lost candidates)
    drops recall to ~0 and flips the boolean. The exact twin runs at test
    scale only — at 100 TB you run the index, not the verification."""
    ivf = _ivf_topk(spark, sf_dir).select("q_id", "neighbor_id")
    exact = sim_topk_bruteforce(spark, sf_dir).select("q_id", "neighbor_id")
    hits = ivf.join(exact, ["q_id", "neighbor_id"], "inner")
    return hits.agg(
        F.lit(N_QUERIES).cast("long").alias("n_queries"),
        F.lit(TOP_K).alias("k"),
        (F.count("*") / (N_QUERIES * TOP_K) >= IVF_RECALL_BOUND).alias("recall_ok"),
    )


@register("sim_ann_ivf_topk", oracle=None)
def sim_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw IVF top-k output (bench entry: times the index search
    alone, without the exact-twin verification that sim_ann_ivf adds for
    the correctness gate). Rows-only: cell layout is quantizer-specific;
    result quality is gated by sim_ann_ivf's recall bound and
    tests/test_similarity.py."""
    return _ivf_topk(spark, sf_dir)


# ---------------- persisted IVF index (cell-partitioned table) ----------
_IVF_INDEX_CACHE: dict[tuple[str, str], str] = {}  # (appId, sf_dir) -> wh root
_IVF_INDEX_LOCK = threading.Lock()  # serialize check-then-build


def build_ivf_index(spark: SparkSession, sf_dir: str, wh_root: str):
    """Materialize the IVF index as warehouse tables — the 100 TB
    deployment shape the in-plan variant only described: the corpus is
    written ONCE `PARTITIONED BY (cell)` (hive layout + per-file footer
    bounds with min=max=cell), and the K_COARSE centroids as a
    metadata-sized side table. Serving then reads ONLY the probed cells'
    partitions (manifest-level file skipping — other cells' files are
    never listed). Build cost is one assignment pass over the corpus +
    one shuffle on cell; amortized across every future query batch.
    Returns the Warehouse. Idempotent per root."""
    from minio_iceberg_polaris_lakehouse_spark.warehouse import Warehouse

    wh = Warehouse(spark, wh_root)
    idx = wh.create_table(
        "ann", "ivf_index", "vec_id bigint, cell int, e array<double>",
        partition_by="cell", if_not_exists=True,
    )
    cent = wh.create_table(
        "ann", "ivf_centroids", "cell int, ce array<double>, nce double",
        if_not_exists=True,
    )
    # complete build = BOTH tables committed; a crash between the two
    # writes must not leave a half-built index that a retry then doubles
    # (duplicated centroids corrupt probe selection silently), so the
    # guard checks both and the writes are OVERWRITEs — unconditional
    # whole-table replacement, idempotent under any retry interleaving
    if idx.current_snapshot_id() and cent.current_snapshot_id():
        return wh
    cells, scored = _ivf_scored(spark, sf_dir)
    best = scored.groupBy("vec_id").agg(
        F.max(F.struct(F.col("csim"), F.col("cell"))).alias("b"),
        F.first("e").alias("e"),
    )
    assign = best.select("vec_id", F.col("b.cell").alias("cell"), "e")
    cent.overwrite(cells.select("cell", "ce", "nce"))
    # one file per cell: repartition on the partition column so each hive
    # dir holds a single parquet file (tight NPROBE/K_COARSE read ratio)
    idx.overwrite(assign.repartition("cell"))
    return wh


def _ivf_index_wh(spark: SparkSession, sf_dir: str):
    """Session-cached index build (temp warehouse per Spark app + SF)."""
    import tempfile

    key = (spark.sparkContext.applicationId, sf_dir)
    with _IVF_INDEX_LOCK:
        if key not in _IVF_INDEX_CACHE:
            _IVF_INDEX_CACHE[key] = tempfile.mkdtemp(prefix="lh_ivf_idx_")
        root = _IVF_INDEX_CACHE[key]
    return build_ivf_index(spark, sf_dir, root)


def ivf_indexed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serve IVF top-k from the PERSISTED cell-partitioned index.

    Planning mirrors Iceberg scan planning: score the (tiny) query set
    against the broadcast centroid table, take each query's NPROBE
    closest cells, and collect the DISTINCT probed cell ids
    (≤ K_COARSE ints — metadata-sized, the partition list a catalog
    would hand the scheduler). The data read is a union of per-cell
    partition-pruned scans — tests pin that it touches probed/K_COARSE
    of the index files — then the same broadcast equi-join rescore as
    the in-plan variant."""
    wh = _ivf_index_wh(spark, sf_dir)
    cent = wh.table("ann", "ivf_centroids").read()
    q = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("q_id"), as_double("embedding").alias("qe"))
        .select("q_id", "qe", norm(F.col("qe")).alias("nq"))
    )
    qscored = q.crossJoin(F.broadcast(cent)).select(
        "q_id",
        "qe",
        "cell",
        (dot(F.col("qe"), F.col("ce")) / (F.col("nq") * F.col("nce"))).alias("csim"),
    )
    w_probe = Window.partitionBy("q_id").orderBy(F.desc("csim"), "cell")
    probes = (
        qscored.select("*", F.row_number().over(w_probe).alias("r"))
        .filter(F.col("r") <= NPROBE)
        .select("q_id", "qe", "cell")
    )
    probed_cells = sorted(
        r.cell for r in probes.select("cell").distinct().collect()
    )  # ≤ K_COARSE ints: the partition list, driver-side by design
    idx = wh.table("ann", "ivf_index")
    if not probed_cells:  # query-less corpus — empty result, not IndexError
        return spark.createDataFrame(
            [], "q_id bigint, neighbor_id bigint, cosine double, rn int"
        )
    scans = [idx.scan(eq={"cell": c}) for c in probed_cells]
    corpus = scans[0]
    for s in scans[1:]:
        corpus = corpus.unionByName(s)
    cand = (
        corpus.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("qe"), F.col("e")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        cand.select("*", F.row_number().over(w).cast("int").alias("rn"))
        .filter(F.col("rn") <= TOP_K)
        .orderBy("q_id", "rn")
    )


@register(
    "sim_ann_ivf_indexed",
    oracle=f"""
    SELECT CAST({N_QUERIES} AS BIGINT) AS n_queries,
           {TOP_K} AS k,
           TRUE AS recall_ok
    """,
)
def sim_ann_ivf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted-index IVF variant under the same value-checked
    quality contract as sim_ann_ivf: recall@k vs the in-plan exact
    brute-force twin must clear IVF_RECALL_BOUND. The index build uses
    the identical quantizer/assignment formulas, so recall matches the
    in-plan variant; what this query additionally proves is the
    build→persist→partition-pruned-serve path end to end."""
    ann = ivf_indexed_topk(spark, sf_dir).select("q_id", "neighbor_id")
    exact = sim_topk_bruteforce(spark, sf_dir).select("q_id", "neighbor_id")
    hits = ann.join(exact, ["q_id", "neighbor_id"], "inner")
    return hits.agg(
        F.lit(N_QUERIES).cast("long").alias("n_queries"),
        F.lit(TOP_K).alias("k"),
        (F.count("*") / (N_QUERIES * TOP_K) >= IVF_RECALL_BOUND).alias("recall_ok"),
    )


LSH_RECALL_BOUND = 0.60  # recall@10 floor (multi-probe measured 0.86-0.88)


@register(
    "sim_ann_lsh",
    oracle=f"""
    SELECT CAST({N_QUERIES} AS BIGINT) AS n_queries,
           {TOP_K} AS k,
           TRUE AS recall_ok
    """,
)
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH ANN with the same value-checked quality contract as
    sim_ann_ivf: aggregate recall@k vs the in-plan exact brute-force twin
    must clear LSH_RECALL_BOUND. Bucket layout stays hash-family-specific;
    a broken pipeline (empty buckets, lost candidates) drops recall to ~0
    and flips the boolean."""
    lsh = _lsh_topk(spark, sf_dir).select("q_id", "neighbor_id")
    exact = sim_topk_bruteforce(spark, sf_dir).select("q_id", "neighbor_id")
    hits = lsh.join(exact, ["q_id", "neighbor_id"], "inner")
    return hits.agg(
        F.lit(N_QUERIES).cast("long").alias("n_queries"),
        F.lit(TOP_K).alias("k"),
        (F.count("*") / (N_QUERIES * TOP_K) >= LSH_RECALL_BOUND).alias("recall_ok"),
    )


@register("sim_ann_lsh_topk", oracle=None)
def sim_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw LSH top-k output (rows-only: bucketing is hash-family-specific;
    quality gated by sim_ann_lsh's recall bound and tests)."""
    return _lsh_topk(spark, sf_dir)


INT8_CAND_FACTOR = 3  # int8 prefilter keeps 3k candidates for exact rescore
INT8_RECALL_BOUND = 0.60  # recall@10 floor (measured 1.0 at sf0.001 and sf0.01)


def _int8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized ANN: quantize every embedding to int8 with one
    global symmetric scale (127 / max|x|, computed in-plan and broadcast),
    rank candidates by the integer dot product, keep the top
    INT8_CAND_FACTOR×k per query, then exact-rescore those in float and
    take the final top-k.

    Scale story: the int8 corpus is 4× smaller than float32 (16× vs
    float64), so the scan that dominates ANN cost moves 4-16× less data
    and the dot product runs on SIMD-friendly integers — the standard
    memory-bandwidth trade of quantized vector search. Ranking error from
    quantization is repaired by the exact rescore, whose cost is
    O(candidates), not O(corpus)."""
    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("e")
    )
    scale = v.agg(
        (F.lit(127.0) / F.max(F.array_max(F.transform("e", F.abs)))).alias("scale")
    )
    q8 = lambda e: F.transform(  # noqa: E731
        e,
        lambda x: F.least(
            F.greatest(F.round(x * F.col("scale")), F.lit(-127.0)), F.lit(127.0)
        ).cast("int"),
    )
    vq = v.crossJoin(F.broadcast(scale)).select(
        "vec_id", "e", q8(F.col("e")).alias("e8"), norm(F.col("e")).alias("ne")
    )
    q = vq.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("e").alias("qe"),
        F.col("e8").alias("qe8"),
        F.col("ne").alias("nq"),
    )
    idot = F.aggregate(
        F.zip_with(F.col("qe8"), F.col("e8"), lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        vq.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            "qe",
            "e",
            "nq",
            "ne",
            idot.alias("idot"),
        )
    )
    w_cand = Window.partitionBy("q_id").orderBy(F.desc("idot"), "neighbor_id")
    cand = (
        scored.select("*", F.row_number().over(w_cand).alias("cr"))
        .filter(F.col("cr") <= INT8_CAND_FACTOR * TOP_K)
        .select(
            "q_id",
            "neighbor_id",
            F.round(dot(F.col("qe"), F.col("e")) / (F.col("nq") * F.col("ne")), 6).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        cand.select("*", F.row_number().over(w).cast("int").alias("rn"))
        .filter(F.col("rn") <= TOP_K)
        .orderBy("q_id", "rn")
    )


@register(
    "sim_ann_int8",
    oracle=f"""
    SELECT CAST({N_QUERIES} AS BIGINT) AS n_queries,
           {TOP_K} AS k,
           TRUE AS recall_ok
    """,
)
def sim_ann_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 scalar-quantized ANN with the same value-checked quality
    contract as sim_ann_ivf/sim_ann_lsh: recall@k against the in-plan
    exact brute-force twin must clear INT8_RECALL_BOUND. The quantized
    dot-product ordering is scale-factor-specific, but a broken quantizer
    (overflow, clipped scale, lost candidates) drops recall to ~0 and
    flips the boolean the driver hashes."""
    ann = _int8_topk(spark, sf_dir).select("q_id", "neighbor_id")
    exact = sim_topk_bruteforce(spark, sf_dir).select("q_id", "neighbor_id")
    hits = ann.join(exact, ["q_id", "neighbor_id"], "inner")
    return hits.agg(
        F.lit(N_QUERIES).cast("long").alias("n_queries"),
        F.lit(TOP_K).alias("k"),
        (F.count("*") / (N_QUERIES * TOP_K) >= INT8_RECALL_BOUND).alias("recall_ok"),
    )


@register("sim_ann_int8_topk", oracle=None)
def sim_ann_int8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw int8-quantized top-k (rows-only: candidate order is
    scale-specific; quality gated by sim_ann_int8's recall bound)."""
    return _int8_topk(spark, sf_dir)


# ------- persisted LSH index with an EXACT cross-engine oracle (r11) ----
#
# The xxhash64 hyperplane family above is Spark-specific, so sim_ann_lsh
# could only ever be gated by a recall BOUND. This variant swaps in a
# seeded hash family both engines compute bit-identically with INTEGER
# arithmetic, making the ENTIRE trajectory — quantize → 48 projections →
# buckets → multi-probe → candidate dedup → exact rescore → top-k —
# value-hash replayable by DuckDB:
#   q[d]     = CAST(FLOOR(e[d] * 1024) AS BIGINT)   (×1024 is a power of
#              two: the double multiply is EXACT, so floor is too)
#   s(d, g)  = +1 if ((d*131 + g*137 + 11)^3 % 104729) % 2 else -1
#              (g = table*PLANES_PER_TABLE + plane; h^3 mod a prime mixes
#              the linear pattern; measured bit balance 0.43-0.55 and
#              recall@10 = 0.85 at sf0.01 — same range as the xxhash64
#              family's 0.86-0.88)
#   proj     = Σ_d q[d] * s(d, g)      (pure int64, |proj| < 2^31)
#   bucket_t = Σ_p (proj_{t,p} > 0) << p
# Quantizing to 1/1024 granularity only perturbs near-zero projections —
# LSH recall is statistically unchanged (measured above) — and buys
# cross-engine exactness no float fold order can.

LSHX_SCALE = 1024  # power of two → double multiply exact → floor exact


def _lshx_sign(d: Column, g: Column) -> Column:
    h = (d.cast("long") * 131 + g.cast("long") * 137 + 11).cast("long")
    return F.when((h * h * h) % 104729 % 2 == 1, F.lit(1).cast("long")).otherwise(
        F.lit(-1).cast("long")
    )


def lshx_signatures(v: DataFrame) -> DataFrame:
    """(vec_id, e) → (vec_id, table_id, bucket, e): the integer-exact
    signature of every vector, one row per hash table. All 48
    projections fold in ONE aggregate pass (the same
    CollapseProject-safe shape as _all_projections), with int64
    accumulators. Shared by the query pipeline, the index build, and
    the CDC-incremental index refresh (ann_maintain.refresh_lsh_index)
    so a maintained index row is bit-identical to a rebuilt one."""
    nsig = N_TABLES * PLANES_PER_TABLE
    zipped = F.zip_with(
        F.col("e"),
        F.sequence(F.lit(0), F.size(F.col("e")) - 1),
        lambda x, d: F.struct(
            F.floor(x * F.lit(float(LSHX_SCALE))).cast("long").alias("q"),
            d.alias("d"),
        ),
    )
    proj = F.aggregate(
        zipped,
        F.array_repeat(F.lit(0).cast("long"), nsig),
        lambda acc, el: F.transform(acc, lambda a, i: a + el.q * _lshx_sign(el.d, i)),
    )
    sigs = v.select("vec_id", "e", proj.alias("_proj")).select(
        "vec_id", "e", F.explode(lsh_buckets(F.col("_proj"))).alias("tb")
    )
    return sigs.select(
        "vec_id", "tb.table_id", F.col("tb.bucket").cast("int").alias("bucket"), "e"
    )


def _lshx_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lshx_signatures over the test corpus parquet."""
    return lshx_signatures(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", as_double("embedding").alias("e")
        )
    )


_LSH_INDEX_CACHE: dict[tuple[str, str], str] = {}  # (appId, sf_dir) -> wh root
_LSH_INDEX_LOCK = threading.Lock()


def build_lsh_index(spark: SparkSession, sf_dir: str, wh_root: str):
    """Materialize the LSH index as a warehouse table: the 48-projection
    signature pass over the corpus runs ONCE at build (the cost that
    dominates LSH at 100 TB), partitioned by table_id with files
    range-laid-out on bucket so footer bounds keep per-bucket probes
    tight. Idempotent per root (overwrite + committed-snapshot guard,
    same crash-retry contract as build_ivf_index)."""
    from minio_iceberg_polaris_lakehouse_spark.warehouse import Warehouse

    wh = Warehouse(spark, wh_root)
    idx = wh.create_table(
        "ann",
        "lsh_index",
        "vec_id bigint, table_id int, bucket int, e array<double>",
        partition_by="table_id",
        if_not_exists=True,
    )
    if idx.current_snapshot_id():
        return wh
    idx.overwrite(_lshx_sigs(spark, sf_dir).repartitionByRange("table_id", "bucket"))
    return wh


def _lsh_index_wh(spark: SparkSession, sf_dir: str):
    import tempfile

    key = (spark.sparkContext.applicationId, sf_dir)
    with _LSH_INDEX_LOCK:
        if key not in _LSH_INDEX_CACHE:
            _LSH_INDEX_CACHE[key] = tempfile.mkdtemp(prefix="lh_lsh_idx_")
        root = _LSH_INDEX_CACHE[key]
    return build_lsh_index(spark, sf_dir, root)


def lsh_indexed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serve LSH top-k from the PERSISTED signature index: the query set
    (8 vectors) hashes in-plan with the same integer family, expands to
    the multi-probe set (own bucket + every 1-bit flip), and candidates
    come from a broadcast equi-join on (table_id, bucket) against the
    index — the corpus-side signature pass is never re-run. Exact
    rescore on the float embeddings stored alongside the signatures,
    ROUND(cosine, 6) with neighbor_id tiebreak (the proven
    engine-independent ordering of sim_topk_bruteforce)."""
    wh = _lsh_index_wh(spark, sf_dir)
    idx = wh.table("ann", "lsh_index").read()
    qsigs = _lshx_sigs(spark, sf_dir).filter(F.col("vec_id") < N_QUERIES)
    probes = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(PLANES_PER_TABLE)],
    )
    q = qsigs.select(
        F.col("vec_id").alias("q_id"),
        F.col("e").alias("qe"),
        "table_id",
        F.explode(probes).alias("bucket"),
    )
    # r13 (guide §2.2): compute the rounded cosine BEFORE the pair dedup.
    # dropDuplicates on rows still carrying qe/e aggregated first() over
    # two 64-double arrays (SortAggregate, ~1 KB/row through the
    # exchange); every duplicate of a (q_id, neighbor_id) pair has the
    # same qe/e and hence the same cosine, so min(cosine) over the pair
    # is that value — a partial-aggregating HashAggregate shuffling one
    # double per pair instead of both vectors.
    cand = (
        idx.join(F.broadcast(q), ["table_id", "bucket"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("qe"), F.col("e")), 6).alias("cosine"),
        )
        .groupBy("q_id", "neighbor_id")
        .agg(F.min("cosine").alias("cosine"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        cand.select("*", F.row_number().over(w).cast("int").alias("rn"))
        .filter(F.col("rn") <= TOP_K)
        .orderBy("q_id", "rn")
    )


_LSHX_SIGN_SQL = (
    "(CASE WHEN ((d*131 + {g}*137 + 11)*(d*131 + {g}*137 + 11)"
    "*(d*131 + {g}*137 + 11)) % 104729 % 2 = 1 THEN 1 ELSE -1 END)"
)

_LSHX_ORACLE = f"""
    WITH v AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
               list_transform(embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * {LSHX_SCALE}) AS BIGINT)) AS q
        FROM embeddings),
    g AS (SELECT CAST(gs AS BIGINT) AS g,
                 CAST(gs // {PLANES_PER_TABLE} AS INT) AS table_id,
                 CAST(gs % {PLANES_PER_TABLE} AS INT) AS plane
          FROM range({N_TABLES * PLANES_PER_TABLE}) t(gs)),
    proj AS (
        SELECT v.vec_id, g.table_id, g.plane,
               CAST(list_sum(list_transform(range({EMB_DIM}),
                   d -> q[d+1] * {_LSHX_SIGN_SQL.format(g="g.g")})) AS BIGINT) AS s
        FROM v CROSS JOIN g),
    sig AS (
        SELECT vec_id, table_id,
               CAST(SUM(CASE WHEN s > 0 THEN 1 << plane ELSE 0 END) AS INT) AS bucket
        FROM proj GROUP BY vec_id, table_id),
    probes AS (
        SELECT s.vec_id AS q_id, s.table_id, u.b AS bucket
        FROM sig s, UNNEST([s.bucket,
            {", ".join(f"xor(s.bucket, {1 << p})" for p in range(PLANES_PER_TABLE))}
        ]) AS u(b)
        WHERE s.vec_id < {N_QUERIES}),
    cand AS (
        SELECT DISTINCT p.q_id, s.vec_id AS neighbor_id
        FROM probes p
        JOIN sig s ON s.table_id = p.table_id AND s.bucket = p.bucket
        WHERE s.vec_id <> p.q_id),
    scored AS (
        SELECT c.q_id, c.neighbor_id,
               ROUND(list_sum(list_transform(list_zip(qv.e, nv.e), p -> p[1] * p[2]))
                     / (sqrt(list_sum(list_transform(qv.e, x -> x * x)))
                        * sqrt(list_sum(list_transform(nv.e, x -> x * x)))), 6) AS cosine
        FROM cand c
        JOIN v qv ON qv.vec_id = c.q_id
        JOIN v nv ON nv.vec_id = c.neighbor_id),
    ranked AS (
        SELECT q_id, neighbor_id, cosine,
               ROW_NUMBER() OVER (PARTITION BY q_id
                                  ORDER BY cosine DESC, neighbor_id) AS rn
        FROM scored)
    SELECT q_id, neighbor_id, cosine, CAST(rn AS INT) AS rn
    FROM ranked WHERE rn <= {TOP_K}
    ORDER BY q_id, rn
"""


@register("sim_ann_lsh_indexed", oracle=_LSHX_ORACLE)
def sim_ann_lsh_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH ANN served from the persisted signature index, with the FULL
    top-k rows value-hashed against a DuckDB oracle that replays the
    identical trajectory — the exact-oracle LSH evidence the recall-gated
    sim_ann_lsh cannot give (its xxhash64 family is Spark-only). The
    oracle recomputes signatures from the raw table while Spark serves
    them from the index, so the hash ALSO proves build→persist→serve
    loses nothing."""
    return lsh_indexed_topk(spark, sf_dir)
