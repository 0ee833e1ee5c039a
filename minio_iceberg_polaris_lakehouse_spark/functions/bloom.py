"""Bloom-filter decontamination — the benchmark-leakage REMOVAL pass of a
training-data pipeline (the reverse direction of `text_contamination`,
which audits the eval side): drop/flag every TRAINING document that
contains any shingle of the held-out eval suite.

Why a Bloom filter at all: at 100 TB the training corpus has ~10^12
shingles while the benchmark suite has ~10^5-10^6, so the right plan is
"ship a tiny summary of the eval set to every executor and reject almost
every training shingle scan-locally, without a shuffle".  A Bloom filter
is that summary: `M_BITS` bits (128 KiB here), built with ONE map-side
partially-aggregated `bit_or` over the eval shingles, then folded into
the scan as a literal bitset (a broadcast variable in cluster terms).
Membership tests run inside whole-stage codegen — `element_at` on the
literal array + bitwise AND — so the per-shingle prefilter costs no
Python, no join, no shuffle.

Exactness: a Bloom filter has NO false negatives, so every genuinely
contaminated shingle survives the prefilter; the survivors (true hits +
the small false-positive tail) are then confirmed by an exact broadcast
semi-join against the distinct eval shingle set.  The final answer is
therefore bit-identical to the naive full join — which is exactly what
the DuckDB oracle computes — while the expensive exact join only ever
sees the Bloom-positive fraction of the corpus.

Reference scope: the reference lakehouse curates training corpora with
plain Spark SQL joins (workspace/notebooks, warehouse_helpers.py); this
module is the scale path for the same decontamination semantics.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from minio_iceberg_polaris_lakehouse_spark.operators.dedup import hashed_shingles, tokens_expr
from minio_iceberg_polaris_lakehouse_spark.registry import register
from minio_iceberg_polaris_lakehouse_spark.sources.tables import (
    load_table,
    materialize_once,
)

M_BITS = 1 << 20  # filter width: 128 KiB — broadcastable at any corpus size
M_WORDS = M_BITS // 64
K_HASHES = 4

# 1L << n for n in 0..63 as a literal lookup array (shiftleft() takes only a
# literal shift amount, so a column-indexed shift goes through element_at).
_POW2 = [1 << i for i in range(63)] + [-(1 << 63)]


def _hash_pair(s: Column) -> tuple[Column, Column]:
    """Two independent 31-bit hashes from one xxhash64 shingle hash, for
    Kirsch-Mitzenmacher double hashing (h2 forced odd so the k probe
    positions never collapse onto one bit)."""
    h1 = F.shiftrightunsigned(s, 33)
    h2 = s.bitwiseAND(F.lit(0x7FFFFFFF)).bitwiseOR(F.lit(1))
    return h1, h2


def _positions(s: Column) -> list[Column]:
    """The K_HASHES bit positions of shingle hash `s` (all < M_BITS)."""
    h1, h2 = _hash_pair(s)
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(M_BITS)) for i in range(K_HASHES)]


def build_bloom_bits(shingle_hashes: DataFrame, col: str = "s") -> list[int]:
    """Aggregate a Bloom bitset over a DataFrame of int64 shingle hashes:
    explode each hash to its K_HASHES bit positions, fold into 64-bit words
    with a map-side-partial `bit_or`, and collect the (tiny, <= M_WORDS
    rows) result.  Returns the dense word list, driver-side."""
    pos = shingle_hashes.select(
        F.explode(F.array(*_positions(F.col(col)))).alias("pos")
    )
    words = (
        pos.select(
            F.floor(F.col("pos") / 64).cast("int").alias("w"),
            F.element_at(F.lit(_POW2).cast("array<long>"), F.pmod(F.col("pos"), 64).cast("int") + 1).alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
        .collect()
    )
    dense = [0] * M_WORDS
    for r in words:
        dense[r["w"]] = r["bits"]
    return dense


def bloom_contains(bits_col: Column, s: Column, pow2_col: Column | None = None) -> Column:
    """JVM-side membership test of shingle hash `s` against a bitset
    column: true iff all K_HASHES probed bits are set. Pass ``pow2_col``
    (an array<long> attribute holding 1<<0..1<<63) when probing in a hot
    path — a literal lookup table inlined into a lambda re-materializes
    per probe."""
    if pow2_col is None:
        pow2_col = F.lit(_POW2).cast("array<long>")
    checks = []
    for pos in _positions(s):
        word = F.element_at(bits_col, F.floor(pos / 64).cast("int") + 1)
        mask = F.element_at(pow2_col, F.pmod(pos, 64).cast("int") + 1)
        checks.append(word.bitwiseAND(mask) != 0)
    return reduce(lambda a, b: a & b, checks)


def decontaminate(spark: SparkSession, sf_dir: str, use_bloom: bool = True) -> DataFrame:
    """Per-training-doc eval-shingle hit counts, exact.  With
    ``use_bloom`` the exact join input is pre-thinned scan-locally by the
    Bloom bitset (identical results — no false negatives); without it the
    naive full join runs (the test twin)."""
    d = load_table(spark, sf_dir, "documents")
    if not use_bloom:
        sh = d.select("doc_id", tokens_expr().alias("toks")).select(
            "doc_id", hashed_shingles("toks").alias("shingles")
        )
    else:
        # ONE shingle pass for the whole operator (guide §8: compute the
        # lightweight proxy once, reuse it for every decision). Through
        # r11 the shingle subtree ran three times — eagerly for the
        # bitset build, and twice more inside the exec plan (ev broadcast
        # + tr probe side) — and the repeated subtree was ALSO quietly
        # quadratic: CollapseProject inlines tokens_expr into the explode
        # path, re-splitting per shingle reference (the module-header
        # anti-pattern; measured 0.94 s to shingle the 10% eval slice vs
        # 0.21 s for the full corpus as arrays). The repartition is an
        # optimizer barrier AND spreads an unsplittable small scan
        # (guide §2.5); materialize_once cuts the plan once per invocation
        # for the (doc_id, shingles) proxy — at 100 TB this is the
        # fingerprint-pass-writes-out shape of guide §8.1-8.4.
        sh = materialize_once(
            d.select("doc_id", tokens_expr().alias("toks"))
            .repartition(spark.sparkContext.defaultParallelism)
            .select("doc_id", hashed_shingles("toks").alias("shingles"))
        )
    ev = (
        sh.filter(F.col("doc_id") % 10 == 0)
        .select(F.explode("shingles").alias("s"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    tr = sh.filter(F.col("doc_id") % 10 != 0).select(
        "doc_id", "shingles", F.size("shingles").alias("n_shingles")
    )
    if use_bloom:
        # Ship the bitset as a ONE-ROW broadcast side (the engine's
        # standard scalar fan-out shape) rather than a 16K-element
        # literal: a literal CreateArray inlined into the filter lambda
        # re-materializes per probe (measured ~6× slower end-to-end at
        # sf0.1), while a broadcast attribute is built once per executor.
        # (An in-plan bitset — map_from_entries folded to a dense array in
        # a 1-row aggregate — re-hit the same inlining class: 17.9 s at
        # sf0.1. The driver-materialized literal row stays.)
        # bit_or is idempotent, so the bitset build skips ev's DISTINCT
        # (one exchange less); the exact join below keeps it.
        bits_df = spark.createDataFrame(
            [
                (
                    build_bloom_bits(
                        sh.filter(F.col("doc_id") % 10 == 0).select(
                            F.explode("shingles").alias("s")
                        )
                    ),
                    _POW2,
                )
            ],
            "bits array<long>, pow2 array<long>",
        )
        # Thin each doc's shingle ARRAY in-scan (codegen, no shuffle);
        # explode_outer keeps all-negative docs alive with a NULL probe so
        # one aggregation emits every training doc.
        tr = tr.crossJoin(F.broadcast(bits_df)).withColumn(
            "cand",
            F.filter(
                "shingles", lambda s: bloom_contains(F.col("bits"), s, F.col("pow2"))
            ),
        )
    else:
        tr = tr.withColumn("cand", F.col("shingles"))
    probe = tr.select(
        "doc_id", "n_shingles", F.explode_outer("cand").alias("s")
    )
    agg = (
        probe.join(F.broadcast(ev), "s", "left")
        .groupBy("doc_id", "n_shingles")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_eval_hits"))
    )
    return agg.select(
        "doc_id",
        F.col("n_shingles").cast("long").alias("n_shingles"),
        F.col("n_eval_hits").cast("long").alias("n_eval_hits"),
        (F.col("n_eval_hits") > 0).alias("flagged"),
    ).orderBy("doc_id")


@register(
    "text_bloom_decontaminate",
    oracle="""
    WITH sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, greatest(len(regexp_split_to_array(trim(lower(text)), '\\s+')) - 2, 1)),
                   i -> concat_ws(' ',
                        regexp_split_to_array(trim(lower(text)), '\\s+')[i],
                        regexp_split_to_array(trim(lower(text)), '\\s+')[i+1],
                        regexp_split_to_array(trim(lower(text)), '\\s+')[i+2]))) AS shingles
        FROM documents),
    ev AS (SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id % 10 = 0),
    tr AS (SELECT doc_id, len(shingles) AS n_shingles, unnest(shingles) AS s
           FROM sh WHERE doc_id % 10 <> 0),
    hit AS (
        SELECT tr.doc_id, ANY_VALUE(tr.n_shingles) AS n_shingles,
               SUM(CASE WHEN ev.s IS NOT NULL THEN 1 ELSE 0 END) AS n_eval_hits
        FROM tr LEFT JOIN ev ON tr.s = ev.s
        GROUP BY tr.doc_id)
    SELECT doc_id,
           CAST(n_shingles AS BIGINT) AS n_shingles,
           CAST(n_eval_hits AS BIGINT) AS n_eval_hits,
           n_eval_hits > 0 AS flagged
    FROM hit
    ORDER BY doc_id
    """,
)
def text_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-set decontamination against the held-out eval slice
    (doc_id % 10 == 0): exact per-doc eval-shingle hit counts, with the
    Bloom bitset thinning the exact join scan-locally.  The oracle is the
    NAIVE full join — hash equality proves the prefilter dropped nothing.
    """
    return decontaminate(spark, sf_dir, use_bloom=True)
