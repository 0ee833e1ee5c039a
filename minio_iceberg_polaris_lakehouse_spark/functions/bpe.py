"""BPE tokenizer TRAINING (EXT scope, SURVEY.md §2.14 X5): the actual
merge-pair loop of byte-pair encoding (Sennrich, Haddow & Birch, ACL
2016 — public paper), distributed the way production tokenizer training
distributes it.

The loop is the textbook iterative algorithm SQL cannot express (each
iteration's input depends on the previous merge), so this query is
registered rows-only by declared design; correctness is pinned instead
by tests/test_bpe.py, which replays an independent pure-Python reference
BPE over the collected corpus and requires the SAME merge table,
rank-for-rank.

Distribution shape (what survives 100 TB):
- Training operates on the DISTINCT-WORD × frequency table, not the
  corpus: one corpus-sized wordcount shuffle up front (map-side
  combined), then every iteration touches rows = |vocabulary|.
- Per iteration: adjacent symbol pairs explode from each word (weighted
  by word freq) → map-side-combined count → the argmax pair comes back
  as ONE row (TakeOrdered, no global sort); the merge application is an
  Arrow-batched kernel over the distinct words with the 2-string pair in
  the closure.
- The word table is eagerly localCheckpoint'ed every iteration (lineage
  truncation — chained plans otherwise grow without bound, the standard
  iterative-algorithm OOM on Spark); 30 merges = 30 metadata-sized
  driver round-trips, each O(|vocab|) executor work.

Determinism: ties on pair frequency break lexicographically, so the
merge table is a pure function of the corpus on any cluster layout.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from minio_iceberg_polaris_lakehouse_spark.registry import register
from minio_iceberg_polaris_lakehouse_spark.sources.tables import load_table

N_MERGES = 30
END_OF_WORD = "</w>"


def word_freqs(docs: DataFrame) -> DataFrame:
    """Distinct lowercase whitespace words with corpus frequencies — the
    only corpus-sized pass in the whole training run."""
    return (
        docs.select(
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def _init_symbols():
    def init(words: pd.Series) -> pd.Series:
        return pd.Series([list(w) + [END_OF_WORD] for w in words])

    return F.pandas_udf(init, ArrayType(StringType()))


def _merge_pair(a: str, b: str):
    """Arrow-batched application of one merge rule: every adjacent
    (a, b) in a symbol sequence becomes the single symbol a+b
    (left-to-right, non-overlapping — the reference algorithm's order)."""

    def merge(seqs: pd.Series) -> pd.Series:
        out = []
        for seq in seqs:
            merged, i, n = [], 0, len(seq)
            while i < n:
                if i + 1 < n and seq[i] == a and seq[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(seq[i])
                    i += 1
            out.append(merged)
        return pd.Series(out)

    return F.pandas_udf(merge, ArrayType(StringType()))


def train_bpe(spark: SparkSession, docs: DataFrame, n_merges: int = N_MERGES) -> DataFrame:
    """Run the merge loop; returns the merge table
    (rank, left, right, pair_freq) — the artifact a tokenizer ships."""
    words = word_freqs(docs).select(
        "freq", _init_symbols()(F.col("word")).alias("sym")
    )
    # localCheckpoint (eager) instead of cache: it materializes AND
    # truncates the plan lineage. Thirty chained merge plans otherwise
    # grow the logical tree without bound — a vanilla 1 GB driver OOMs
    # around iteration 20 just STRINGIFYING the plan (the standard
    # iterative-algorithm failure mode on Spark).
    words = words.repartition(spark.sparkContext.defaultParallelism).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs = (
            words.select(
                "freq",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("sym"), 1, F.size("sym") - 1),
                        F.slice(F.col("sym"), 2, F.size("sym") - 1),
                        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").cast("long").alias("pf"))
            .orderBy(F.desc("pf"), "a", "b")
            .limit(1)
            .collect()
        )
        if not pairs or pairs[0].pf < 2:
            break  # vocabulary exhausted — nothing left worth merging
        best = pairs[0]
        merges.append((rank, best.a, best.b, int(best.pf)))
        words = words.select(
            "freq", _merge_pair(best.a, best.b)(F.col("sym")).alias("sym")
        ).localCheckpoint()
    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_freq bigint"
    )


@register("text_bpe_train", oracle=None)
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE merge table learned from the documents corpus (30 merges,
    deterministic tie-breaks). Rows-only by declared design — the merge
    loop is iterative, not SQL-expressible; tests/test_bpe.py pins the
    table against an independent pure-Python reference implementation."""
    d = load_table(spark, sf_dir, "documents")
    return train_bpe(spark, d).orderBy("rank")


def _encode_words(merge_ranks: dict[tuple[str, str], int]):
    """Arrow-batched encode of DISTINCT words under a trained merge
    table: repeatedly apply the lowest-rank merge present anywhere in
    the word (left-to-right, non-overlapping — identical application to
    training's _merge_pair, so an in-corpus word encodes to exactly its
    final training-time state); returns the token count. The ranks dict
    rides the closure — a broadcast variable in cluster terms, the same
    way a shipped tokenizer file is distributed to workers."""

    def enc(words: pd.Series) -> pd.Series:
        out = []
        for w in words:
            seq = list(w) + [END_OF_WORD]
            while len(seq) > 1:
                best_rank, best_pair = None, None
                for i in range(len(seq) - 1):
                    r = merge_ranks.get((seq[i], seq[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best_pair = r, (seq[i], seq[i + 1])
                if best_pair is None:
                    break
                a, b = best_pair
                merged, i = [], 0
                while i < len(seq):
                    if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                        merged.append(a + b)
                        i += 2
                    else:
                        merged.append(seq[i])
                        i += 1
                seq = merged
            out.append(len(seq))
        return pd.Series(out)

    return F.pandas_udf(enc, "int")


def encode_bpe(
    spark: SparkSession, docs: DataFrame, merges: list[tuple[int, str, str]]
) -> DataFrame:
    """Tokenize documents with a TRAINED merge table — the encode half of
    the tokenizer loop (train_bpe is the other). Returns per-doc
    (doc_id, n_words, n_bpe_tokens), ordered by doc_id.

    Scale shape: the Python merge loop runs once per DISTINCT word
    (vocabulary-sized, Arrow-batched), never per occurrence — the
    corpus-sized work is the word explode and one join of occurrences
    against the word→token-count map (broadcastable for real
    vocabularies: even 10M distinct words is a few hundred MB), then a
    map-side-combined per-doc sum. This is how production pipelines
    count training tokens over 100 TB without running the tokenizer on
    every byte."""
    ranks = {(left, right): rank for rank, left, right in merges}
    words = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("word"),
    )
    toks = (
        words.select("word")
        .distinct()
        .withColumn("n_toks", _encode_words(ranks)(F.col("word")))
    )
    return (
        words.join(F.broadcast(toks), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("n_toks").cast("long").alias("n_bpe_tokens"),
        )
        .orderBy("doc_id")
    )


@register("text_bpe_apply", oracle=None)
def text_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-encode: the 30-merge table learned from the corpus
    (text_bpe_train) applied back to tokenize it — per-doc word and BPE
    token counts. Rows-only by declared design (the trained artifact is
    the output of an iterative algorithm); tests/test_bpe.py pins the
    encoder against an independent pure-Python replay and the
    train→encode composition against the trainer's own final state."""
    d = load_table(spark, sf_dir, "documents")
    merges = [
        (r.rank, r.left, r.right) for r in train_bpe(spark, d).orderBy("rank").collect()
    ]
    return encode_bpe(spark, d, merges)
