"""BPE training: the distributed merge loop must reproduce an
independent pure-Python reference implementation rank-for-rank."""

from __future__ import annotations

from collections import Counter

from minio_iceberg_polaris_lakehouse_spark.functions.bpe import (
    END_OF_WORD,
    train_bpe,
    word_freqs,
)
from minio_iceberg_polaris_lakehouse_spark.sources.tables import load_table


def reference_bpe(word_freq: dict[str, int], n_merges: int):
    """Textbook BPE (Sennrich et al. 2016), driver-side: same tie-breaks
    (freq desc, then (a, b) lexicographic), same stop rule (pf < 2)."""
    vocab = {tuple(list(w) + [END_OF_WORD]): f for w, f in word_freq.items()}
    merges = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for seq, f in vocab.items():
            for i in range(len(seq) - 1):
                pairs[(seq[i], seq[i + 1])] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), pf = best
        if pf < 2:
            break
        merges.append((rank, a, b, pf))
        new_vocab = {}
        for seq, f in vocab.items():
            merged, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(seq[i])
                    i += 1
            new_vocab[tuple(merged)] = new_vocab.get(tuple(merged), 0) + f
        vocab = new_vocab
    return merges


def test_bpe_matches_reference_implementation(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(150)
    wf = {r.word: r.freq for r in word_freqs(d).collect()}
    expect = reference_bpe(wf, 12)
    got = [
        (r.rank, r.left, r.right, r.pair_freq)
        for r in train_bpe(spark, d, n_merges=12).orderBy("rank").collect()
    ]
    assert got == expect
    assert len(got) > 0


def test_bpe_deterministic_across_partitionings(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(60)
    a = train_bpe(spark, d, n_merges=6).collect()
    b = train_bpe(spark, d.repartition(17), n_merges=6).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_bpe_merges_compose(spark, sf_dir):
    """Later merges may consume earlier merge outputs (that's the point
    of the loop): at least one learned symbol should span more than two
    characters once the </w> marker is stripped."""
    d = load_table(spark, sf_dir, "documents").limit(150)
    rows = train_bpe(spark, d, n_merges=12).collect()
    joined = [r.left + r.right for r in rows]
    assert any(len(s.replace(END_OF_WORD, "")) > 2 for s in joined)
    # ranks are dense from 0
    assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == list(range(len(rows)))


def reference_encode(word: str, merges: list[tuple[int, str, str]]) -> list[str]:
    """Textbook BPE encode: apply merges in rank order, each applied
    left-to-right non-overlapping across the whole word."""
    seq = list(word) + [END_OF_WORD]
    for _rank, a, b in merges:
        merged, i = [], 0
        while i < len(seq):
            if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                merged.append(a + b)
                i += 2
            else:
                merged.append(seq[i])
                i += 1
        seq = merged
    return seq


def test_encode_matches_reference_and_training_state(spark, sf_dir):
    """encode_bpe's lowest-rank-present loop must equal the textbook
    rank-order application for every corpus word, and the per-doc token
    counts must follow."""
    from minio_iceberg_polaris_lakehouse_spark.functions.bpe import encode_bpe

    d = load_table(spark, sf_dir, "documents").limit(120)
    merges = [
        (r.rank, r.left, r.right)
        for r in train_bpe(spark, d, n_merges=12).orderBy("rank").collect()
    ]
    got = {r.doc_id: (r.n_words, r.n_bpe_tokens) for r in encode_bpe(spark, d, merges).collect()}
    import re as _re

    for row in d.select("doc_id", "text").collect():
        words = _re.split(r"\s+", row.text.strip().lower())
        n_toks = sum(len(reference_encode(w, merges)) for w in words)
        assert got[row.doc_id] == (len(words), n_toks), f"doc {row.doc_id}"


def test_encode_unseen_words_fall_back_to_characters(spark):
    from minio_iceberg_polaris_lakehouse_spark.functions.bpe import encode_bpe

    docs = spark.createDataFrame(
        [(0, "xyzzy"), (1, "ab ab")], "doc_id long, text string"
    )
    # merge table that only knows ('a','b')
    merges = [(0, "a", "b")]
    got = {r.doc_id: r.n_bpe_tokens for r in encode_bpe(spark, docs, merges).collect()}
    assert got[0] == len("xyzzy") + 1  # chars + </w>, nothing merges
    assert got[1] == 2 * 2  # each 'ab' -> ['ab', '</w>']


def test_encode_partitioning_independent(spark, sf_dir):
    from minio_iceberg_polaris_lakehouse_spark.functions.bpe import encode_bpe

    d = load_table(spark, sf_dir, "documents").limit(60)
    merges = [
        (r.rank, r.left, r.right)
        for r in train_bpe(spark, d, n_merges=8).orderBy("rank").collect()
    ]
    one = sorted(map(tuple, encode_bpe(spark, d, merges).collect()))
    many = sorted(map(tuple, encode_bpe(spark, d.repartition(13), merges).collect()))
    assert one == many
