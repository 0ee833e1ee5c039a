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
