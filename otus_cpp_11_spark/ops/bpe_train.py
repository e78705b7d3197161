"""In-engine BPE tokenizer TRAINING: the full merge-table lifecycle lives
in the engine — train here, freeze (scripts/train_bpe.py uses this same
loop), apply with queries/bpe.py's Arrow encoder.

Split of labor at scale (the same pattern as the PQ codebook,
queries/similarity.py): the CORPUS-sized work — explode words, count
frequencies — is one distributed aggregate; the merge loop itself is
inherently rank-sequential (merge k+1's counts depend on merge k having
been applied), so it runs over the collected word-frequency vocab, which
is a BOUNDED model artifact (vocab grows ~log corpus; the collect is
capped and asserted, and production trainers additionally cut the
frequency tail — a min_frequency knob — because a rare word's counts
cannot win an argmax round). This is how real tokenizer trainers are
built: a distributed counting pass feeding a single-node merge loop.

``bpe_pair_counts`` (queries/curation.py) is the oracle-gated
distributed face of one counting round; ``tests/test_bpe.py`` proves
this trainer reproduces BOTH frozen tables (the 32-rule corpus table and
the 1024-rule production table) byte-for-byte from their corpus recipes.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_TRAIN_VOCAB = 1_000_000  # collect guard: the vocab is a model artifact


def train_merges(word_freqs: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """Classic BPE training loop: argmax adjacent-pair frequency over the
    word-frequency vocab, ties broken (count DESC, pair ASC) — a total,
    engine-independent order. Every produced rule's constituents are
    single chars or outputs of earlier rules BY CONSTRUCTION (the closure
    property queries/bpe.py's chain/greedy equivalence proof rests on,
    re-checked mechanically in tests/test_bpe.py)."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, f in word_freqs.items():
        t = tuple(w)
        vocab[t] = vocab.get(t, 0) + f
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for toks, f in vocab.items():
            for pair in zip(toks, toks[1:]):
                pc[pair] += f
        if not pc:
            break
        (x, y), _n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((x, y))
        new_vocab: dict[tuple[str, ...], int] = {}
        for toks, f in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(toks):
                if i < len(toks) - 1 and toks[i] == x and toks[i + 1] == y:
                    out.append(x + y)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + f
        vocab = new_vocab
    return merges


def train_bpe_from_corpus(
    words: DataFrame,
    n_merges: int,
    min_frequency: int = 1,
    max_vocab: int = MAX_TRAIN_VOCAB,
) -> list[tuple[str, str]]:
    """Train a merge table from a (word) relation: ONE distributed
    word-count aggregate (the corpus-sized pass — at 100 TB this is the
    whole cost), then the rank-sequential merge loop over the collected
    bounded vocab. ``min_frequency`` is the production tail cut: at web
    scale the TRUE vocab has a billion-entry typo tail whose counts can
    never win an argmax round at any realistic merge budget; cutting it
    bounds the collect without changing the trained table for budgets
    where winning pairs clear the threshold."""
    wc = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= min_frequency)
    )
    rows = wc.collect()
    if len(rows) > max_vocab:
        raise ValueError(
            f"training vocab {len(rows)} exceeds the {max_vocab} collect "
            "guard: raise min_frequency (the tail cut) before training"
        )
    return train_merges({r["word"]: r["n"] for r in rows}, n_merges)
