"""Byte-pair-encoding tokenizer training and application (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units" —
public literature; the algorithm every GPT/Llama-style tokenizer builds on).

Spark-first decomposition:
- word counting is a distributed groupBy (full corpus, one shuffle);
- the merge LOOP runs driver-side on the bounded top-K word-frequency
  table — like IVF/PQ codebook training, cost is constant w.r.t. corpus
  size and the result (an ordered list of merge pairs) broadcasts as a
  tiny closure;
- APPLYING the merges is distributed again: segment each DISTINCT word
  once in an Arrow-batched map (word count is corpus-bounded, distinct
  words grow ~Heaps' law), then broadcast-join the per-word subword count
  back onto the corpus. Python only touches distinct words, never the
  full token stream.

The reference has no tokenizer surface (extension op); the regex-based
`bpe_token_budget` in functions/text.py stays as the cheap JVM-only proxy.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: end-of-word sentinel (standard BPE: lets merges distinguish suffixes).
EOW = "</w>"

#: hard cap on the driver-side word-frequency table: ~100k short rows is
#: megabytes; anything a caller "needs" beyond this belongs in a
#: distributed algorithm, not a bigger collect().
MAX_DRIVER_VOCAB = 100_000


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word) + (EOW,)


def train_bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 40,
    top_words: int = 2000,
) -> list[tuple[str, str]]:
    """Learn an ordered BPE merge list from the corpus.

    Deterministic end to end: the frequency table is the top ``top_words``
    words by (count DESC, word ASC); each round merges the most frequent
    adjacent symbol pair, ties broken by lexicographically smallest pair —
    so the same corpus always yields the same merges on any engine.
    """
    if top_words > MAX_DRIVER_VOCAB:
        raise ValueError(
            f"top_words={top_words} exceeds the driver-safe cap "
            f"{MAX_DRIVER_VOCAB}: the vocab table is collect()ed — at 100 TB "
            "an unbounded request here is a driver OOM, not a bigger model"
        )
    rows = (
        docs.select(F.explode(F.split(F.col(text_col), " +")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .count()
        .orderBy(F.desc("count"), F.asc("w"))
        .limit(top_words)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {_word_symbols(r["w"]): int(r["count"]) for r in rows}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for word, c in vocab.items():
            for i in range(len(word) - 1):
                pairs[(word[i], word[i + 1])] += c
        if not pairs:
            break
        best_count = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == best_count)
        merges.append(best)
        a, b = best
        ab = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for word, c in vocab.items():
            out = []
            i = 0
            while i < len(word):
                if i + 1 < len(word) and word[i] == a and word[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word — always merge the LOWEST-rank
    (earliest-learned) pair present, exactly like training did."""
    symbols = list(_word_symbols(word))
    while len(symbols) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(symbols) - 1):
            r = ranks.get((symbols[i], symbols[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
    return symbols


def segment_words_df(
    words: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "w",
) -> DataFrame:
    """Distributed application: (word) → (word, n_subwords) via an
    Arrow-batched map; ``merges`` travels as a closure literal."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    word_col: pdf[word_col],
                    "n_subwords": [
                        len(segment_word(str(w), ranks)) for w in pdf[word_col]
                    ],
                }
            )

    return words.select(word_col).mapInPandas(run, f"{word_col} string, n_subwords int")


def bpe_corpus_stats(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-group subword economics of a trained BPE: documents → words
    (JVM split/explode), distinct words segmented ONCE (Python touches
    |vocab|, not |corpus|), broadcast-joined back, then one aggregate.
    compression_e3 = 1000·subwords/words as an exact integer."""
    words = (
        docs.select(F.col(group_col), F.explode(F.split(F.col(text_col), " +")).alias("w"))
        .filter(F.col("w") != "")
    )
    seg = segment_words_df(words.select("w").distinct(), merges)
    joined = words.join(F.broadcast(seg), "w")
    return joined.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("n_subwords").alias("n_subwords"),
        (F.lit(1000) * F.sum("n_subwords") / F.count(F.lit(1)))
        .cast("bigint")
        .alias("compression_e3"),
    )
