"""BPE tokenizer training over a document corpus.

The reference has no text ops (SURVEY.md §2.6); this extends the
LLM-pipeline surface (SURVEY.md §7 phase E) with the tokenizer-
training step that sits between `build_vocab` (frequency-ranked word
vocabulary) and `bpe_ish_token_count` (token budgeting): learning the
byte-pair-encoding merge table itself (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units" — public
algorithm).

Spark-first architecture: classic BPE training depends on the corpus
ONLY through the word-frequency table, so the distributed part is a
single tokenize→explode→groupBy pass (one shuffle, map-side combine,
output is vocabulary-sized, capped at ``max_vocab_words`` by
frequency). The merge loop — O(num_merges × vocab × avg_word_len) on
a table of at most ``max_vocab_words`` rows — runs driver-side, the
same count-distributed / merge-central split every production BPE
trainer uses (counting scales with the corpus; merging scales with
the vocabulary).

Determinism contract: ties on pair frequency break by (left, right)
lexicographic order, making the merge sequence a pure function of
the word-frequency table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["train_bpe", "word_frequency_table"]

END_OF_WORD = "</w>"


def word_frequency_table(
    docs: DataFrame,
    text_col: str = "text",
    max_vocab_words: int = 50_000,
) -> DataFrame:
    """The distributed half: (word, cnt) for the ``max_vocab_words``
    most frequent whitespace tokens — one explode + one groupBy
    shuffle; deterministic cap order (cnt desc, word asc)."""
    from gofaiss_spark.functions.text import tokenize

    return (
        docs.select(F.explode(tokenize(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("word"))
        .limit(max_vocab_words)
    )


def _bpe_merge_loop(
    word_counts: list[tuple[str, int]],
    num_merges: int,
    min_pair_freq: int,
) -> list[tuple[int, str, str, int]]:
    """Driver-side merge loop over the (word, count) table. Each word
    starts as its character sequence plus an END_OF_WORD symbol; each
    round counts adjacent symbol pairs weighted by word frequency,
    merges the most frequent (ties → lexicographic), and rewrites
    the sequences. Returns (rank, left, right, pair_freq) rows."""
    seqs: list[tuple[list[str], int]] = [
        (list(w) + [END_OF_WORD], c) for w, c in word_counts
    ]
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, num_merges + 1):
        pair_freq: dict[tuple[str, str], int] = {}
        for syms, cnt in seqs:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_freq[p] = pair_freq.get(p, 0) + cnt
        if not pair_freq:
            break
        best = min(pair_freq.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), freq = best
        if freq < min_pair_freq:
            break
        merged = left + right
        new_seqs = []
        for syms, cnt in seqs:
            out = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_seqs.append((out, cnt))
        seqs = new_seqs
        merges.append((rank, left, right, freq))
    return merges


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 50,
    max_vocab_words: int = 50_000,
    min_pair_freq: int = 2,
) -> DataFrame:
    """Learn a BPE merge table from a corpus. Returns a DataFrame
    (rank, left, right, merged, pair_freq) ordered by rank — rank 1
    is the most frequent adjacent symbol pair of the initial
    character sequences.

    Invariants (used by the driver oracle and tests): ``merged`` is
    the concatenation of ``left`` and ``right``; ``pair_freq`` is
    non-increasing in rank (a new pair involves the just-merged
    symbol, whose occurrence count is the merged pair's frequency;
    untouched pairs can only lose occurrences); every
    ``pair_freq >= min_pair_freq``."""
    if num_merges <= 0:
        raise ValueError(f"num_merges must be positive, got {num_merges}")
    spark = docs.sparkSession
    wc = [
        (r["word"], r["cnt"])
        for r in word_frequency_table(docs, text_col, max_vocab_words).collect()
    ]
    merges = _bpe_merge_loop(wc, num_merges, min_pair_freq)
    rows = [(r, lt, rt, lt + rt, f) for r, lt, rt, f in merges]
    return spark.createDataFrame(
        rows, "rank INT, left STRING, right STRING, merged STRING, pair_freq BIGINT"
    )
