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

__all__ = [
    "apply_bpe",
    "max_remaining_pair_freq",
    "train_bpe",
    "word_frequency_table",
]

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


def max_remaining_pair_freq(
    word_counts: list[tuple[str, int]],
    merges: list[tuple[str, str]],
) -> int:
    """Max adjacent-pair frequency left after applying a merge table
    to a word-frequency table (0 when every word is fully merged).

    Used by the driver oracle to verify that an EARLY-exhausted
    training run (fewer merges than requested) stopped because the
    data ran out of pairs, not because of a loop bug: re-derives the
    final state through the greedy ENCODER path (_encode_word — a
    different code path from the training loop's rewrite) and counts
    what remains."""
    rank_of = {(lt, rt): i for i, (lt, rt) in enumerate(merges)}
    best = 0
    pair_freq: dict[tuple[str, str], int] = {}
    for word, cnt in word_counts:
        syms = _encode_word(word, rank_of)
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_freq[p] = pair_freq.get(p, 0) + cnt
    if pair_freq:
        best = max(pair_freq.values())
    return best


def _encode_word(word: str, rank_of: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE encoding of one word: repeatedly merge the
    lowest-rank adjacent pair present (the standard encoder; same
    semantics as applying the training merges in order)."""
    syms = list(word) + [END_OF_WORD]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = rank_of.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def apply_bpe(
    docs: DataFrame,
    merges: DataFrame | list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode each document with a trained merge table: (id_col,
    n_words, n_subwords, bpe_ok).

    ``merges`` is ``train_bpe``'s output (or (left, right, rank)
    tuples); the rank map is vocabulary-sized and rides to executors
    inside the Arrow-batched ``mapInPandas`` closure (broadcast-small
    by construction — the distributed cost is one map pass, no
    shuffle). Per-batch word→tokens memoization amortizes the encoder
    across repeated words (Zipf corpora hit the cache constantly).

    ``bpe_ok`` asserts the segmentation invariants executor-side:
    concatenating a word's subword tokens reproduces word+``</w>``,
    and n_words ≤ n_subwords ≤ n_chars + n_words (merges only ever
    shrink the no-merge character segmentation).
    """
    import pandas as pd

    if isinstance(merges, DataFrame):
        rows = merges.select("left", "right", "rank").collect()
        rank_of = {(r["left"], r["right"]): r["rank"] for r in rows}
    else:
        rank_of = {(lt, rt): rk for lt, rt, rk in merges}
    spark = docs.sparkSession
    src = docs.select(F.col(id_col), F.col(text_col).alias("_text"))

    def encode(batches):
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            out = []
            for did, text in zip(pdf[id_col], pdf["_text"]):
                words = [w for w in (text or "").split() if w]
                n_sub = 0
                ok = True
                for w in words:
                    toks = cache.get(w)
                    if toks is None:
                        toks = _encode_word(w, rank_of)
                        cache[w] = toks
                    n_sub += len(toks)
                    if "".join(toks) != w + END_OF_WORD:
                        ok = False
                nw, nc = len(words), sum(len(w) for w in words)
                ok = ok and (nw <= n_sub <= nc + nw)
                out.append((did, nw, n_sub, ok))
            yield pd.DataFrame(
                out, columns=[id_col, "n_words", "n_subwords", "bpe_ok"]
            )

    schema = f"{id_col} long, n_words int, n_subwords int, bpe_ok boolean"
    return src.mapInPandas(encode, schema=schema)
