"""Corpus-trained n-gram language-model scoring.

CCNet-style (Wenzek et al. 2020, public) pipelines bucket documents
by LM perplexity to separate fluent text from boilerplate/garbage.
This module trains a word-bigram model with add-one smoothing ON the
corpus itself (one aggregation pass) and scores every document with
its average bits-per-bigram and perplexity — a fully deterministic,
engine-independent computation (the driver oracle recomputes it in
SQL and hash-matches).

No reference analogue (gofaiss has no text surface); part of the
large-corpus curation extension (SURVEY.md §2.7 family).

Scale shape (100 TB):
- tokenization and bigram extraction are pure JVM column expressions
  (split / slice / arrays_zip) — no Python boundary;
- the bigram-count table is one groupBy shuffle keyed on the bigram;
  the context-count and vocab-size aggregates partial-combine;
- scoring joins each document's exploded bigrams to the count table
  (shuffle on the bigram key, AQE-skewed-join-safe: stopword bigrams
  are hot keys) and aggregates back per doc_id — two shuffles total,
  both on narrow rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bigram_perplexity"]


def _words(text) -> F.Column:
    """Lowercased ASCII-alphanumeric word tokens (deterministic and
    engine-portable: the oracle reproduces it with the same regexp)."""
    return F.filter(
        F.split(F.regexp_replace(F.lower(text), "[^a-z0-9]+", " "), " "),
        lambda x: x != "",
    )


def bigram_perplexity(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_bigrams, bits_per_bigram, perplexity) per document
    with ≥1 word bigram.

    P(w2|w1) = (c(w1,w2) + 1) / (c(w1·) + V)   [add-one smoothing]
    bits_per_bigram = avg(-log2 P), perplexity = 2^bits_per_bigram —
    both rounded to 6dp so Spark and the SQL oracle hash-match.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"), _words(F.col(text_col)).alias("_w")
    ).filter(F.size("_w") >= 2)
    bg = toks.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice("_w", 1, F.size("_w") - 1).alias("w1"),
                F.slice("_w", 2, F.size("_w") - 1).alias("w2"),
            )
        ).alias("_b"),
    ).select("doc_id", F.col("_b.w1").alias("w1"), F.col("_b.w2").alias("w2"))

    # ONE aggregation over the token stream, checkpointed (it is the
    # trained model — vocab²-bounded, orders of magnitude smaller than
    # the corpus), and the other two model tables DERIVE from it:
    # c_ctx(w1) = Σ_w2 c_bg(w1,w2) is exactly the count of bigram
    # tokens with context w1, and the distinct words of the pair
    # table are the same set as the distinct words of the token
    # stream. Before r12 each table re-ran tokenize→explode from the
    # corpus — 5 full scans per call (12 parquet scans in the
    # doc_ppl_buckets plan); now: one for the model, one for scoring
    # (guide §1.2 step 1 — the algorithm's two-pass floor).
    # r13 (verdict item 6): the model table is vocab²-BOUNDED but can
    # still be huge at 100 TB — persist MEMORY_AND_DISK (spillable,
    # evictable, recomputable via intact lineage) instead of
    # localCheckpoint (executor-pinned, lineage severed: a lost
    # executor failed every downstream action)
    from pyspark import StorageLevel

    bg_counts = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c_bg")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    ctx_counts = bg_counts.groupBy("w1").agg(F.sum("c_bg").alias("c_ctx"))
    # vocab = distinct words anywhere (first or second position)
    vocab = (
        bg_counts.select(F.col("w1").alias("w"))
        .unionByName(bg_counts.select(F.col("w2").alias("w")))
        .agg(F.count_distinct("w").alias("v"))
    )

    scored = (
        bg.join(bg_counts, ["w1", "w2"])
        .join(ctx_counts, ["w1"])
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            (
                -F.log2(
                    (F.col("c_bg") + F.lit(1.0))
                    / (F.col("c_ctx") + F.col("v").cast("double"))
                )
            ).alias("_bits"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.avg("_bits").alias("_avg_bits"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.round("_avg_bits", 6).alias("bits_per_bigram"),
            F.round(F.pow(F.lit(2.0), "_avg_bits"), 6).alias("perplexity"),
        )
    )


def perplexity_buckets(
    docs: DataFrame,
    n_buckets: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): per
    language, rank documents by bigram perplexity and split into
    equal-count buckets (bucket 1 = most fluent ... n = noisiest;
    CCNet keeps the head/middle). Deterministic: ordering ties break
    on doc_id. One extra narrow shuffle on the language key."""
    from pyspark.sql import Window

    ppl = bigram_perplexity(docs, text_col=text_col, id_col=id_col)
    langs = docs.select(F.col(id_col).alias("doc_id"), F.col(lang_col).alias("lang"))
    w = Window.partitionBy("lang").orderBy(
        F.col("perplexity").asc(), F.col("doc_id").asc()
    )
    return (
        ppl.join(langs, "doc_id")
        .select(
            "doc_id", "lang", "perplexity",
            F.ntile(n_buckets).over(w).alias("ppl_bucket"),
        )
    )
