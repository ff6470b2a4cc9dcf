"""Full-text retrieval over a document corpus: BM25 top-k search and
TF-IDF term weighting, built as inverted-index-shaped DataFrame plans.

The reference engine (tahcohcat/gofaiss) retrieves by dense-vector
distance only; BM25 is the lexical complement every training-data /
RAG pipeline pairs with it (hybrid retrieval). Re-expressed
Spark-first:

- postings = one explode + groupBy((doc_id, term)) — the classic
  inverted index as a DataFrame, one shuffle, map-side combined;
- document frequencies / lengths are aggregations of the postings,
  not extra corpus scans;
- a query batch is a tiny broadcast side: joining it to postings on
  `term` keeps only postings of query terms (the "probe the inverted
  lists" step — at 100 TB, persist postings bucketed by term to turn
  this into a pruned scan);
- scores rank on values rounded to 6dp BEFORE the top-k window, with
  doc_id tiebreak, so ordering is engine-independent (the DuckDB
  oracle ranks the same rounded values).

BM25 uses the Lucene-style IDF `ln((N - df + .5)/(df + .5) + 1)` and
set-semantics query terms (duplicate terms in a query count once).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from gofaiss_spark.functions.text import tokenize

__all__ = [
    "TextIndex",
    "build_text_index",
    "search_bm25",
    "tfidf_top_terms",
    "rrf_fuse",
    "search_maxsim",
    "save_text_index",
    "load_text_index",
]

#: postings are persisted partitionBy(bucket) with bucket =
#: pmod(xxhash64(term), N_TERM_BUCKETS) — a query's terms hash to a
#: handful of buckets, so the probe scan partition-prunes to those
#: directories instead of reading the whole postings table.
N_TERM_BUCKETS = 64


def _term_bucket(term) -> Column:
    return F.pmod(F.xxhash64(term), F.lit(N_TERM_BUCKETS)).cast("int")


@dataclass
class TextIndex:
    """Inverted-index artifact: postings + per-doc lengths + corpus
    constants. All DataFrames; nothing lives on the driver.
    ``bucketed`` marks a loaded partitionBy(bucket) artifact — the
    BM25 probe then pushes literal bucket/term predicates so the scan
    partition-prunes to the query terms' buckets."""

    postings: DataFrame  # (term, doc_id, tf[, bucket])
    doc_lens: DataFrame  # (doc_id, dl)
    n_docs: int
    avgdl: float
    bucketed: bool = False

    def stats(self) -> dict:
        return {
            "index_type": "text_bm25",
            "total_docs": self.n_docs,
            "avgdl": self.avgdl,
        }


def build_text_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> TextIndex:
    """Tokenize ONCE: the postings aggregation is materialized (it IS
    the inverted-index artifact — the same table save_text_index
    persists), and everything else derives from it: doc lengths as
    sum(tf) per doc (identical to the token count, a term's tf is its
    token multiplicity), corpus constants as one driver row over the
    doc lengths. Before r12 each consumer — doc_lens, the constants
    row, the BM25 probe, the df aggregation — re-executed the whole
    tokenize→explode→groupBy lineage, so one build+search ran the
    corpus scan 4× (guide §1.2 step 1 / §5: materialize the
    intermediate both passes share).

    r13 (verdict item 6 / ADVICE): the postings table is CORPUS-sized
    (the full inverted index), so it persists MEMORY_AND_DISK instead
    of localCheckpoint — blocks spill, evict and recompute (lineage
    intact) where a checkpoint pinned them on executors and a lost
    executor failed every downstream action. The narrow per-doc
    doc_lens table keeps the cheap checkpoint."""
    from pyspark import StorageLevel

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize(F.col(text_col))).alias("term"),
    )
    postings = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    doc_lens = postings.groupBy("doc_id").agg(
        F.sum("tf").alias("dl")
    ).localCheckpoint(eager=True)
    row = doc_lens.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    return TextIndex(
        postings=postings,
        doc_lens=doc_lens,
        n_docs=int(row["n"]),
        avgdl=float(row["avgdl"]),
    )


def _bm25_term_score(
    tf: Column, df: Column, dl: Column, n_docs: int, avgdl: float,
    k1: float, b: float,
) -> Column:
    idf = F.log(
        (F.lit(float(n_docs)) - df + F.lit(0.5)) / (df + F.lit(0.5))
        + F.lit(1.0)
    )
    tf_d = tf.cast("double")
    denom = tf_d + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * dl.cast("double") / F.lit(avgdl)
    )
    return idf * tf_d * F.lit(k1 + 1.0) / denom


def search_bm25(
    index: TextIndex,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k BM25 per query. `queries` = (query_id, query_text).

    Plan: query terms (distinct per query) broadcast-join the postings
    on `term` — only inverted lists of query terms are scored, and
    document frequencies aggregate over that probed subset (a term's
    postings survive the probe in full, so its df is exact). On a
    loaded bucketed artifact the probe additionally pushes LITERAL
    bucket + term predicates (the query batch is the small side by
    contract, same as the ANN kernels), so the parquet scan
    partition-prunes to the query terms' buckets — the 100 TB shape.
    The per-(query, doc) sum is one narrow shuffle keyed on the hits;
    the final window ranks rounded scores (≤ queries × matched-docs
    rows, independent of corpus size past the probe)."""
    qterms = queries.select(
        "query_id",
        F.explode(
            F.array_distinct(tokenize(F.col("query_text")))
        ).alias("term"),
    )
    postings = index.postings
    if index.bucketed:
        terms = sorted(
            {r["term"] for r in qterms.select("term").distinct().collect()}
        )
        if not terms:
            return queries.sparkSession.createDataFrame(
                [], "query_id long, doc_id long, score double, rank int"
            )
        buckets = sorted(
            {
                r["b"]
                for r in queries.sparkSession.createDataFrame(
                    [(t,) for t in terms], "term string"
                )
                .select(_term_bucket(F.col("term")).alias("b"))
                .collect()
            }
        )
        postings = postings.filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(terms)
        )
    probed = postings.join(F.broadcast(qterms), "term")
    dfreq = (
        postings.join(
            F.broadcast(qterms.select("term").distinct()), "term"
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    hits = probed.join(F.broadcast(dfreq), "term").join(
        index.doc_lens, "doc_id"
    )
    scored = hits.groupBy("query_id", "doc_id").agg(
        F.round(
            F.sum(
                _bm25_term_score(
                    F.col("tf"), F.col("df"), F.col("dl"),
                    index.n_docs, index.avgdl, k1, b,
                )
            ),
            6,
        ).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def tfidf_top_terms(index: TextIndex, top_n: int = 3) -> DataFrame:
    """Top-n characteristic terms per document by smoothed TF-IDF
    (`tf · ln(N/df)`), ranked on 6dp-rounded weights with a term
    tiebreak. One postings⋈df broadcast join + one window — the
    keyword-extraction pass of a curation pipeline."""
    dfreq = index.postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    weighted = index.postings.join(F.broadcast(dfreq), "term").select(
        "doc_id",
        "term",
        F.round(
            F.col("tf").cast("double")
            * F.log(F.lit(float(index.n_docs)) / F.col("df")),
            6,
        ).alias("weight"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("weight").desc(), F.col("term").asc()
    )
    return (
        weighted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select("doc_id", "term", "weight", "rank")
    )


def save_text_index(index: TextIndex, path: str) -> None:
    """Persist postings partitioned by term-hash bucket (so BM25
    probes partition-prune — see search_bm25), doc lengths, and the
    corpus constants as a json sidecar."""
    import json
    import os

    from gofaiss_spark.plans.artifacts import FORMAT_VERSION

    postings = index.postings
    if "bucket" not in postings.columns:
        postings = postings.withColumn("bucket", _term_bucket(F.col("term")))
    # cluster by bucket before the partitioned write: one file per
    # bucket instead of (input tasks × buckets) tiny files (guide §6)
    postings.repartition(F.col("bucket")).write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(f"{path}/postings")
    index.doc_lens.write.mode("overwrite").parquet(f"{path}/doc_lens")
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/_meta.json", "w") as f:
        json.dump(
            {
                "index_type": "text_bm25",
                "format_version": FORMAT_VERSION,
                "n_docs": index.n_docs,
                "avgdl": index.avgdl,
                "n_term_buckets": N_TERM_BUCKETS,
            },
            f,
        )


def load_text_index(spark: SparkSession, path: str) -> TextIndex:
    import json

    with open(f"{path}/_meta.json") as f:
        meta = json.load(f)
    return TextIndex(
        postings=spark.read.parquet(f"{path}/postings"),
        doc_lens=spark.read.parquet(f"{path}/doc_lens"),
        n_docs=int(meta["n_docs"]),
        avgdl=float(meta["avgdl"]),
        bucketed=True,
    )


def search_maxsim(
    doc_tokens: DataFrame,
    query_tokens: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Late-interaction multi-vector retrieval (the ColBERT MaxSim
    scoring rule): documents and queries are BAGS of token embeddings,
    `score(q, d) = Σ_{t∈q} max_{u∈d} ⟨t, u⟩`.

    Inputs: ``doc_tokens`` = (doc_id, token_id, vec),
    ``query_tokens`` = (query_id, token_id, qvec).

    Plan: query tokens broadcast against the token corpus (map-side
    explode, no shuffle of the corpus), dot products in the JVM
    zip_with/aggregate kernel, then two aggregations — max per
    (query, doc, query-token), sum per (query, doc) — the first with
    map-side partial max, the second over ≤ queries × docs × qtokens
    narrow rows. At 100 TB run this as a RE-RANK: restrict
    ``doc_tokens`` to ANN candidates first (compose with
    search_flat / IVF over pooled vectors), exactly how
    late-interaction systems deploy it. Scores rank on 6dp-rounded
    values with a doc_id tiebreak."""
    from gofaiss_spark.functions.distance import dot_product

    pairs = doc_tokens.alias("d").join(
        F.broadcast(
            query_tokens.select(
                "query_id",
                F.col("token_id").alias("_qtok"),
                F.col("qvec").alias("_qv"),
            )
        )
    )
    dots = pairs.select(
        "query_id",
        "doc_id",
        "_qtok",
        dot_product(F.col("vec"), F.col("_qv")).alias("_dot"),
    )
    per_qtok = dots.groupBy("query_id", "doc_id", "_qtok").agg(
        F.max("_dot").alias("_best")
    )
    scored = per_qtok.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("_best"), 6).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def rrf_fuse(
    results_a: DataFrame,
    results_b: DataFrame,
    k: int = 10,
    c: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked result sets — the standard
    hybrid-retrieval combiner (dense ANN ranks ⊕ BM25 lexical ranks):
    `score(d) = Σ_lists 1/(c + rank_list(d))`, missing-list docs
    contribute nothing. Inputs are (query_id, id, rank) DataFrames
    (any extra columns ignored).

    Plan: rank contributions union (narrow 3-column rows, each input
    already ≤ queries × k), one groupBy((query_id, id)) sum, one
    window over ≤ 2k rows per query. Fusion cost is independent of
    corpus size — it only ever sees the two top-k lists. Scores rank
    on 6dp-rounded values with an id tiebreak (engine-independent)."""
    contrib = lambda df: df.select(  # noqa: E731
        "query_id",
        "id",
        (F.lit(1.0) / (F.lit(float(c)) + F.col("rank").cast("double"))).alias(
            "_c"
        ),
    )
    fused = (
        contrib(results_a)
        .unionByName(contrib(results_b))
        .groupBy("query_id", "id")
        .agg(F.round(F.sum("_c"), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "score", "rank")
    )
