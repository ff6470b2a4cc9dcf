"""Binary (Hamming) index: sign-binarized vectors packed into 32-bit
words, searched by popcount(XOR) distance — the FAISS IndexBinaryFlat
pattern re-expressed in Spark.

The reference (tahcohcat/gofaiss) has no binary index; its nearest
analogue is the SimHash fingerprint kernel it also lacks (our
operators/dedup.py:simhash). This operator completes the quantization
ladder (PQ 8x, SQ8 4x, binary 32x compression) with a fully
JVM-side search: packing is a higher-order-function fold, distance is
``bit_count(w XOR q)`` summed across words — whole-stage codegen,
no Python workers anywhere in the path.

Scale shape: the packed table is 32x narrower than the float
vectors (dim/8 bytes per row), so a 100 TB float corpus becomes a
~3 TB binary scan. Search scores the scan against a broadcast query
batch and takes a per-query window top-k; Spark's WindowGroupLimit
performs partial top-k inside each scan partition before the
shuffle, so the exchange carries only O(partitions x q x k) rows —
independent of n, same shape as operators/topk.py phase 2.

Each word packs 32 components (bit i set iff component > 0). 32-bit
words stored as BIGINT keep every value positive, so packing,
XOR and popcount behave identically in Spark and in the DuckDB
oracle (no sign-extension disagreements at the 64th bit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

WORD_BITS = 32


def n_words(dim: int) -> int:
    if dim <= 0:
        raise ValueError(f"dim must be positive, got {dim}")
    return (dim + WORD_BITS - 1) // WORD_BITS


def _word_expr(vec_col: str, word: int, dim: int) -> F.Column:
    """One packed word as a JVM fold: sum of shiftleft(1, i) over the
    set bits. aggregate() keeps the whole expression inside codegen."""
    lo = word * WORD_BITS
    bits = min(WORD_BITS, dim - lo)
    return F.expr(
        f"""aggregate(
  sequence(0, {bits - 1}),
  CAST(0 AS BIGINT),
  (acc, i) -> acc + CASE
      WHEN element_at({vec_col}, {lo} + i + 1) > 0
      THEN shiftleft(CAST(1 AS BIGINT), i) ELSE CAST(0 AS BIGINT) END
)"""
    )


def binarize(
    df: DataFrame,
    dim: int,
    vec_col: str = "vec",
    id_col: str = "id",
) -> DataFrame:
    """(id, vec) -> (id, w0..w{n-1}): sign bits packed into 32-bit
    words. Flat word columns (not an array) so the downstream XOR /
    popcount stays a scalar expression tree and parquet stores each
    word as a plain BIGINT column (min/max stats usable)."""
    cols = [F.col(id_col).alias("id")] + [
        _word_expr(vec_col, w, dim).alias(f"w{w}") for w in range(n_words(dim))
    ]
    return df.select(*cols)


def hamming_col(nw: int, prefix_a: str = "w", prefix_b: str = "qw") -> F.Column:
    """Sum over words of popcount(a XOR b), as one codegen expression."""
    terms = " + ".join(
        f"bit_count({prefix_a}{w} ^ {prefix_b}{w})" for w in range(nw)
    )
    return F.expr(terms).cast("long")


def search_binary(
    packed: DataFrame,
    packed_queries: DataFrame,
    dim: int,
    k: int = 10,
) -> DataFrame:
    """Exact Hamming top-k of a broadcast query batch against the
    packed table. Returns (query_id, id, hamming, rank), rank 1..k
    ascending by (hamming, id) — deterministic across runs and
    engines.
    """
    nw = n_words(dim)
    q = packed_queries.select(
        F.col("id").alias("query_id"),
        *[F.col(f"w{w}").alias(f"qw{w}") for w in range(nw)],
    )
    scored = packed.join(F.broadcast(q)).select(
        "query_id", "id", hamming_col(nw).alias("hamming")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("id").asc()
    )
    ranked = scored.withColumn("rank", F.row_number().over(w))
    if k > 0:
        ranked = ranked.filter(F.col("rank") <= k)
    return ranked


def search_binary_refined(
    packed: DataFrame,
    base: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    refine: int = 10,
    metric: str = "l2",
    vec_col: str = "vec",
    id_col: str = "id",
    qvec_col: str = "qvec",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Two-stage retrieval: Hamming pre-filter over the 32×-compressed
    sign codes, exact re-rank of the top-(k·refine) survivors against
    the original rows — the FAISS IndexBinaryFlat + RefineFlat
    composition, and THE 100 TB first-pass shape (a ~3 TB packed scan
    nominates candidates; the full-precision corpus is touched only
    at candidate ids via an equi-join, never rescanned). Returns the
    exact-metric contract (query_id, id, distance, rank 1..k).

    ``refine`` ≥ ceil(n/k) makes the candidate set the whole corpus,
    so the result is provably identical to exact flat search — the
    driver-oracle gate construction (binary_refine_topk)."""
    from gofaiss_spark.operators.topk import refine_exact

    if refine < 1:
        raise ValueError(f"refine must be >= 1, got {refine}")
    q = queries.select(
        F.col(query_id_col).alias(query_id_col),
        F.col(qvec_col).alias(qvec_col),
    )
    pq = binarize(q, dim, vec_col=qvec_col, id_col=query_id_col)
    cands = search_binary(packed, pq, dim, k=k * refine)
    return refine_exact(
        cands, base, q, k, metric=metric,
        vec_col=vec_col, id_col=id_col,
        qvec_col=qvec_col, query_id_col=query_id_col,
    )
