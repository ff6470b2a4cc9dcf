"""Training-data curation operators: chunking, deterministic
sampling, group-wise quality filtering.

No reference analogue — gofaiss stops at vector search — but these
are the operations a large-scale training-data pipeline runs right
next to dedup/ANN (the brief's "beyond the reference" surface). All
three are pure JVM column expressions / window functions: codegen'd,
no UDFs, no driver loops, shuffle only where the semantics require a
grouping.

Scale notes:
- ``chunk_documents`` is embarrassingly parallel (per-row explode);
  output rows ≈ Σ tokens/stride — the explode multiplies rows but
  never shuffles.
- ``hash_sample`` is a stateless filter on an md5-derived bucket —
  reproducible across engines and runs (unlike ``rand()``), prunes
  at the scan, and keeps the SAME documents when the corpus grows,
  which is what makes held-out splits stable across snapshots.
- ``top_k_by_group`` is one shuffle on the group key + a bounded
  per-group sort (window row_number) — the classic "keep the best k
  docs per language/source" curation step.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gofaiss_spark.functions.text import tokenize


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping token windows.

    Returns (doc_id, chunk_idx, n_chunk_tokens, chunk_text): windows
    of ``chunk_tokens`` whitespace tokens advancing by
    ``chunk_tokens − overlap``. The final window may be shorter;
    zero-token documents produce no rows. Deterministic — the
    content-addressed twin ``md5(chunk_text)`` hashes identically on
    any engine."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}")
    step = chunk_tokens - overlap
    toks = tokenize(text_col)
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("_toks")).filter(
        F.size("_toks") > 0
    )
    starts = F.sequence(F.lit(0), F.size("_toks") - 1, F.lit(step))
    return (
        base.select("doc_id", "_toks", F.posexplode(starts).alias("chunk_idx", "_s"))
        .select(
            "doc_id",
            "chunk_idx",
            F.slice("_toks", F.col("_s") + 1, chunk_tokens).alias("_chunk"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.size("_chunk").alias("n_chunk_tokens"),
            F.concat_ws(" ", "_chunk").alias("chunk_text"),
        )
    )


def hash_bucket(id_col, buckets: int = 100) -> Column:
    """Deterministic engine-portable bucket in [0, buckets): the
    first 8 hex chars of md5(id-as-string) mod buckets. md5 (not
    xxhash64) so DuckDB/Trino/any engine reproduce the exact split."""
    h = F.substring(F.md5(F.col(id_col).cast("string") if isinstance(id_col, str) else id_col.cast("string")), 1, 8)
    return (F.conv(h, 16, 10).cast("long") % buckets).alias("bucket")


def hash_sample(
    df: DataFrame, pct: int = 10, id_col: str = "doc_id", buckets: int = 100
) -> DataFrame:
    """Keep rows whose ``hash_bucket`` < pct — a reproducible
    ``pct/buckets`` sample keyed on the id, stable across runs,
    engines, and corpus growth (a document is in or out forever)."""
    if not 0 <= pct <= buckets:
        raise ValueError(f"need 0 <= pct <= {buckets}, got {pct}")
    return df.withColumn("bucket", hash_bucket(id_col, buckets)).filter(
        F.col("bucket") < pct
    )


def top_k_by_group(
    df: DataFrame,
    group_col: str,
    order_col,
    k: int,
    tiebreak_col: str,
    descending: bool = True,
) -> DataFrame:
    """Best-k rows per group (e.g. highest-quality docs per lang):
    one shuffle on the group key, bounded window sort, deterministic
    ties via ``tiebreak_col``. Adds ``group_rank`` (1-based)."""
    oc = F.col(order_col) if isinstance(order_col, str) else order_col
    order = [oc.desc() if descending else oc.asc(), F.col(tiebreak_col).asc()]
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("group_rank", F.row_number().over(w))
        .filter(F.col("group_rank") <= k)
    )
