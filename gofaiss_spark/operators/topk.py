"""Flat (exact brute-force) search = the ground-truth oracle.

Reference: pkg/index/flat/flat.go:74-114 (full scan → sort asc →
take k) and benchmark/benchmark_comparison.go:149-163 (flat search as
ground truth). BatchSearch (flat.go:61-71) is a sequential per-query
loop in the reference; in Spark the whole query batch is one plan —
strictly better (SURVEY.md §4 row 11).

Two physical strategies, identical results:

- ``method="expr"``: vectors ⋈ broadcast(queries) with a higher-order
  -function distance column, then per-query top-k. Pure JVM. The
  shuffle after scoring carries n×q rows — fine at test scale, and the
  plan DuckDB can replicate fold-for-fold (correctness oracle).

- ``method="local"`` (default): two-phase top-k. Phase 1 is a
  mapInPandas partial top-k: each input partition computes a BLAS
  distance matrix against the broadcast query batch and keeps only its
  local k best per query — no shuffle, n×q scores reduced to
  (partitions × q × k) candidate rows. Phase 2 is an exact window
  top-k over that small remainder. At 100 TB this is the only shape
  that works: the shuffle is O(partitions·q·k), independent of n.

Ties break by (distance, id) — deterministic across runs and engines.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gofaiss_spark.functions.distance import (
    distance_col,
    f32_select_margin,
    np_distance_matrix,
    validate_metric,
)

RESULT_SCHEMA = "query_id long, id long, distance double"

#: distance-matrix budget (cells) per BLAS call in the local-top-k
#: kernel — bounds the (B, q) allocation at ~128 MB of float64
_QUERY_CHUNK_CELLS = 16_000_000


def score_pairs(
    vectors: DataFrame,
    queries: DataFrame,
    metric: str = "l2",
    vec_col: str = "vec",
    qvec_col: str = "qvec",
    id_col: str = "id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Every (query, vector) pair scored: the broadcast nested-loop
    join the reference's full scan is equivalent to (flat.go:94-103).

    Returns (query_id, id, distance). The query side is broadcast —
    it is the small side by contract (a query batch, not a table).
    """
    validate_metric(metric)
    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("_vec"))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(qvec_col).alias("_qvec")
    )
    scored = v.join(F.broadcast(q)).select(
        "query_id",
        "id",
        distance_col(metric, "_vec", "_qvec").alias("distance"),
    )
    return scored


def topk(
    scored: DataFrame,
    k: int,
    partition_cols: list[str] | None = None,
    distance_col_name: str = "distance",
    id_col: str = "id",
) -> DataFrame:
    """Exact per-group top-k with deterministic (distance, id) tie-break.

    Window + row_number over (partition_cols); Spark's rank-limit
    pushdown turns this into per-partition partial top-k before the
    shuffle (WindowGroupLimit), so the shuffle carries ≤ groups×k rows.
    """
    partition_cols = partition_cols if partition_cols is not None else ["query_id"]
    w = Window.partitionBy(*partition_cols).orderBy(
        F.col(distance_col_name).asc(), F.col(id_col).asc()
    )
    ranked = scored.withColumn("rank", F.row_number().over(w))
    if k > 0:
        ranked = ranked.filter(F.col("rank") <= k)
    return ranked


def _local_topk_candidates(
    vectors: DataFrame,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    k: int,
    metric: str,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """Phase 1: per-arrow-batch partial top-k via BLAS (no shuffle).

    Kernel contract (the LocalFlatIndex pattern, local_serve.py:84):
    a single f32 GEMM ranks each arrow batch's rows per query and
    selects the top-(k+16) candidates; only those survivors get an
    exact f64 re-score (direct (a-b)² form — exact 0 on identical
    vectors, no norms-identity noise), so reported distances and
    orderings are identical to a full f64 scan at ~4× less compute
    and half the memory traffic — the difference between riding out
    a throttled window and stalling in one.

    The exactness claim is ENFORCED, not assumed: the f32 cut is
    guarded by an error bound (f32_select_margin). Per query, if the
    gap between the selection pivot (best rejected f32 score) and the
    k-th-best survivor is not larger than twice the bound, the kernel
    falls back to an exact f64 ranking of the whole batch for that
    query — so pathological near-ties (clustered large-magnitude
    vectors with gaps below f32 resolution, or exact duplicates tied
    at the boundary) cannot silently drop a true neighbor.

    Large query batches are processed in column chunks so the (B, q)
    score matrix stays ~64 MB regardless of q — each query's partial
    top-k is independent, so chunking the query axis needs no merge.
    Measured: without chunking, a 10k-query batch allocates ~400 MB
    per Arrow batch and drops BLAS throughput ~3× (memory bound)."""
    chunk_cells = _QUERY_CHUNK_CELLS  # driver-captured → testable

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qn = query_mat.shape[0]
        q32 = query_mat.astype(np.float32)
        if metric == "cosine":
            qnrm = np.linalg.norm(q32, axis=1, keepdims=True)
            qnrm[qnrm == 0] = 1.0
            q32 = q32 / qnrm
        q64 = np.ascontiguousarray(query_mat, dtype=np.float64)
        q64n = np.linalg.norm(q64, axis=1)
        dim = q64.shape[1] if q64.ndim == 2 else 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            base = np.stack(pdf[vec_col].to_numpy())
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            b = base.shape[0]
            b64 = base.astype(np.float64)
            b32 = base.astype(np.float32)
            if metric == "l2":
                bn32 = np.einsum("ij,ij->i", b32, b32)
                bmax = float(np.sqrt(bn32.max(initial=0.0)))
            elif metric == "cosine":
                b64n = np.linalg.norm(b64, axis=1)
                bnrm = b64n.astype(np.float32)[:, None].copy()
                bnrm[bnrm == 0] = 1.0
                b32 = b32 / bnrm
                bmax = 1.0
            else:
                bmax = float(np.linalg.norm(b64, axis=1).max(initial=0.0))
            # per-query f32-cut error bound for THIS batch's magnitudes
            err = f32_select_margin(metric, dim, bmax, q64n)
            kk = min(k + 16, b)
            chunk = max(256, chunk_cells // max(b, 1))
            outs = []
            for s in range(0, qn, chunk):
                qc = min(chunk, qn - s)
                # f32 ranking scores: order-equivalent to the metric
                # per query column (l2 drops the constant |q|² term)
                sc = b32 @ q32[s : s + qc].T  # (b, qc)
                if metric == "l2":
                    sc *= -2.0
                    sc += bn32[:, None]
                else:
                    np.negative(sc, out=sc)
                if kk < b:
                    # kth=kk: positions [:kk] are the survivors, the
                    # element AT kk is the best rejected f32 score —
                    # the selection pivot the margin guard checks
                    part_idx = np.argpartition(sc, kk, axis=0)
                    sel = part_idx[:kk, :]
                    pivot = sc[
                        part_idx[kk], np.arange(qc)
                    ].astype(np.float64)
                    surv = np.take_along_axis(sc, sel, axis=0)
                    kth = np.partition(
                        surv, min(k, kk) - 1, axis=0
                    )[min(k, kk) - 1].astype(np.float64)
                    # guard: pivot - kth > 2*err proves no rejected
                    # candidate can belong to the exact top-k; on
                    # violation (near-ties beyond the +16 buffer, or
                    # exact duplicates) rank that query in exact f64
                    for j in np.flatnonzero(
                        pivot - kth <= 2.0 * err[s : s + qc]
                    ):
                        qj = q64[s + j]
                        if metric == "l2":
                            diff = b64 - qj
                            dj = np.einsum("ij,ij->i", diff, diff)
                        elif metric == "cosine":
                            den = b64n * q64n[s + j]
                            with np.errstate(
                                divide="ignore", invalid="ignore"
                            ):
                                dj = 1.0 - np.clip(
                                    (b64 @ qj) / den, -1.0, 1.0
                                )
                            dj[den == 0.0] = 1.0
                        else:
                            dj = -(b64 @ qj)
                        sel[:, j] = np.lexsort((ids, dj))[:kk]
                else:
                    sel = np.broadcast_to(
                        np.arange(b)[:, None], (b, qc)
                    ).copy()
                # exact f64 re-score of the survivors only, in query
                # sub-blocks so the (cb, kk, dim) candidate tensor
                # stays cache-sized
                dsel = np.empty(sel.shape, dtype=np.float64)
                cb = 1024
                for cs in range(0, qc, cb):
                    ce = min(cs + cb, qc)
                    cand = b64[sel[:, cs:ce].T]  # (cbq, kk, dim)
                    qb = q64[s + cs : s + ce]
                    if metric == "l2":
                        diff = cand - qb[:, None, :]
                        d = np.sqrt(np.einsum("bkd,bkd->bk", diff, diff))
                    elif metric == "cosine":
                        ip = np.einsum("bkd,bd->bk", cand, qb)
                        denom = (b64n[sel[:, cs:ce].T]
                                 * q64n[s + cs : s + ce, None])
                        with np.errstate(divide="ignore", invalid="ignore"):
                            cossim = ip / denom
                        d = 1.0 - np.clip(cossim, -1.0, 1.0)
                        d[denom == 0.0] = 1.0
                    else:
                        d = -np.einsum("bkd,bd->bk", cand, qb)
                    dsel[:, cs:ce] = d.T
                # distances are exact now — emit exactly top-k per
                # batch (deterministic (distance, id) order), keeping
                # the shuffle at k rows per (query, partition)
                csel = ids[sel]
                ko = min(k, kk)
                if ko < kk:
                    o = np.lexsort((csel, dsel), axis=0)[:ko, :]
                    csel = np.take_along_axis(csel, o, axis=0)
                    dsel = np.take_along_axis(dsel, o, axis=0)
                outs.append(
                    pd.DataFrame(
                        {
                            "query_id": np.repeat(
                                query_ids[s : s + qc], ko
                            ),
                            "id": csel.ravel(order="F"),
                            "distance": dsel.ravel(order="F"),
                        }
                    )
                )
            yield outs[0] if len(outs) == 1 else pd.concat(
                outs, ignore_index=True
            )

    sel_df = vectors.select(id_col, vec_col)
    return sel_df.mapInPandas(part, schema=RESULT_SCHEMA)


def search_flat(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    metric: str = "l2",
    method: str = "local",
    vec_col: str = "vec",
    qvec_col: str = "qvec",
    id_col: str = "id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact k-NN for a batch of queries.

    Returns (query_id, id, distance, rank) with rank 1..k ascending by
    (distance, id). ``k <= 0`` means "all" (flat.go:82-84 normalizes
    k>n and k<=0 to n).
    """
    validate_metric(metric)
    if method == "expr":
        scored = score_pairs(
            vectors, queries, metric, vec_col, qvec_col, id_col, query_id_col
        )
        return topk(scored, k)
    if method != "local":
        raise ValueError(f"unknown method {method!r} (expected 'local' or 'expr')")
    if k <= 0:
        # "return everything" only makes sense via the full scored join
        scored = score_pairs(
            vectors, queries, metric, vec_col, qvec_col, id_col, query_id_col
        )
        return topk(scored, k)
    qrows = (
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(qvec_col).alias("qvec")
        )
        .toPandas()
    )
    if len(qrows) == 0:
        spark = vectors.sparkSession
        empty = spark.createDataFrame([], RESULT_SCHEMA + ", rank int")
        return empty
    query_ids = qrows["query_id"].to_numpy(dtype=np.int64)
    query_mat = np.stack(qrows["qvec"].to_numpy()).astype(np.float64)
    cand = _local_topk_candidates(
        vectors, query_ids, query_mat, k, metric, vec_col, id_col
    )
    return topk(cand, k)


def refine_exact(
    candidates: DataFrame,
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    metric: str = "l2",
    vec_col: str = "vec",
    qvec_col: str = "qvec",
    id_col: str = "id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact re-ranking of an approximate candidate list (the FAISS
    IndexRefineFlat idea): take the top-(k·oversample) ids from a
    quantized search, fetch their original vectors, recompute the true
    metric, keep the exact top-k.

    Scale shape: ``candidates`` is queries × k_cand narrow (query_id,
    id) rows — the join back to ``vectors`` is an equi-join on id that
    touches only candidate rows (shuffle-hash on id at 100 TB, never a
    rescan), and the query batch rides as a broadcast. Quantization
    error then only affects which candidates are considered (recall),
    never the reported distances or their order.
    """
    validate_metric(metric)
    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("_vec"))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(qvec_col).alias("_qvec")
    )
    from gofaiss_spark.functions.distance import paired_distance_udf

    scored = (
        candidates.select("query_id", "id")
        .join(v, "id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "id",
            # Arrow BLAS kernel, not the per-row zip_with expression:
            # candidates are queries × oversample·k pairs and the HOF
            # evaluation was the refine bottleneck at deep oversample
            paired_distance_udf(metric)("_vec", "_qvec").alias("distance"),
        )
    )
    return topk(scored, k)


def range_search(
    vectors: DataFrame,
    queries: DataFrame,
    threshold: float,
    metric: str = "l2",
    max_results: int | None = None,
    vec_col: str = "vec",
    qvec_col: str = "qvec",
    id_col: str = "id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """All neighbors within ``threshold``.

    The reference emulates this by oversampling top-(k·10) then
    filtering (pkg/search/search.go:165-189) — an approximation. Spark
    expresses it exactly as a filter on the scored join; documented as
    an intentional semantic improvement (SURVEY.md §4 row 12).
    """
    scored = score_pairs(
        vectors, queries, metric, vec_col, qvec_col, id_col, query_id_col
    )
    out = scored.filter(F.col("distance") <= F.lit(float(threshold)))
    if max_results is not None and max_results > 0:
        out = topk(out, max_results)
    else:
        out = topk(out, 0)
    return out
