"""Driver-colocated serving: the single-node in-memory operating
point.

The reference is a single-process in-memory server — its published
QPS (BASELINE.md: HNSW 24,086, flat 35.85 @100k) is measured with
the index resident in RAM and zero scheduling overhead. Our
distributed plans pay a per-job floor that dominates at small corpus
sizes; when an index FITS one node (the only regime the reference
supports at all), the honest comparison is to serve it the same way:
collect once, answer query batches with blocked BLAS GEMMs
in-process.

``to_local(flat_index)`` materializes a ``LocalFlatIndex``;
``search(qmat, k)`` answers a query matrix with exact top-k. This is
the serving-tier pattern for production ANN too: the 100 TB corpus
lives in partitioned Parquet (the distributed paths build and refresh
it), while hot serving replicas hold a shard in memory.

Scale posture: bounded by driver/replica RAM by construction (the
same bound the reference lives under — 16 GB in its published runs);
everything larger goes through the distributed search paths.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from gofaiss_spark.functions.distance import validate_metric

__all__ = ["LocalFlatIndex", "to_local"]


@dataclass
class LocalFlatIndex:
    ids: np.ndarray  # (n,) int64
    vecs: np.ndarray  # (n, dim) float32, rows pre-normalized for cosine
    metric: str
    norms_sq: np.ndarray  # (n,) float32 (l2 only)

    def search(self, qmat: np.ndarray, k: int = 10,
               block: int | None = None,
               tile: int | None = None) -> tuple[np.ndarray, np.ndarray]:
        """Exact top-k for a query matrix: (ids (q, k), dists (q, k)),
        ascending by (distance, id) — identical ordering contract to
        search_flat.

        Kernel shape (the FAISS knn blocked brute-force): queries in
        blocks of ``block``, base in tiles of ``tile``, so every score
        tile (block × tile f32 ≈ 4 MB) stays cache-resident with a
        running top-k merge per block — a full (q × n) score matrix
        would stream hundreds of MB through DRAM per pass and leave
        the kernel bandwidth-bound. Blocks run on a thread pool (the
        non-GEMM numpy ops release the GIL). f32 generates the
        top-(k+16) candidates; an exact f64 re-score makes reported
        distances and orderings identical to the distributed kernel
        (the refine_exact pattern)."""
        q = np.ascontiguousarray(qmat, dtype=np.float32)
        if self.metric == "cosine":
            qn = np.linalg.norm(q, axis=1, keepdims=True)
            qn[qn == 0] = 1.0
            q = q / qn
        nq = q.shape[0]
        if block is None:
            # measured @100k: small blocks win small batches (more
            # thread parallelism), bigger blocks win sustained load
            # (less per-block overhead)
            block = 128 if nq <= 2048 else 256
        if tile is None:
            tile = 64 * block
        n = len(self.ids)
        k = min(k, n) if k > 0 else n
        k2 = min(n, k + 16)
        out_ids = np.empty((nq, k), dtype=np.int64)
        out_d = np.empty((nq, k), dtype=np.float64)
        vt = self._vt()

        def do_block(s: int) -> None:
            qb = q[s:s + block]
            b = qb.shape[0]
            best_s = best_i = None
            sc_buf = np.empty((b, tile), dtype=np.float32)
            for t0 in range(0, n, tile):
                te = min(t0 + tile, n)
                w = te - t0
                sc = sc_buf[:, :w]
                np.matmul(qb, vt[:, t0:te], out=sc)
                if self.metric == "l2":
                    sc *= -2.0
                    sc += self.norms_sq[None, t0:te]
                elif self.metric == "cosine":
                    np.subtract(1.0, sc, out=sc)
                else:
                    np.negative(sc, out=sc)
                kk = min(k2, w)
                p = np.argpartition(sc, kk - 1, axis=1)[:, :kk]
                psc = np.take_along_axis(sc, p, axis=1)
                pid = p.astype(np.int64) + t0
                if best_s is None:
                    best_s, best_i = psc.copy(), pid
                else:
                    cs = np.concatenate([best_s, psc], axis=1)
                    ci = np.concatenate([best_i, pid], axis=1)
                    sel = np.argpartition(cs, k2 - 1, axis=1)[:, :k2]
                    best_s = np.take_along_axis(cs, sel, axis=1)
                    best_i = np.take_along_axis(ci, sel, axis=1)
            # exact f64 re-score of the surviving candidates
            cand = self.vecs[best_i].astype(np.float64)  # (b, k2, dim)
            qb64 = qb.astype(np.float64)
            if self.metric == "l2":
                diff = cand - qb64[:, None, :]
                d = np.sqrt(np.einsum("bkd,bkd->bk", diff, diff))
            elif self.metric == "cosine":
                # rows are pre-normalized; clamp like the distributed
                # kernel (distance.go:55-71 semantics)
                d = 1.0 - np.clip(np.einsum("bkd,bd->bk", cand, qb64), -1.0, 1.0)
            else:
                d = -np.einsum("bkd,bd->bk", cand, qb64)
            pid = self.ids[best_i]
            order = np.lexsort((pid, d), axis=1)[:, :k]  # asc (dist, id)
            out_ids[s:s + block] = np.take_along_axis(pid, order, axis=1)
            out_d[s:s + block] = np.take_along_axis(d, order, axis=1)

        starts = list(range(0, nq, block))
        if len(starts) > 1:
            import os as _os
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(
                max_workers=min(len(starts), _os.cpu_count() or 8)
            ) as pool:
                list(pool.map(do_block, starts))
        else:
            for s in starts:
                do_block(s)
        return out_ids, out_d

    def _vt(self) -> np.ndarray:
        if getattr(self, "_vt_cache", None) is None:
            self._vt_cache = np.ascontiguousarray(self.vecs.T)
        return self._vt_cache


def to_local(index_or_vectors, vec_col: str = "vec",
             id_col: str = "id", metric: str | None = None) -> LocalFlatIndex:
    """Collect a FlatIndex (or a (id, vec) DataFrame) into a
    driver-resident server. One Arrow collect; bounded by driver RAM
    by contract."""
    from gofaiss_spark.operators.flat import FlatIndex

    if isinstance(index_or_vectors, FlatIndex):
        df = index_or_vectors.vectors
        metric = metric or index_or_vectors.metric
    else:
        df = index_or_vectors
        metric = metric or "l2"
    validate_metric(metric)
    pdf = df.select(id_col, vec_col).orderBy(id_col).toPandas()
    ids = pdf[id_col].to_numpy(dtype=np.int64)
    vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float32)
    if metric == "cosine":
        n = np.linalg.norm(vecs, axis=1, keepdims=True)
        n[n == 0] = 1.0
        vecs = vecs / n
    norms_sq = np.einsum("ij,ij->i", vecs, vecs)
    return LocalFlatIndex(ids=ids, vecs=np.ascontiguousarray(vecs),
                          metric=metric, norms_sq=norms_sq)
