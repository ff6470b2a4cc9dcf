"""OPQ — Optimized Product Quantization (Ge et al., CVPR 2013;
FAISS `OPQMatrix` / index factory "OPQ16,PQ16" — public knowledge).

PQ quantizes fixed dim-slices, so its error depends on how variance
and correlation align with the subspace boundaries. OPQ learns an
orthogonal rotation R that minimizes quantization error before PQ:
alternate (a) PQ-train on the rotated sample and (b) solve the
orthogonal Procrustes problem R = argmin ||XR − X̂|| = U·Vᵀ from the
SVD of Xᵀ X̂. Rotation preserves L2, so search in rotated space
returns the same metric as the original.

No reference analogue (gofaiss stops at plain PQ, pq.go). This is
the composed-transform capability of SURVEY §2.2's PCA row taken to
its FAISS conclusion (IndexPreTransform).

Scale shape (100 TB):
- R is trained driver-side on the bounded sample (the training
  contract, operators/ivf.py) — a dim×dim matrix, tiny;
- the full-corpus encode FUSES rotate+encode into one Arrow kernel
  (R and codebooks ride the closure) — one pass, no shuffle;
- search rotates the query batch (bounded) the same way and reuses
  the PQ ADC kernel unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gofaiss_spark.operators.pq import PqIndex, validate_pq_params

__all__ = [
    "OpqIndex", "build_opq", "search_opq", "spectral_concentration",
    "train_opq_rotation",
]


@dataclass
class OpqIndex:
    """Rotation + the rotated-space PQ index (codes store R·x)."""

    dim: int
    m: int
    nbits: int
    rotation: np.ndarray  # (dim, dim), orthogonal
    pq: PqIndex = field(repr=False)
    #: True when the rotation was actually trained (False = identity:
    #: rotate="auto" measured a flat eigenspectrum and skipped it)
    rotation_trained: bool = True
    #: the measured top-(dim//4) energy fraction (rotate="auto" only)
    spectral_energy: float | None = None

    def stats(self) -> dict:
        s = self.pq.stats()
        s["index_type"] = "opq"
        s["memory_mb"] = s["memory_mb"] + (self.dim * self.dim * 4) / (1024 * 1024)
        s["rotation_trained"] = self.rotation_trained
        if self.spectral_energy is not None:
            s["spectral_energy"] = round(self.spectral_energy, 4)
        return s


#: rotate="auto" trains the rotation only when the top dim//4
#: eigenvalues of the training sample's covariance carry at least
#: this fraction of total variance (measured rule, BENCH_AB
#: opq_10m_pareto_r10: OPQ is a no-op on full-rank/uniform data —
#: top-quarter energy ≈ 0.25-0.35 — and 1.41x recall on rank-16
#: low-rank data, where it is ≈ 1.0).
AUTO_ROTATE_ENERGY = 0.6


def spectral_concentration(data: np.ndarray) -> float:
    """Fraction of total variance in the top ``dim//4`` eigenvalues
    of the (mean-centered) sample covariance — the rotate="auto"
    decision statistic. Cheap: one dim x dim eigendecomposition on
    the already-collected training sample."""
    x = np.ascontiguousarray(data, dtype=np.float64)
    x = x - x.mean(axis=0, keepdims=True)
    cov = x.T @ x
    eigs = np.linalg.eigvalsh(cov)  # ascending
    total = float(eigs.sum())
    if total <= 0:
        return 0.0
    top_r = max(1, x.shape[1] // 4)
    return float(eigs[-top_r:].sum()) / total


def train_opq_rotation(
    data: np.ndarray,
    m: int,
    nbits: int,
    n_iter: int = 10,
    kmeans_iter: int = 10,
    seed: int = 42,
) -> tuple[np.ndarray, np.ndarray]:
    """(R (dim,dim), codebooks (M,ksub,dsub)) by alternating
    minimization on a driver-resident sample. Deterministic given
    (data, seed)."""
    from gofaiss_spark.functions.kmeans_np import lloyd_kmeans

    data = np.ascontiguousarray(data, dtype=np.float64)
    n, dim = data.shape
    ksub, dsub = validate_pq_params(dim, m, nbits)
    r = np.eye(dim)
    codebooks = np.zeros((m, ksub, dsub))
    for it in range(n_iter):
        xr = data @ r
        # (a) PQ-train on rotated data; (b) reconstruct x̂
        recon = np.empty_like(xr)
        for j in range(m):
            sl = slice(j * dsub, (j + 1) * dsub)
            cb, assign = lloyd_kmeans(
                xr[:, sl], ksub, max_iter=kmeans_iter, init="++", seed=seed + j
            )
            codebooks[j] = cb
            recon[:, sl] = cb[assign]
        # (c) Procrustes: R = U Vᵀ of Xᵀ X̂
        u, _, vt = np.linalg.svd(data.T @ recon)
        r = u @ vt
    return r, codebooks


def _rotate_encode_fused(
    vectors: DataFrame,
    rotation: np.ndarray,
    codebooks: np.ndarray,
    vec_col: str = "vec",
    id_col: str = "id",
) -> DataFrame:
    rot = np.ascontiguousarray(rotation)
    cb = np.ascontiguousarray(codebooks)
    mm, ksub, dsub = cb.shape
    cb_sq = np.einsum("mkd,mkd->mk", cb, cb)

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64) @ rot
            b = x.shape[0]
            subs = x.reshape(b, mm, dsub)
            codes = np.empty((b, mm), dtype=np.int16)
            for j in range(mm):
                s = subs[:, j, :]
                d2 = (
                    np.einsum("ij,ij->i", s, s)[:, None]
                    + cb_sq[j][None, :]
                    - 2.0 * (s @ cb[j].T)
                )
                codes[:, j] = np.argmin(d2, axis=1).astype(np.int16)
            yield pd.DataFrame(
                {"id": pdf[id_col].to_numpy(dtype=np.int64), "code": list(codes)}
            )

    return vectors.select(id_col, vec_col).mapInPandas(
        part, schema="id long, code array<smallint>"
    )


def _train_pq_identity(
    data: np.ndarray, m: int, nbits: int, kmeans_iter: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Plain per-subspace PQ codebooks on the UNROTATED sample — the
    rotate="auto" skip path (one k-means pass per subspace, no
    alternating minimization, no Procrustes SVDs)."""
    from gofaiss_spark.functions.kmeans_np import lloyd_kmeans

    data = np.ascontiguousarray(data, dtype=np.float64)
    dim = data.shape[1]
    ksub, dsub = validate_pq_params(dim, m, nbits)
    codebooks = np.zeros((m, ksub, dsub))
    for j in range(m):
        sl = slice(j * dsub, (j + 1) * dsub)
        codebooks[j], _ = lloyd_kmeans(
            data[:, sl], ksub, max_iter=kmeans_iter, init="++", seed=seed + j
        )
    return codebooks


def build_opq(
    vectors: DataFrame,
    m: int = 8,
    nbits: int = 8,
    n_iter: int = 10,
    train_fraction: float | None = None,
    seed: int = 42,
    rotate: bool | str = True,
    vec_col: str = "vec",
    id_col: str = "id",
) -> OpqIndex:
    """Train R + codebooks on the bounded sample, then one fused
    rotate+encode pass over the full set.

    ``rotate``: ``True`` always trains the rotation (the classic
    OPQ); ``False`` skips it (identity R — plain PQ wearing the OPQ
    interface); ``"auto"`` applies the measured decision rule
    (BENCH_AB opq_10m_pareto_r10, r10-verdict item 7): train the
    rotation only when the training sample's eigenspectrum is
    concentrated (top dim//4 energy >= AUTO_ROTATE_ENERGY), because
    on flat-spectrum data the alternating minimization provably buys
    nothing (recall 0.9337 -> 0.9354 at 10M) while costing ~n_iter
    SVD+kmeans rounds."""
    from gofaiss_spark.operators.ivf import collect_vector_matrix

    dim = int(vectors.select(F.first(F.size(vec_col)).alias("d")).collect()[0]["d"])
    validate_pq_params(dim, m, nbits)
    train_df = vectors
    if train_fraction is not None and train_fraction < 1.0:
        train_df = vectors.sample(fraction=train_fraction, seed=seed)
    data = collect_vector_matrix(train_df, vec_col, order_col=id_col)
    energy = None
    do_rotate = rotate
    if rotate == "auto":
        energy = spectral_concentration(data)
        do_rotate = energy >= AUTO_ROTATE_ENERGY
    elif not isinstance(rotate, bool):
        raise ValueError(f"rotate must be True/False/'auto', got {rotate!r}")
    if do_rotate:
        rotation, codebooks = train_opq_rotation(
            data, m, nbits, n_iter=n_iter, seed=seed
        )
    else:
        rotation = np.eye(dim)
        codebooks = _train_pq_identity(data, m, nbits, seed=seed)
    codes = _rotate_encode_fused(vectors, rotation, codebooks, vec_col, id_col)
    pq = PqIndex(dim=dim, m=m, nbits=nbits, codebooks=codebooks, codes=codes)
    return OpqIndex(
        dim=dim, m=m, nbits=nbits, rotation=rotation, pq=pq,
        rotation_trained=bool(do_rotate), spectral_energy=energy)


def _rotate_queries(
    queries: DataFrame,
    rotation: np.ndarray,
    qvec_col: str = "qvec",
    query_id_col: str = "query_id",
) -> DataFrame:
    rot = np.ascontiguousarray(rotation)

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf[qvec_col].to_numpy()).astype(np.float64) @ rot
            yield pd.DataFrame(
                {
                    query_id_col: pdf[query_id_col].to_numpy(dtype=np.int64),
                    qvec_col: list(x.astype(np.float32)),
                }
            )

    return queries.select(query_id_col, qvec_col).mapInPandas(
        part, schema=f"{query_id_col} long, {qvec_col} array<float>"
    )


def search_opq(
    index: OpqIndex,
    queries: DataFrame,
    k: int = 10,
    refine: int | None = None,
    base: DataFrame | None = None,
    qvec_col: str = "qvec",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Rotate the query batch, then the standard PQ ADC search.
    Rotation is an isometry, so reported (approximate) distances are
    in the ORIGINAL space's L2 — and ``refine`` re-ranks against the
    original, unrotated base exactly as for PQ."""
    from gofaiss_spark.operators.pq import search_pq

    rq = _rotate_queries(queries, index.rotation, qvec_col, query_id_col)
    if refine is None:
        return search_pq(index.pq, rq, k=k)
    if base is None:
        raise ValueError("refine requires base vectors")
    # candidates in rotated space, exact re-rank in original space
    from gofaiss_spark.operators.topk import refine_exact

    cand = search_pq(index.pq, rq, k=max(k, k * refine))
    return refine_exact(cand, base, queries, k)
