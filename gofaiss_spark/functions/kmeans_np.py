"""Deterministic NumPy Lloyd k-means for subspace codebooks.

Reference: the kMeansSubspace routine (pkg/index/pq/pq.go:273-343,
duplicated at ivfpq.go:610-677): stride-sampled init (every n/k-th
vector of the id-ordered training set — ivf.go:256-268; the comment
there says k-means++ but the code strides), 10 Lloyd iterations,
early stop when assignments stabilize, empty clusters keep their
previous centroid.

This runs INSIDE an applyInPandas group (one subspace per group) on
a bounded training sample — never over the full table.
"""

from __future__ import annotations

import numpy as np


def stride_init(data: np.ndarray, k: int) -> np.ndarray:
    """Every n/k-th row of the (caller-sorted) training set."""
    n = data.shape[0]
    idx = (np.arange(k, dtype=np.int64) * n) // k
    return data[idx].copy()


def kmeanspp_init(data: np.ndarray, k: int, seed: int = 42) -> np.ndarray:
    """Seeded k-means++ (Arthur & Vassilvitskii 2007): each next
    center drawn ∝ squared distance to the closest chosen one.
    Deterministic given (data, k, seed). Plays the quality role of
    MLlib's k-means‖ init — stride init on uniform data costs ~2× the
    final distortion, which shows up directly as IVF candidate
    recall. O(n·k·d), bounded by the training-sample contract."""
    rng = np.random.default_rng(seed)
    n = data.shape[0]
    d32 = data.astype(np.float32)
    cents = np.empty((k, data.shape[1]), dtype=np.float64)
    i = int(rng.integers(n))
    cents[0] = data[i]
    d2 = ((d32 - d32[i]) ** 2).sum(axis=1).astype(np.float64)
    for j in range(1, k):
        tot = d2.sum()
        if tot <= 0:
            # degenerate: all points coincide with chosen centers
            cents[j:] = cents[0]
            break
        i = int(rng.choice(n, p=d2 / tot))
        cents[j] = data[i]
        nd = ((d32 - d32[i]) ** 2).sum(axis=1)
        np.minimum(d2, nd, out=d2)
    return cents


def lloyd_kmeans(
    data: np.ndarray,
    k: int,
    max_iter: int = 10,
    init: str = "stride",
    seed: int = 42,
) -> tuple[np.ndarray, np.ndarray]:
    """(centroids (k,d), assignments (n,)) — deterministic given row
    order (init="stride", the reference's scheme) or given seed
    (init="++", the quality path). Caller must pre-sort rows (e.g. by
    id) for reproducibility."""
    data = np.ascontiguousarray(data, dtype=np.float64)
    n = data.shape[0]
    if n < k:
        raise ValueError(f"need at least {k} training vectors, got {n}")
    cents = (
        kmeanspp_init(data, k, seed) if init == "++" else stride_init(data, k)
    )
    assign = np.full(n, -1, dtype=np.int64)
    d = data.shape[1]
    # f32 copy for the distance step: argmin of
    # ||x||² − 2⟨x,c⟩ + ||c||² needs neither the constant-per-row
    # ||x||² term nor f64 precision (ties may flip — no bit-parity
    # requirement, SURVEY §7 hard-part 4); centroid means stay f64
    data32 = data.astype(np.float32)
    block = 16384
    for _ in range(max_iter):
        c32 = cents.astype(np.float32)
        cent_sq = np.einsum("ij,ij->i", c32, c32)
        new_assign = np.empty(n, dtype=np.int64)
        for s in range(0, n, block):
            scores = data32[s:s + block] @ c32.T
            scores *= -2.0
            scores += cent_sq[None, :]
            new_assign[s:s + block] = np.argmin(scores, axis=1)
        if np.array_equal(new_assign, assign):
            break
        assign = new_assign
        # centroid update via per-dimension weighted bincount: O(n·d)
        # instead of the O(n·k) per-cluster boolean masks — at
        # k=256..316, n=50k the masks dominated the whole fit
        counts = np.bincount(assign, minlength=k).astype(np.float64)
        sums = np.empty((k, d), dtype=np.float64)
        for j in range(d):
            sums[:, j] = np.bincount(assign, weights=data[:, j], minlength=k)
        nonempty = counts > 0
        # empty cluster: keep previous centroid (ivf.go:296-313)
        cents[nonempty] = sums[nonempty] / counts[nonempty, None]
    return cents, assign
