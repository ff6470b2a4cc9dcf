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


def lloyd_kmeans(
    data: np.ndarray, k: int, max_iter: int = 10
) -> tuple[np.ndarray, np.ndarray]:
    """(centroids (k,d), assignments (n,)) — deterministic given row
    order. Caller must pre-sort rows (e.g. by id) for reproducibility."""
    data = np.ascontiguousarray(data, dtype=np.float64)
    n = data.shape[0]
    if n < k:
        raise ValueError(f"need at least {k} training vectors, got {n}")
    cents = stride_init(data, k)
    assign = np.full(n, -1, dtype=np.int64)
    data_sq = np.einsum("ij,ij->i", data, data)
    for _ in range(max_iter):
        cent_sq = np.einsum("ij,ij->i", cents, cents)
        d2 = data_sq[:, None] + cent_sq[None, :] - 2.0 * (data @ cents.T)
        new_assign = np.argmin(d2, axis=1)
        if np.array_equal(new_assign, assign):
            break
        assign = new_assign
        for c in range(k):
            mask = assign == c
            if mask.any():
                cents[c] = data[mask].mean(axis=0)
            # empty cluster: keep previous centroid (ivf.go:296-313)
    return cents, assign
