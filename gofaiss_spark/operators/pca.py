"""Dimensionality reduction (PCA) for embedding columns.

No reference analogue — gofaiss quantizes in the original space — but
PCA-before-PQ is the classic companion transform (FAISS pairs
PCAMatrix/OPQ with IVFPQ), and at 100 TB the projection pays for
itself immediately: a 64→32 cut halves every downstream shuffle,
ADC table, and artifact.

Spark-first: training uses ``pyspark.ml.feature.PCA`` (JVM-side
distributed covariance + driver eigendecomposition of the tiny
dim×dim matrix); the fitted components are exported to NumPy with
deterministic sign canonicalization, persisted like any other index
artifact, and applied by an Arrow-batched matmul kernel.

Note Spark's ML PCA does not mean-center at transform time; that is
a pure translation in the projected space, so **L2 distances between
projected points are unaffected** — which is the property similarity
search needs. Projection by an orthonormal row basis is a
contraction: ``||P(x−y)|| ≤ ||x−y||``, with equality at k=dim (then
the projection is a rotation and top-k results are identical to the
original space — both gated in tests/test_pca.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class PcaModel:
    dim: int
    k: int
    components: np.ndarray = field(repr=False)  # (k, dim), orthonormal rows
    explained_variance: np.ndarray = field(repr=False)  # (k,), descending

    def stats(self) -> dict:
        return {
            "dim": self.dim,
            "k": self.k,
            "explained_variance_ratio": float(
                np.sum(self.explained_variance)
            ),
            "memory_mb": round(self.components.nbytes / 2**20, 4),
        }


def _canonicalize_signs(components: np.ndarray) -> np.ndarray:
    """Eigenvectors are sign-ambiguous; flip each so its
    largest-magnitude entry is positive — deterministic across
    runs/backends."""
    out = components.copy()
    for i in range(out.shape[0]):
        j = int(np.argmax(np.abs(out[i])))
        if out[i, j] < 0:
            out[i] = -out[i]
    return out


def train_pca(vectors: DataFrame, k: int, vec_col: str = "vec") -> PcaModel:
    """Fit a k-component PCA over an embedding column.

    The covariance accumulates distributively on the JVM
    (one pass, map-side partials); only the dim×dim Gramian reaches
    the driver."""
    from pyspark.ml.feature import PCA as MlPca
    from pyspark.ml.functions import array_to_vector

    first = vectors.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("train_pca: empty vectors DataFrame")
    dim = first["d"]
    if not 0 < k <= dim:
        raise ValueError(f"need 0 < k <= dim={dim}, got k={k}")
    feats = vectors.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("_f")
    )
    model = MlPca(k=k, inputCol="_f", outputCol="_p").fit(feats)
    comps = _canonicalize_signs(np.asarray(model.pc.toArray()).T)  # (k, dim)
    ev = np.asarray(model.explainedVariance)
    return PcaModel(dim=dim, k=k, components=comps, explained_variance=ev)


def apply_pca(
    df: DataFrame,
    model: PcaModel,
    vec_col: str = "vec",
    out_col: str | None = None,
) -> DataFrame:
    """Project the embedding column onto the principal axes
    (``X @ Wᵀ``). Arrow-batched BLAS matmul via pandas_udf — all
    other columns pass through untouched, so this drops into any
    pipeline before build_pq/build_ivfpq."""
    from pyspark.sql.pandas.functions import pandas_udf

    out_col = out_col or vec_col
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(model.components.astype(np.float64))

    @pandas_udf("array<float>")
    def _project(col: pd.Series) -> pd.Series:
        w = bc.value
        x = np.stack(col.to_numpy())  # (b, dim)
        y = x.astype(np.float64) @ w.T  # (b, k)
        return pd.Series(list(y.astype(np.float32)))

    return df.withColumn(out_col, _project(F.col(vec_col)))
