"""SemDeDup — semantic deduplication via cluster-scoped cosine
pruning (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication" — public paper).

Pipeline: k-means over embeddings (bounded training sample) →
assign every vector to its cell → WITHIN each cell only, drop every
vector whose cosine similarity to an earlier-kept one is ≥ the
threshold (deterministic lowest-id-wins greedy, so results are
engine-stable). The clustering bounds the quadratic term: pairwise
cosine is O(s²) per cell instead of O(n²) globally — the reason
SemDeDup scales where naive embedding dedup does not.

No reference analogue (gofaiss deduplicates nothing); part of the
LLM-pipeline surface alongside minhash/simhash/embedding near-dup
(operators/dedup.py).

Scale shape (100 TB):
- training is the bounded-sample contract (operators/ivf.py);
- assignment is the shuffle-free argmin Arrow kernel;
- the per-cell greedy runs inside ``applyInPandas`` — ONE shuffle
  keyed on the cell id. Cell sizes concentrate near n/k; pick
  n_clusters so s·dim fits an executor (the paper uses 50k clusters
  for LAION-scale corpora). A pathological giant cell is an AQE
  skew-split away from OOM, and the kernel caps the similarity
  matrix by blocking over rows.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["semdedup"]

_OUT_SCHEMA = (
    "id long, cluster_id int, keep boolean, dup_of long, cos_sim double"
)


def semdedup(
    vectors: DataFrame,
    n_clusters: int = 16,
    threshold: float = 0.95,
    seed: int = 42,
    train_fraction: float | None = None,
    vec_col: str = "vec",
    id_col: str = "id",
    trainer: str = "mllib",
) -> DataFrame:
    """(id, cluster_id, keep, dup_of, cos_sim) for every vector.

    keep=false rows carry the earlier-kept ``dup_of`` id they
    duplicate and the exact cosine similarity (≥ threshold). Greedy
    order is ascending id — deterministic given the clustering.
    """
    from gofaiss_spark.operators.ivf import (
        assign_to_centroids,
        train_kmeans_centroids,
    )

    train_df = vectors
    if train_fraction is not None and train_fraction < 1.0:
        train_df = vectors.sample(fraction=train_fraction, seed=seed)
    cents = train_kmeans_centroids(
        train_df, n_clusters, seed=seed, vec_col=vec_col, trainer=trainer
    )
    assigned = assign_to_centroids(vectors, cents, "l2", vec_col, id_col)

    thr = float(threshold)

    def dedup_cell(key, pdf: pd.DataFrame) -> pd.DataFrame:
        (cluster,) = key
        pdf = pdf.sort_values("id")
        ids = pdf["id"].to_numpy(dtype=np.int64)
        x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(x, axis=1)
        norms[norms == 0.0] = 1.0
        xn = x / norms[:, None]
        n = len(ids)
        keep = np.ones(n, dtype=bool)
        dup_of = np.full(n, -1, dtype=np.int64)
        sim_to = np.full(n, np.nan)
        # blocked greedy: compare each row only against earlier KEPT
        # rows; the block keeps peak memory at block×n instead of n²
        block = 4096
        for s in range(0, n, block):
            e = min(s + block, n)
            sims = xn[s:e] @ xn.T  # (b, n)
            for i in range(s, e):
                if not keep[i]:
                    continue
                row = sims[i - s]
                prior = np.where(keep[:i] & (row[:i] >= thr))[0]
                if len(prior):
                    j = int(prior[np.argmax(row[prior])])
                    keep[i] = False
                    dup_of[i] = ids[j]
                    sim_to[i] = row[j]
        return pd.DataFrame(
            {
                "id": ids,
                "cluster_id": np.full(n, cluster, dtype=np.int32),
                "keep": keep,
                "dup_of": np.where(keep, np.int64(-1), dup_of),
                "cos_sim": sim_to,
            }
        )

    out = (
        assigned.groupBy("list_id")
        .applyInPandas(dedup_cell, schema=_OUT_SCHEMA)
        .withColumn("dup_of", F.when(F.col("dup_of") >= 0, F.col("dup_of")))
    )
    return out
