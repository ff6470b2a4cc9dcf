"""Diversity-aware re-ranking: maximal marginal relevance (MMR) over
the candidate set of any search operator.

`MMR(d) = λ·sim(q, d) − (1−λ)·max_{s∈selected} sim(d, s)` — greedy
selection of k results that are both relevant and mutually diverse
(Carbonell & Goldstein 1998). No reference analogue (gofaiss returns
raw top-k); this is the standard post-ANN diversification step in
retrieval serving.

Spark shape: the greedy loop is inherently sequential PER QUERY but
embarrassingly parallel ACROSS queries, and it only ever sees the
candidate list (≤ k·oversample rows/query) — so it runs as an
`applyInPandas` group per query over the candidate join, never
touching the corpus. Candidate vectors arrive via one narrow
equi-join on id (only candidate ids are fetched); query vectors ride
the broadcast. Similarity = −L2 (monotone-equivalent to the search
metric's ordering for l2)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["mmr_rerank"]


def _greedy_mmr(
    ids: np.ndarray,
    dvecs: np.ndarray,
    qvec: np.ndarray,
    k: int,
    lam: float,
) -> np.ndarray:
    """Deterministic greedy MMR over one query's candidates: ties
    break toward the lower id. Returns selected positions in pick
    order."""
    n = len(ids)
    rel = -np.linalg.norm(dvecs - qvec[None, :], axis=1)  # sim(q, d)
    pair = -np.linalg.norm(
        dvecs[:, None, :] - dvecs[None, :, :], axis=2
    )  # sim(d_i, d_j)
    selected: list[int] = []
    remaining = np.ones(n, dtype=bool)
    for _ in range(min(k, n)):
        if selected:
            div = pair[:, selected].max(axis=1)
        else:
            div = np.zeros(n)
        score = lam * rel - (1.0 - lam) * div
        score[~remaining] = -np.inf
        best = np.lexsort((ids, -score))[0]  # max score, min id on ties
        selected.append(int(best))
        remaining[best] = False
    return np.asarray(selected, dtype=np.int64)


def mmr_rerank(
    candidates: DataFrame,
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    lam: float = 0.7,
    vec_col: str = "vec",
    id_col: str = "id",
    qvec_col: str = "qvec",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Re-rank `candidates` (query_id, id, distance, …) to k diverse
    results per query. Returns (query_id, id, distance, rank) with
    rank = MMR pick order.

    Plan: candidates ⋈ vectors on id (narrow — only candidate ids),
    query vectors broadcast, one `applyInPandas` group per query over
    ≤ |candidates/query| rows. Cost is independent of corpus size."""
    spark = candidates.sparkSession
    qrows = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(qvec_col).alias("qvec")
    ).collect()
    qmap = {
        int(r["query_id"]): np.asarray(r["qvec"], dtype=np.float64)
        for r in qrows
    }
    bc = spark.sparkContext.broadcast(qmap)
    lam_f = float(lam)

    joined = candidates.select("query_id", "id", "distance").join(
        vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("_v")),
        "id",
    )

    def per_query(key, pdf: pd.DataFrame) -> pd.DataFrame:
        (qid,) = key
        qvec = bc.value.get(int(qid))
        if qvec is None or len(pdf) == 0:
            return pd.DataFrame(
                {"query_id": [], "id": [], "distance": [], "rank": []}
            ).astype(
                {"query_id": "int64", "id": "int64",
                 "distance": "float64", "rank": "int32"}
            )
        pdf = pdf.sort_values("id").reset_index(drop=True)
        ids = pdf["id"].to_numpy(dtype=np.int64)
        dvecs = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
        sel = _greedy_mmr(ids, dvecs, qvec, k, lam_f)
        return pd.DataFrame(
            {
                "query_id": np.full(len(sel), int(qid), dtype=np.int64),
                "id": ids[sel],
                "distance": pdf["distance"].to_numpy()[sel],
                "rank": np.arange(1, len(sel) + 1, dtype=np.int32),
            }
        )

    return joined.groupBy("query_id").applyInPandas(
        per_query, schema="query_id long, id long, distance double, rank int"
    )
