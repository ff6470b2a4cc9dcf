"""IVFSQ — IVF coarse quantizer + SQ8 over residuals.

No reference analogue (gofaiss has IVF and IVFPQ only); this is the
FAISS `IVF,SQ8` config — in practice the sweet spot for serving:
nprobe partition pruning like IVF, 4× compression like SQ8, and
recall that tracks the pruning (not the quantizer) because the
per-dimension residual reconstruction error is bounded by one step.

Spark shape mirrors IVFPQ (operators/ivfpq.py): codes are
(id, list_id, code) written ``partitionBy("list_id")`` so nprobe
search prunes parquet partitions; search is the scan-once probe-map
kernel — codes are never joined to queries, and the per-list decode
runs once per (list, batch) from broadcast (centroids, vmin, step).
Reported distances carry the analytic bound ‖step‖₂ (hard-checked by
the driver's ivfsq_topk), and ``refine=`` re-ranks them exact.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gofaiss_spark.functions.distance import validate_metric
from gofaiss_spark.operators.ivf import (
    assign_to_centroids,
    default_nlist,
    probe_lists,
    train_kmeans_centroids,
)
from gofaiss_spark.operators.ivfpq import _with_residual
from gofaiss_spark.operators.sq import _LEVELS
from gofaiss_spark.operators.topk import RESULT_SCHEMA, topk


@dataclass
class IvfSqIndex:
    metric: str
    nlist: int
    dim: int
    centroids: np.ndarray  # (nlist, dim)
    vmin: np.ndarray = field(repr=False)  # (dim,) residual-space min
    vmax: np.ndarray = field(repr=False)  # (dim,) residual-space max
    codes: DataFrame = field(repr=False)  # (id, list_id, code array<smallint>)
    colocated: bool = False  # see IvfPqIndex.colocated

    @property
    def step(self) -> np.ndarray:
        rng = self.vmax - self.vmin
        return np.where(rng > 0, rng / _LEVELS, 0.0)

    def distance_error_bound(self) -> float:
        return float(np.linalg.norm(self.step))

    def list_sizes(self) -> DataFrame:
        return self.codes.groupBy("list_id").agg(
            F.count(F.lit(1)).alias("n_vectors")
        )

    def stats(self) -> dict:
        total = self.codes.count()
        return {
            "index_type": "ivfsq",
            "total_vectors": total,
            "dimension": self.dim,
            "metric": self.metric,
            "nlist": self.nlist,
            "levels": _LEVELS + 1,
            "compression_ratio": 4.0,
            # logical bytes: 1 byte/dim + 8-byte id per vector, plus
            # float32 centroids (reference-style accounting)
            "memory_mb": (total * (self.dim + 8) + self.nlist * self.dim * 4)
            / (1024 * 1024),
        }


def build_ivfsq(
    vectors: DataFrame,
    nlist: int | None = None,
    metric: str = "l2",
    seed: int = 42,
    train_fraction: float | None = None,
    min_train_factor: int = 10,
    vec_col: str = "vec",
    id_col: str = "id",
    trainer: str = "mllib",
) -> IvfSqIndex:
    """k-means centroids → assign → residual → per-dim residual
    min/max (ONE JVM aggregation) → SQ8-encode residuals (Arrow
    kernel). The residual pipeline is shared column lineage — no
    second assignment pass when training on the full set."""
    validate_metric(metric)
    if metric != "l2":
        raise ValueError(f"ivfsq supports l2 only, got {metric!r}")
    n = vectors.count()
    if nlist is None:
        nlist = default_nlist(n)
    first = vectors.select(F.size(vec_col).alias("d")).first()
    dim = int(first["d"])
    if n < nlist * min_train_factor:
        raise ValueError(
            f"need at least nlist*{min_train_factor} = {nlist * min_train_factor} "
            f"training vectors, got {n}"
        )
    train_df = None
    if train_fraction is not None and train_fraction < 1.0:
        train_df = vectors.sample(fraction=train_fraction, seed=seed)

    cents = train_kmeans_centroids(
        train_df if train_df is not None else vectors,
        nlist,
        seed=seed,
        vec_col=vec_col,
        trainer=trainer,
    )
    assigned = assign_to_centroids(vectors, cents, metric, vec_col, id_col)
    with_res = _with_residual(assigned, cents, vec_col).persist()

    aggs = []
    for j in range(dim):
        e = F.element_at(F.col("residual"), j + 1)
        aggs.append(F.min(e).alias(f"_mn{j}"))
        aggs.append(F.max(e).alias(f"_mx{j}"))
    row = with_res.agg(*aggs).first()
    vmin = np.array([row[f"_mn{j}"] for j in range(dim)], dtype=np.float64)
    vmax = np.array([row[f"_mx{j}"] for j in range(dim)], dtype=np.float64)
    rng = vmax - vmin
    step = np.where(rng > 0, rng / _LEVELS, 1.0)

    sc = vectors.sparkSession.sparkContext
    bc = sc.broadcast((vmin, step))

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mn, st = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["residual"].to_numpy()).astype(np.float64)
            codes = np.clip(np.rint((x - mn) / st), 0, _LEVELS).astype(np.int16)
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(),
                    "list_id": pdf["list_id"].to_numpy(),
                    "code": list(codes),
                }
            )

    codes = with_res.select("id", "list_id", "residual").mapInPandas(
        enc, schema="id long, list_id int, code array<smallint>"
    )
    return IvfSqIndex(
        metric=metric,
        nlist=nlist,
        dim=dim,
        centroids=cents,
        vmin=vmin,
        vmax=vmax,
        codes=codes,
    )


def search_ivfsq(
    index: IvfSqIndex,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 10,
    qvec_col: str = "qvec",
    query_id_col: str = "query_id",
    refine: int | None = None,
    base: DataFrame | None = None,
) -> DataFrame:
    """nprobe-pruned decode-and-score search; same scale rules as
    search_ivfpq (no query joins, broadcast probe map, per-list
    kernel work once per batch). ``refine=r`` re-ranks top-(k·r)
    exact."""
    if refine is not None:
        if refine < 1:
            raise ValueError(f"refine must be >= 1, got {refine}")
        if base is None:
            raise ValueError("refine requires base= (the original vectors)")
    k_cand = k * refine if refine is not None and k > 0 else k
    qrows = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(qvec_col).alias("qvec")
    ).toPandas()
    spark = index.codes.sparkSession
    if len(qrows) == 0:
        return spark.createDataFrame([], RESULT_SCHEMA + ", rank int")
    query_ids = qrows["query_id"].to_numpy(dtype=np.int64)
    query_mat = np.stack(qrows["qvec"].to_numpy()).astype(np.float64)

    probes = probe_lists(
        index.centroids, query_ids, query_mat, nprobe, index.metric
    )
    probed_list_ids = [int(x) for x in probes["list_id"].unique()]
    qindex = {int(qid): i for i, qid in enumerate(query_ids)}
    probe_map: dict[int, np.ndarray] = {}
    for qid, lid in zip(probes["query_id"], probes["list_id"]):
        probe_map.setdefault(int(lid), []).append(qindex[int(qid)])
    probe_map = {
        lid: np.asarray(v, dtype=np.int64) for lid, v in probe_map.items()
    }

    sc = spark.sparkContext
    bc = sc.broadcast(
        (query_mat, query_ids, probe_map, index.centroids, index.vmin, index.step)
    )

    candidates = index.codes.filter(
        F.col("list_id").isin(probed_list_ids)
    ).select("list_id", "id", "code")
    if not index.colocated:
        nparts = min(
            spark.sparkContext.defaultParallelism, max(1, len(probed_list_ids))
        )
        candidates = candidates.repartition(nparts, "list_id")

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qmat, qids_arr, pmap, cents, mn, st = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_q, out_i, out_d = [], [], []
            for lid, grp in pdf.groupby("list_id", sort=False):
                qidx = pmap.get(int(lid))
                if qidx is None:
                    continue
                rq = qmat[qidx] - cents[int(lid)][None, :]  # (nq, dim)
                codes = np.stack(grp["code"].to_numpy()).astype(np.float64)
                x = mn + codes * st  # decoded residuals (b, dim)
                ids = grp["id"].to_numpy(dtype=np.int64)
                b = x.shape[0]
                d2 = (
                    np.einsum("ij,ij->i", x, x)[None, :]
                    + np.einsum("ij,ij->i", rq, rq)[:, None]
                    - 2.0 * (rq @ x.T)
                )  # (nq, b)
                np.maximum(d2, 0.0, out=d2)
                kk = min(k_cand, b) if k_cand > 0 else b
                if kk < b:
                    sel = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
                else:
                    sel = np.broadcast_to(np.arange(b), (d2.shape[0], b))
                out_q.append(np.repeat(qids_arr[qidx], sel.shape[1]))
                out_i.append(ids[sel.ravel()])
                out_d.append(
                    np.sqrt(np.take_along_axis(d2, sel, axis=1).ravel())
                )
            if out_q:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(out_q),
                        "id": np.concatenate(out_i),
                        "distance": np.concatenate(out_d),
                    }
                )

    cand = candidates.mapInPandas(part, schema=RESULT_SCHEMA)
    if refine is not None:
        from gofaiss_spark.operators.topk import refine_exact

        return refine_exact(
            topk(cand, k_cand),
            base,
            queries,
            k,
            metric=index.metric,
            qvec_col=qvec_col,
            query_id_col=query_id_col,
        )
    return topk(cand, k)
