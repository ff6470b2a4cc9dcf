"""IVF — inverted-file index via k-means partitioning.

Reference: pkg/index/ivf/ivf.go. Train = k-means over a training set
(ivf.go:70-83, 10 Lloyd iterations); Add = assign each vector to its
nearest centroid's inverted list (ivf.go:93-112); Search = scan only
the ``nprobe`` nearest lists (ivf.go:115-161).

Spark shape (SURVEY.md §1.3):
- centroids: a SMALL DataFrame/ndarray (nlist ≤ 65536 → ≤ 67 MB at
  dim=128) — always broadcastable.
- assignments: (id, vec, list_id) — the big table. Persist with
  ``partitionBy("list_id")`` so nprobe search becomes Catalyst
  partition pruning (SURVEY.md §4 row 4): a probe of 10/316 lists
  reads ~3% of the files. This is THE scale property of IVF — at
  100 TB the scan cost is data × nprobe/nlist.
- search: per-query top-nprobe over centroids is a driver-side NumPy
  argsort (tiny); candidate scan is a partition-pruned filter + a
  broadcast join against the (query_id, list_id) probe pairs; top-k
  is the two-phase local top-k (no n×q shuffle).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gofaiss_spark.functions.distance import np_distance_matrix, validate_metric
from gofaiss_spark.operators.topk import RESULT_SCHEMA, topk


def default_nlist(n: int) -> int:
    """nlist = √n clamped to [10, 65536] (ivf.go:32-45)."""
    return max(10, min(65536, int(math.sqrt(n))))


@dataclass
class IvfIndex:
    """An IVF index artifact: broadcast-size centroids + the big
    assignments DataFrame (id, vec, list_id)."""

    metric: str
    nlist: int
    dim: int
    centroids: np.ndarray  # (nlist, dim) float64
    assignments: DataFrame = field(repr=False)

    def to_local(self):
        """Driver-colocated serving copy (operators/local_serve.py
        LocalIvfIndex): collect the assignments once into a cell-major
        CSR layout, answer query batches in-process with nprobe
        pruning — the single-node serving tier; bounded by replica RAM
        by contract."""
        from gofaiss_spark.operators.local_serve import to_local_ivf

        return to_local_ivf(self)

    def list_sizes(self) -> DataFrame:
        """groupBy(list_id).count() (ivf.go:227-236)."""
        return self.assignments.groupBy("list_id").agg(
            F.count(F.lit(1)).alias("n_vectors")
        )

    def stats(self) -> dict:
        """Stats parity (ivf.go:199-224): totals + params +
        memory_mb = (n·dim·4 + nlist·dim·4)/MiB."""
        total = self.assignments.count()
        return {
            "index_type": "ivf",
            "total_vectors": total,
            "dimension": self.dim,
            "metric": self.metric,
            "nlist": self.nlist,
            "trained": True,
            "memory_mb": ((total + self.nlist) * self.dim * 4) / (1024 * 1024),
        }


# Training sets at or below this cell count (rows × dim) are
# collected and trained driver-side with the deterministic NumPy
# Lloyd kernel. k-means training is ALWAYS over a bounded sample
# (the reference trains on 5k of 100k,
# benchmark_comparison.go:258-263; at 100 TB you set train_fraction),
# so the collect is bounded by contract — 32M cells ≈ 256 MB f64 ≈
# 250k rows at dim=128. MLlib's k-means‖ launches ~2·initSteps +
# maxIter distributed jobs, a fixed multi-second floor that dwarfs
# the arithmetic at sample scale; one BLAS Lloyd loop is ~100× faster
# there, and bigger training sets still go distributed.
LOCAL_TRAIN_MAX_CELLS = 32_000_000


def collect_vector_matrix(df, vec_col: str = "vec", order_col: str | None = "id"):
    """Collect a (bounded) vector column to a float64 matrix, Arrow
    path first (toPandas is ~2x plain collect for array columns; falls
    back transparently when Arrow is off in the session)."""
    if order_col is not None and order_col in df.columns:
        df = df.orderBy(order_col)
    pdf = df.select(F.col(vec_col).alias("_v")).toPandas()
    return np.array([np.asarray(v) for v in pdf["_v"]], dtype=np.float64)


def train_kmeans_centroids(
    vectors: DataFrame,
    k: int,
    seed: int = 42,
    max_iter: int = 10,
    vec_col: str = "vec",
    trainer: str = "mllib",
) -> np.ndarray:
    """k-means → (k, dim) centroids.

    Plays ivf.go:255-317's Lloyd loop. maxIter=10 keeps parity with
    the reference's iteration budget. Requires n ≥ k (ivf.go:75-77).

    ``trainer="mllib"`` (default): MLlib KMeans — distributed, init
    k-means‖. ``trainer="local"``: collect the training set (bounded
    by LOCAL_TRAIN_MAX_CELLS) and run the driver-side BLAS Lloyd with
    seeded k-means++ init — ~5-10× faster at sample scale, and its
    centroids converge tighter (lower distortion → near-uniform list
    sizes, no straggler partitions at scale). Tradeoff, measured at
    100k uniform-random: balanced lists cover FEWER true neighbors
    per probed cell than MLlib's under-converged imbalanced ones, so
    recall at a fixed nprobe is lower (0.36 vs 0.51 at nprobe=10/316)
    even though cost per probe is proportionally lower too. Default
    stays "mllib" to keep the recorded recall/QPS operating points;
    pick "local" for build-speed or balanced-partition serving.
    """
    if trainer == "local":
        n = vectors.count()
        dim_row = vectors.select(F.size(vec_col).alias("d")).first()
        dim = int(dim_row["d"]) if dim_row is not None else 0
        if n * dim <= LOCAL_TRAIN_MAX_CELLS:
            from gofaiss_spark.functions.kmeans_np import lloyd_kmeans

            data = collect_vector_matrix(vectors, vec_col)
            cents, _ = lloyd_kmeans(data, k, max_iter=max_iter, init="++", seed=seed)
            return cents
        # falls through to MLlib when the sample exceeds the bound

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = vectors.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=k, maxIter=max_iter, seed=seed, featuresCol="features").fit(feats)
    return np.asarray(
        [np.asarray(c, dtype=np.float64) for c in model.clusterCenters()]
    )


def assign_to_centroids(
    vectors: DataFrame,
    centroids: np.ndarray,
    metric: str = "l2",
    vec_col: str = "vec",
    id_col: str = "id",
) -> DataFrame:
    """Argmin-join assignment (ivf.go:93-112, findNearestCentroid
    ivf.go:240-252): each vector → nearest centroid's list_id.

    Physical plan: the centroid matrix rides the UDF closure (a
    broadcast); per Arrow batch one BLAS distance matrix + argmin. No
    shuffle — the output keeps the input partitioning.
    """
    validate_metric(metric)
    cents = np.ascontiguousarray(centroids, dtype=np.float64)

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            base = np.stack(pdf[vec_col].to_numpy())
            dmat = np_distance_matrix(base, cents, metric)  # (B, nlist)
            pdf = pdf[[id_col, vec_col]].copy()
            pdf["list_id"] = np.argmin(dmat, axis=1).astype(np.int32)
            yield pdf

    out_schema = f"{id_col} long, {vec_col} array<float>, list_id int"
    return vectors.select(id_col, vec_col).mapInPandas(part, schema=out_schema)


def build_ivf(
    vectors: DataFrame,
    nlist: int | None = None,
    metric: str = "l2",
    seed: int = 42,
    train_fraction: float | None = None,
    vec_col: str = "vec",
    id_col: str = "id",
    trainer: str = "mllib",
) -> IvfIndex:
    """Train + Add in one pass (ivf.go:70-112).

    ``train_fraction`` subsamples the training set (the reference
    trains on 5k of 100k, benchmark_comparison.go:258-263); full
    assignment always covers every vector. ``trainer`` picks the
    coarse k-means backend (see train_kmeans_centroids).
    """
    validate_metric(metric)
    n = vectors.count()
    if nlist is None:
        nlist = default_nlist(n)
    if n < nlist:
        raise ValueError(f"need at least {nlist} training vectors, got {n}")
    train_df = vectors
    if train_fraction is not None and train_fraction < 1.0:
        train_df = vectors.sample(fraction=train_fraction, seed=seed)
    sample = train_df.select(F.first(F.size(vec_col)).alias("d")).collect()
    dim = int(sample[0]["d"])
    cents = train_kmeans_centroids(
        train_df, nlist, seed=seed, vec_col=vec_col, trainer=trainer
    )
    assignments = assign_to_centroids(vectors, cents, metric, vec_col, id_col)
    return IvfIndex(
        metric=metric, nlist=nlist, dim=dim, centroids=cents, assignments=assignments
    )


def probe_lists(
    centroids: np.ndarray,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    nprobe: int,
    metric: str,
) -> pd.DataFrame:
    """Stage 1 of search (ivf.go:131-141): per query the nprobe
    nearest centroids. Driver-side NumPy — the centroid table is tiny
    by construction. nprobe ≤ 0 or > nlist ⇒ nlist (ivf.go:122-129)."""
    nlist = centroids.shape[0]
    if nprobe <= 0 or nprobe > nlist:
        nprobe = nlist
    dmat = np_distance_matrix(centroids, query_mat, metric)  # (nlist, q)
    if nprobe < nlist:
        sel = np.argpartition(dmat, nprobe - 1, axis=0)[:nprobe, :]
    else:
        sel = np.broadcast_to(np.arange(nlist)[:, None], (nlist, dmat.shape[1]))
    q = query_mat.shape[0]
    return pd.DataFrame(
        {
            "query_id": np.repeat(query_ids, sel.shape[0]),
            "list_id": sel.ravel(order="F").astype(np.int32),
        }
    )


def _scored_candidates(
    candidates: DataFrame,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    k: int,
    metric: str,
    vec_col: str = "vec",
    id_col: str = "id",
) -> DataFrame:
    """Distance per (query, candidate) row + per-batch partial top-k.

    Input rows carry their query_id (from the probe-pair join), so a
    batch mixes queries; we group by query inside the batch and emit
    ≤ k rows per (batch, query)."""
    qindex = {int(qid): i for i, qid in enumerate(query_ids)}

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            base = np.stack(pdf[vec_col].to_numpy())
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            qids = pdf["query_id"].to_numpy(dtype=np.int64)
            out_q, out_i, out_d = [], [], []
            for qid in np.unique(qids):
                mask = qids == qid
                qvec = query_mat[qindex[int(qid)]][None, :]
                d = np_distance_matrix(base[mask], qvec, metric)[:, 0]
                sub_ids = ids[mask]
                kk = min(k, d.shape[0]) if k > 0 else d.shape[0]
                if kk < d.shape[0]:
                    sel = np.argpartition(d, kk - 1)[:kk]
                else:
                    sel = np.arange(d.shape[0])
                out_q.append(np.full(sel.shape[0], qid, dtype=np.int64))
                out_i.append(sub_ids[sel])
                out_d.append(d[sel])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "id": np.concatenate(out_i),
                    "distance": np.concatenate(out_d),
                }
            )

    return candidates.mapInPandas(part, schema=RESULT_SCHEMA)


def search_ivf(
    index: IvfIndex,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 10,
    qvec_col: str = "qvec",
    query_id_col: str = "query_id",
) -> DataFrame:
    """nprobe-pruned ANN search (ivf.go:115-161).

    Returns (query_id, id, distance, rank). With nprobe ≥ nlist this
    is EXACTLY flat search (every list scanned) — the property the
    correctness gate exploits.
    """
    qrows = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(qvec_col).alias("qvec")
    ).toPandas()
    if len(qrows) == 0:
        spark = index.assignments.sparkSession
        return spark.createDataFrame([], RESULT_SCHEMA + ", rank int")
    query_ids = qrows["query_id"].to_numpy(dtype=np.int64)
    query_mat = np.stack(qrows["qvec"].to_numpy()).astype(np.float64)

    probes = probe_lists(index.centroids, query_ids, query_mat, nprobe, index.metric)
    spark = index.assignments.sparkSession
    probed_list_ids = [int(x) for x in probes["list_id"].unique()]

    # Probe map {list_id -> query row indices}, broadcast with the
    # query matrix. Design rule: candidate rows are NEVER joined to
    # queries (that replicates every vector once per probing query —
    # at 1000 queries × nprobe=10 it multiplied the scanned bytes
    # ~100×). The isin filter still drives static partition pruning
    # on a partitioned artifact; each surviving row crosses Arrow
    # exactly once and is scored against all its probing queries in
    # one BLAS call per (list, batch).
    qindex = {int(qid): i for i, qid in enumerate(query_ids)}
    probe_map: dict[int, np.ndarray] = {}
    for qid, lid in zip(probes["query_id"], probes["list_id"]):
        probe_map.setdefault(int(lid), []).append(qindex[int(qid)])
    probe_map = {lid: np.asarray(v, dtype=np.int64) for lid, v in probe_map.items()}

    sc = spark.sparkContext
    bc = sc.broadcast((query_mat, query_ids, probe_map))
    metric = index.metric

    candidates = index.assignments.filter(
        F.col("list_id").isin(probed_list_ids)
    ).select("list_id", "id", "vec")

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qmat, qids_arr, pmap = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_q, out_i, out_d = [], [], []
            for lid, grp in pdf.groupby("list_id", sort=False):
                qidx = pmap.get(int(lid))
                if qidx is None:
                    continue
                base = np.stack(grp["vec"].to_numpy())
                ids = grp["id"].to_numpy(dtype=np.int64)
                d = np_distance_matrix(base, qmat[qidx], metric)  # (b, nq)
                b = d.shape[0]
                kk = min(k, b) if k > 0 else b
                for j in range(qidx.shape[0]):
                    dj = d[:, j]
                    sel = (
                        np.argpartition(dj, kk - 1)[:kk]
                        if kk < b
                        else np.arange(b)
                    )
                    out_q.append(
                        np.full(sel.shape[0], qids_arr[qidx[j]], dtype=np.int64)
                    )
                    out_i.append(ids[sel])
                    out_d.append(dj[sel])
            if out_q:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(out_q),
                        "id": np.concatenate(out_i),
                        "distance": np.concatenate(out_d),
                    }
                )

    cand = candidates.mapInPandas(part, schema=RESULT_SCHEMA)
    return topk(cand, k)


def ivf_health(index: IvfIndex) -> DataFrame:
    """Index-health report: per inverted list, its population and the
    mean distance of members to their centroid (the local k-means
    distortion). The two signals an operator watches to schedule
    re-training — population skew (hot lists slow every probe that
    hits them) and distortion drift (data moved away from the
    trained centroids).

    Plan: the centroid matrix rides the Arrow kernel's closure (tiny
    by construction), distances compute batch-BLAS per partition with
    no join, and the only shuffle is the nlist-row aggregation.
    Returns (list_id, n_vectors, mean_dist) sorted nowhere — order
    belongs to the caller."""
    cents = np.ascontiguousarray(index.centroids, dtype=np.float64)
    metric = index.metric

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vecs = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
            lids = pdf["list_id"].to_numpy(dtype=np.int64)
            assigned = cents[lids]
            if metric == "cosine":
                from gofaiss_spark.functions.distance import np_distance_matrix

                # row-wise cosine distance to the assigned centroid
                d = np.array(
                    [
                        np_distance_matrix(
                            vecs[i : i + 1], assigned[i : i + 1], "cosine"
                        )[0, 0]
                        for i in range(len(lids))
                    ]
                )
            else:
                d = np.linalg.norm(vecs - assigned, axis=1)
            yield pd.DataFrame({"list_id": lids, "dist": d})

    dists = index.assignments.select("list_id", "vec").mapInPandas(
        part, schema="list_id int, dist double"
    )
    return dists.groupBy("list_id").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg("dist"), 6).alias("mean_dist"),
    )
