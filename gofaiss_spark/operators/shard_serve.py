"""Executor-colocated sharded serving — FAISS IndexShards semantics at
cluster scale (the middle tier between the distributed parquet plans
and the driver-colocated LocalServerPool).

Reference parity: the reference serves its whole index from one
process's RAM (pkg/index/*, benchmark_comparison.go); that tier stops
at one machine. This module shards the same cell-major CSR serving
kernels (operators/local_serve.py) across Spark executors so the
serving index can exceed single-node RAM while keeping in-memory QPS:

- The index is persisted ONCE as a shard-partitioned parquet artifact
  (``shard_id = id % num_shards``) plus small sidecar files
  (meta JSON, centroids parquet for IVF).
- Serving a query batch is a W-task Spark job over a W-row shard
  MANIFEST (``spark.range(W)`` — exactly one row per partition); no
  index data moves through the per-batch plan.
- Each task loads its shard's arrays straight from the artifact into
  a module-level cache. Spark reuses Python workers across jobs
  (``spark.python.worker.reuse``, default true), so steady-state
  every executor answers from pinned RAM exactly like a
  LocalServerPool worker — but shards live on different machines.
- Queries ride to executors via a per-batch broadcast; every shard
  answers its local exact/pruned top-k, and the driver merges the
  W×k candidate lists per query. The merge is exact: every global
  top-k member is, within its own shard, also a top-k member (fewer
  competitors), so the union of per-shard top-ks contains the global
  top-k; per-candidate distances are f64 re-scored from the same
  (query, vector) pair in every tier, so merged results are
  bit-identical to a single-node index over the union
  (tests/test_shard_serve.py).

100 TB posture: shard count scales with corpus / per-executor RAM;
the per-batch cost is W tasks × (nq × shard_n) BLAS with nprobe
pruning on the IVF path — the same work a 1000-executor cluster does
for one batch, with zero shuffle (results are nq×k×W narrow rows).

Caveats (documented contract): worker→shard affinity is best-effort —
a fresh worker pays one cold load (cache is LRU-bounded per worker);
the artifact is immutable per path (rewrites must use a new path or
bump the meta ``build_id``, which keys the cache).
"""

from __future__ import annotations

import json
import os
from collections import OrderedDict

import numpy as np

from gofaiss_spark.functions.distance import validate_metric

SHARD_META = "_shard_meta.json"
# per-python-worker shard cache: (path, build_id, shard_id) -> index
_CACHE: "OrderedDict[tuple, object]" = OrderedDict()
_CACHE_MAX = 8


def save_sharded(index_or_vectors, path: str, num_shards: int,
                 metric: str | None = None,
                 vec_col: str = "vec", id_col: str = "id") -> dict:
    """Persist a shard-partitioned serving artifact.

    Accepts an IvfIndex (shards carry list_id; per-shard serving uses
    the GLOBAL centroids, so nprobe cell selection is identical to the
    single-node index), a FlatIndex, or a raw (id, vec) DataFrame.
    Returns the meta dict written to ``_shard_meta.json``.
    """
    from pyspark.sql import functions as F

    from gofaiss_spark.operators.flat import FlatIndex
    from gofaiss_spark.operators.ivf import IvfIndex
    from gofaiss_spark.plans.artifacts import _centroids_to_df, _write_df

    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1, got {num_shards}")

    centroids = None
    if isinstance(index_or_vectors, IvfIndex):
        kind = "ivf"
        metric = metric or index_or_vectors.metric
        df = index_or_vectors.assignments.select("id", "vec", "list_id")
        centroids = np.asarray(index_or_vectors.centroids, dtype=np.float64)
        cols = ["id", "vec", "list_id"]
    else:
        kind = "flat"
        if isinstance(index_or_vectors, FlatIndex):
            df = index_or_vectors.vectors
            metric = metric or index_or_vectors.metric
        else:
            df = index_or_vectors
            metric = metric or "l2"
        df = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        cols = ["id", "vec"]
    validate_metric(metric)

    spark = df.sparkSession
    sharded = df.withColumn(
        "shard_id", F.pmod(F.col("id"), F.lit(num_shards)).cast("int")
    )
    # one file per shard: each serving task reads exactly its slice
    (sharded.repartition(num_shards, "shard_id")
     .select(*cols, "shard_id")
     .write.mode("overwrite").partitionBy("shard_id")
     .parquet(f"{path}/shards"))
    if centroids is not None:
        _write_df(_centroids_to_df(spark, centroids),
                  f"{path}/centroids", "parquet")
    dim = len(df.select("vec").first()["vec"])
    meta = {
        "kind": kind,
        "metric": metric,
        "num_shards": int(num_shards),
        "dim": int(dim),
        "nlist": int(centroids.shape[0]) if centroids is not None else None,
        # cache key component: a rewrite at the same path must change it
        "build_id": os.urandom(8).hex(),
    }
    with open(os.path.join(path, SHARD_META), "w") as f:
        json.dump(meta, f)
    return meta


def _read_shard_meta(path: str) -> dict:
    with open(os.path.join(path, SHARD_META)) as f:
        return json.load(f)


def _load_centroids_np(path: str, nlist: int, dim: int) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{path}/centroids").to_pandas()
    t = t.sort_values("list_id")
    out = np.stack(t["centroid"].to_numpy()).astype(np.float64)
    if out.shape != (nlist, dim):
        raise ValueError(
            f"centroids shape {out.shape} != ({nlist}, {dim})"
        )
    return out


def _load_shard(path: str, build_id: str, shard_id: int, meta: dict):
    """Load (or fetch from the worker-level cache) one shard as a
    LocalFlatIndex / LocalIvfIndex. Runs inside executor python
    workers; the cache key includes build_id so artifact rewrites
    can't serve stale arrays."""
    from gofaiss_spark.operators.local_serve import (
        LocalFlatIndex,
        LocalIvfIndex,
    )

    key = (path, build_id, int(shard_id))
    idx = _CACHE.get(key)
    if idx is not None:
        _CACHE.move_to_end(key)
        return idx

    import pyarrow.parquet as pq

    metric = meta["metric"]
    shard_dir = f"{path}/shards/shard_id={int(shard_id)}"
    cols = ["id", "vec"] + (["list_id"] if meta["kind"] == "ivf" else [])
    pdf = pq.read_table(shard_dir, columns=cols).to_pandas()
    if meta["kind"] == "ivf":
        pdf = pdf.sort_values(["list_id", "id"])
    else:
        pdf = pdf.sort_values("id")
    ids = pdf["id"].to_numpy(dtype=np.int64)
    if len(ids):
        vecs = np.stack(pdf["vec"].to_numpy()).astype(np.float32)
    else:
        vecs = np.empty((0, meta["dim"]), dtype=np.float32)
    if metric == "cosine":
        nrm = np.linalg.norm(vecs, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        vecs = vecs / nrm
    vecs = np.ascontiguousarray(vecs)
    norms_sq = np.einsum("ij,ij->i", vecs, vecs)
    if meta["kind"] == "ivf":
        nlist = meta["nlist"]
        cents = _load_centroids_np(path, nlist, meta["dim"])
        if metric == "cosine":
            cn = np.linalg.norm(cents, axis=1, keepdims=True)
            cn[cn == 0] = 1.0
            cents = cents / cn
        lids = pdf["list_id"].to_numpy(dtype=np.int64)
        offsets = np.searchsorted(lids, np.arange(nlist + 1)).astype(np.int64)
        idx = LocalIvfIndex(ids=ids, vecs=vecs, metric=metric,
                            centroids=cents, offsets=offsets,
                            norms_sq=norms_sq)
    else:
        idx = LocalFlatIndex(ids=ids, vecs=vecs, metric=metric,
                             norms_sq=norms_sq)
    _CACHE[key] = idx
    while len(_CACHE) > _CACHE_MAX:
        _CACHE.popitem(last=False)
    return idx


class ShardedSearcher:
    """Driver handle for an executor-colocated sharded artifact.

    ``search(qmat, k, nprobe)`` runs one W-task job (one task per
    shard via ``spark.range``'s exact partitioning), merges the W
    per-shard top-k lists per query on the driver (nq×k×W rows —
    narrow by construction), and returns (ids (nq, k), dists (nq, k))
    ascending (distance, id) — bit-identical to the single-node local
    index over the same rows."""

    def __init__(self, spark, path: str):
        self.spark = spark
        self.path = path
        self.meta = _read_shard_meta(path)
        w = self.meta["num_shards"]
        # spark.range(0, W, 1, W): exactly one row per partition → one
        # task per shard per batch, no hash-collision skew
        self._manifest = spark.range(0, w, 1, w).toDF("shard_id")

    @property
    def num_shards(self) -> int:
        return self.meta["num_shards"]

    def search(self, qmat: np.ndarray, k: int = 10,
               nprobe: int | None = None) -> tuple[np.ndarray, np.ndarray]:
        if k <= 0:
            raise ValueError(f"k must be positive, got {k}")
        q = np.ascontiguousarray(qmat, dtype=np.float32)
        nq = q.shape[0]
        if nq == 0:
            return (np.empty((0, k), dtype=np.int64),
                    np.empty((0, k), dtype=np.float64))
        meta = self.meta
        path, build_id = self.path, meta["build_id"]
        is_ivf = meta["kind"] == "ivf"
        npr = nprobe if nprobe is not None else 10
        sc = self.spark.sparkContext
        bq = sc.broadcast(q)

        w = self.meta["num_shards"]

        def part(pdfs):
            import os as _os

            import pandas as pd

            from gofaiss_spark.operators import local_serve as _ls

            # cap this task's kernel thread fan-out so W concurrent
            # shard tasks on one host don't oversubscribe its cores
            # (on a real cluster W spans executors and the cap is the
            # executor's own core count; local[W] simulation shares
            # one box). _MAX_CHUNKS is consumed lazily by the serving
            # thread pool on its first use in this worker.
            if _ls._MAX_CHUNKS is None:
                _ls._MAX_CHUNKS = max(
                    1, (_os.cpu_count() or 8) // max(1, min(w, 8))
                )
            qv = bq.value
            for pdf in pdfs:
                for sid in pdf["shard_id"]:
                    idx = _load_shard(path, build_id, int(sid), meta)
                    if idx.ids.shape[0] == 0:
                        continue
                    if is_ivf:
                        ids, dists = idx.search(qv, k=k, nprobe=npr)
                    else:
                        ids, dists = idx.search(qv, k=k)
                    kk = ids.shape[1]
                    yield pd.DataFrame({
                        "qi": np.repeat(np.arange(len(qv), dtype=np.int64),
                                        kk),
                        "id": ids.ravel(),
                        "distance": dists.ravel(),
                    })

        pdf = (self._manifest.mapInPandas(
            part, schema="qi long, id long, distance double"
        ).toPandas())
        bq.unpersist(blocking=False)

        # exact W-way merge: top-k by (distance, id) within each query
        qi = pdf["qi"].to_numpy(dtype=np.int64)
        ids = pdf["id"].to_numpy(dtype=np.int64)
        dist = pdf["distance"].to_numpy(dtype=np.float64)
        order = np.lexsort((ids, dist, qi))
        qi, ids, dist = qi[order], ids[order], dist[order]
        starts = np.searchsorted(qi, np.arange(nq + 1))
        avail = np.diff(starts)
        kout = min(k, int(avail.max(initial=0)))
        out_ids = np.full((nq, kout), np.iinfo(np.int64).max, dtype=np.int64)
        out_d = np.full((nq, kout), np.inf, dtype=np.float64)
        take = np.minimum(avail, kout)
        rows = np.repeat(np.arange(nq), take)
        cols = np.concatenate([np.arange(t) for t in take]) if len(take) else \
            np.empty(0, dtype=np.int64)
        src = np.concatenate([
            np.arange(starts[i], starts[i] + take[i]) for i in range(nq)
        ]) if nq else np.empty(0, dtype=np.int64)
        out_ids[rows, cols] = ids[src]
        out_d[rows, cols] = dist[src]
        return out_ids, out_d

    def stats(self) -> dict:
        import pyarrow.parquet as pq

        total = 0
        for s in range(self.num_shards):
            d = f"{self.path}/shards/shard_id={s}"
            for fn in os.listdir(d):
                if fn.endswith(".parquet"):
                    total += pq.read_metadata(os.path.join(d, fn)).num_rows
        return {
            "kind": self.meta["kind"],
            "metric": self.meta["metric"],
            "num_shards": self.num_shards,
            "dim": self.meta["dim"],
            "n_vectors": total,
            "memory_mb_per_shard": round(
                total / max(1, self.num_shards) * self.meta["dim"] * 4
                / 2**20, 2
            ),
        }
