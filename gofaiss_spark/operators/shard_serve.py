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
the per-batch cost is W×G tasks × (nq/G × shard_n) BLAS with nprobe
pruning on the IVF path — the same work a 1000-executor cluster does
for one batch, with zero shuffle (results are nq×k×W narrow rows).
Known overhead vs the single-node pool at equal corpus: every shard
re-runs probe selection for its queries (probe work ×W; measured
~1.6× total CPU at 1M/8 shards/nprobe=100) — the price of shards
that need no cross-shard coordination. IVF artifacts shard by LIST
so cells stay whole (a cell fragmented across W shards shrinks every
per-cell GEMM by W× — measured 3.5× slower end-to-end at
1M/nlist=1000 before the change).

Shard arrays are pinned in HOST-level POSIX shared memory, keyed by
(build_id, shard_id): the first task that serves a shard on a host
reads its parquet slice once and exports the CSR arrays to named
segments; every later task — in ANY python worker on that host —
attaches zero-copy. Spark's python-worker pool gives no worker→task
affinity (a 4-task job on local[32] lands on 4 arbitrary workers
every batch), so a per-worker cache alone re-reads parquet almost
every call; the host cache makes the reload cost once-per-host-per-
shard regardless of worker churn. Segments persist until
``ShardedSearcher.close()`` / ``release_shards()`` unlinks them
(they are unregistered from Python's resource tracker, which would
otherwise unlink them whenever the creating worker exits).

Caveats (documented contract): the artifact is immutable per path
(rewrites must use a new path or bump the meta ``build_id``, which
keys both caches); call ``close()`` when done serving or the host
keeps the segments pinned.
"""

from __future__ import annotations

import json
import os
import tempfile
from collections import OrderedDict

import numpy as np

from gofaiss_spark.functions.distance import validate_metric

SHARD_META = "_shard_meta.json"
# per-python-worker handle cache: (path, build_id, shard_id) ->
# (index, [shm handles kept alive so the views stay mapped])
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
    # IVF shards by LIST, not id: a cell fragmented across W shards
    # shrinks every per-cell GEMM by W× and the serving kernel goes
    # overhead-bound (measured 3.5× slower at 1M/nlist=1000); keeping
    # cells whole preserves GEMM batch size and lets a shard skip
    # batches whose probed cells it doesn't hold. Flat has no cell
    # structure — id-sharding balances it exactly.
    shard_key = "list_id" if kind == "ivf" else "id"
    sharded = df.withColumn(
        "shard_id", F.pmod(F.col(shard_key), F.lit(num_shards)).cast("int")
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


def _read_shard_arrays(path: str, shard_id: int, meta: dict) -> dict:
    """Read one shard's parquet slice into the CSR array set (the
    cold path — runs once per host per shard)."""
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
    arrays = {"ids": ids, "vecs": vecs, "norms_sq": norms_sq}
    if meta["kind"] == "ivf":
        nlist = meta["nlist"]
        cents = _load_centroids_np(path, nlist, meta["dim"])
        if metric == "cosine":
            cn = np.linalg.norm(cents, axis=1, keepdims=True)
            cn[cn == 0] = 1.0
            cents = cents / cn
        lids = pdf["list_id"].to_numpy(dtype=np.int64)
        arrays["centroids"] = np.ascontiguousarray(cents)
        arrays["offsets"] = np.searchsorted(
            lids, np.arange(nlist + 1)).astype(np.int64)
    return arrays


def _seg_name(build_id: str, shard_id: int, key: str) -> str:
    # POSIX shm names share a host-global namespace — build_id (random
    # per save_sharded) keys the artifact generation
    return f"gfs{build_id}s{int(shard_id)}{key}"


def _shm_open(name: str, create: bool = False, size: int = 0):
    """Open a named segment WITHOUT registering it with Python's
    resource tracker. The tracker unlinks every segment a process
    created or attached when that process exits (bpo-39959; the
    ``track=`` opt-out only exists from 3.13), which would tear down
    the host cache whenever Spark recycles a python worker — and
    register/unregister pairs split across forked workers that share
    one tracker daemon leave noisy KeyErrors in its log. Lifecycle is
    explicit instead: ``release_shards`` / ``close`` unlink. The
    brief monkeypatch is safe here: shm opens happen on the task
    thread only."""
    from multiprocessing import resource_tracker, shared_memory

    orig = resource_tracker.register
    resource_tracker.register = lambda *a, **k: None
    try:
        if create:
            return shared_memory.SharedMemory(
                name=name, create=True, size=size)
        return shared_memory.SharedMemory(name=name)
    finally:
        resource_tracker.register = orig


def _shm_unlink(shm) -> None:
    """Unlink without the paired tracker unregister (the segment was
    never registered — see ``_shm_open``)."""
    from multiprocessing import resource_tracker

    orig = resource_tracker.unregister
    resource_tracker.unregister = lambda *a, **k: None
    try:
        shm.unlink()
    finally:
        resource_tracker.unregister = orig


def _attach_shard_segments(build_id: str, shard_id: int):
    """Attach one shard's named segments (raises FileNotFoundError if
    the host cache has no complete set). The 'ok' sentinel is written
    last by the builder and carries the array spec, so its presence
    guarantees every array segment is complete."""
    sent = _shm_open(_seg_name(build_id, shard_id, "ok"))
    handles = [sent]
    try:
        spec = json.loads(
            bytes(sent.buf).split(b"\x00", 1)[0].decode())
        arrays = {}
        for key, sp in spec.items():
            shm = _shm_open(_seg_name(build_id, shard_id, key))
            handles.append(shm)
            arrays[key] = np.ndarray(
                tuple(sp["shape"]), dtype=np.dtype(sp["dtype"]),
                buffer=shm.buf)
        return handles, arrays
    except Exception:
        for h in handles:
            h.close()
        raise


def _build_shard_segments(path: str, build_id: str, shard_id: int,
                          meta: dict) -> None:
    """Cold path: read the shard's parquet and export its arrays to
    named host shared memory. Caller must hold the shard's flock."""
    arrays = _read_shard_arrays(path, shard_id, meta)
    spec = {}
    for key, arr in arrays.items():
        name = _seg_name(build_id, shard_id, key)
        try:
            shm = _shm_open(name, create=True, size=max(1, arr.nbytes))
        except FileExistsError:
            # leftover from a crashed builder (no sentinel): replace
            stale = _shm_open(name)
            stale.close()
            _shm_unlink(stale)
            shm = _shm_open(name, create=True, size=max(1, arr.nbytes))
        if arr.nbytes:
            np.ndarray(arr.shape, dtype=arr.dtype,
                       buffer=shm.buf)[:] = arr
        shm.close()
        spec[key] = {"shape": list(arr.shape), "dtype": str(arr.dtype)}
    payload = json.dumps(spec).encode()
    try:
        sent = _shm_open(_seg_name(build_id, shard_id, "ok"),
                         create=True, size=len(payload) + 1)
    except FileExistsError:
        return  # another builder won the race after our flock check
    sent.buf[:len(payload)] = payload
    sent.close()


_SEG_KEYS = ("ok", "ids", "vecs", "norms_sq", "centroids", "offsets")


def _unlink_shard_segments(build_id: str, shard_id: int) -> int:
    """Best-effort unlink of one shard's segments on THIS host.
    Returns the number of segments removed."""
    n = 0
    for key in _SEG_KEYS:
        try:
            shm = _shm_open(_seg_name(build_id, shard_id, key))
            shm.close()
            _shm_unlink(shm)
            n += 1
        except FileNotFoundError:
            pass
    try:
        os.unlink(os.path.join(
            tempfile.gettempdir(), f".{_seg_name(build_id, shard_id, 'lk')}"))
    except OSError:
        pass
    return n


def _load_shard(path: str, build_id: str, shard_id: int, meta: dict):
    """Load one shard as a LocalFlatIndex / LocalIvfIndex view over
    the HOST shared-memory cache. Runs inside executor python workers.

    Order: per-worker handle cache → attach host segments → (under a
    host-local flock, so concurrent slice tasks of one cold shard
    build once) read parquet + export segments, then attach."""
    from gofaiss_spark.operators.local_serve import (
        LocalFlatIndex,
        LocalIvfIndex,
    )

    key = (path, build_id, int(shard_id))
    hit = _CACHE.get(key)
    if hit is not None:
        _CACHE.move_to_end(key)
        return hit[0]

    try:
        handles, arrays = _attach_shard_segments(build_id, shard_id)
    except FileNotFoundError:
        import fcntl

        lock_path = os.path.join(
            tempfile.gettempdir(), f".{_seg_name(build_id, shard_id, 'lk')}")
        with open(lock_path, "w") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            try:
                # another task may have built while we waited
                try:
                    handles, arrays = _attach_shard_segments(
                        build_id, shard_id)
                except FileNotFoundError:
                    _build_shard_segments(path, build_id, shard_id, meta)
                    handles, arrays = _attach_shard_segments(
                        build_id, shard_id)
            finally:
                fcntl.flock(lf, fcntl.LOCK_UN)

    metric = meta["metric"]
    if meta["kind"] == "ivf":
        idx = LocalIvfIndex(ids=arrays["ids"], vecs=arrays["vecs"],
                            metric=metric, centroids=arrays["centroids"],
                            offsets=arrays["offsets"],
                            norms_sq=arrays["norms_sq"])
    else:
        idx = LocalFlatIndex(ids=arrays["ids"], vecs=arrays["vecs"],
                             metric=metric, norms_sq=arrays["norms_sq"])
    _CACHE[key] = (idx, handles)
    while len(_CACHE) > _CACHE_MAX:
        _, (_, old_handles) = _CACHE.popitem(last=False)
        for h in old_handles:
            h.close()
    return idx


class ShardedSearcher:
    """Driver handle for an executor-colocated sharded artifact.

    ``search(qmat, k, nprobe)`` runs one W-task job (one task per
    shard via ``spark.range``'s exact partitioning), merges the W
    per-shard top-k lists per query on the driver (nq×k×W rows —
    narrow by construction), and returns (ids (nq, k), dists (nq, k))
    ascending (distance, id) — bit-identical to the single-node local
    index over the same rows."""

    def __init__(self, spark, path: str, slices_per_shard: int | None = None):
        self.spark = spark
        self.path = path
        self.meta = _read_shard_meta(path)
        w = self.meta["num_shards"]
        # One serving task per (shard, query slice): G slices per shard
        # so total tasks ≈ the cluster's core count and every task runs
        # its kernel single-threaded — process-level parallelism beats
        # W fat tasks × multi-threaded BLAS on the same cores (the same
        # topology result as LocalServerPool's 32x1 vs 8x4 A/B). On a
        # real cluster each shard's G slice tasks land on (at most G)
        # hosts; each host pays one cold parquet→shm load per shard it
        # ever serves, then attaches from host memory.
        par = max(1, spark.sparkContext.defaultParallelism)
        self.slices = (slices_per_shard if slices_per_shard
                       else max(1, min(16, par // w)))
        n_tasks = w * self.slices
        # spark.range(0, n, 1, n): exactly one row per partition → one
        # task per (shard, slice), no hash-collision skew
        self._manifest = (
            spark.range(0, n_tasks, 1, n_tasks)
            .selectExpr(f"cast(id % {w} as int) as shard_id",
                        f"cast(id div {w} as int) as slice_id"))

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
        n_slices = self.slices

        def part(pdfs):
            import os as _os

            import pandas as pd

            from gofaiss_spark.operators import local_serve as _ls

            # with W×G concurrent single-shard tasks on the cluster,
            # each task's kernel runs (near-)single-threaded so one
            # host's tasks don't oversubscribe its cores
            _ls._MAX_CHUNKS = max(
                1, (_os.cpu_count() or 8) // max(1, min(w * n_slices, 64))
            )
            qv = bq.value
            nq_all = len(qv)
            for pdf in pdfs:
                for sid, sli in zip(pdf["shard_id"], pdf["slice_id"]):
                    lo = nq_all * int(sli) // n_slices
                    hi = nq_all * (int(sli) + 1) // n_slices
                    if lo >= hi:
                        continue
                    idx = _load_shard(path, build_id, int(sid), meta)
                    if idx.ids.shape[0] == 0:
                        continue
                    if is_ivf:
                        ids, dists = idx.search(qv[lo:hi], k=k, nprobe=npr)
                    else:
                        ids, dists = idx.search(qv[lo:hi], k=k)
                    kk = ids.shape[1]
                    yield pd.DataFrame({
                        "qi": np.repeat(
                            np.arange(lo, hi, dtype=np.int64), kk),
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

    def close(self) -> int:
        """Unlink this artifact's host shared-memory segments on every
        host (best-effort: one over-partitioned job so each worker —
        and therefore each host — gets a chance to run the unlink;
        idempotent, safe to call twice). Returns the number of
        segments removed cluster-wide."""
        return release_shards(self.spark, self.path, meta=self.meta)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

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


def release_shards(spark, path: str, meta: dict | None = None) -> int:
    """Unlink the host shared-memory segments of a sharded artifact on
    every host. Runs one over-partitioned job (4 tasks per parallelism
    slot) so every pooled python worker — and therefore every host —
    executes the idempotent unlink; also purges matching entries from
    each worker's handle cache so the freed memory unmaps promptly."""
    meta = meta or _read_shard_meta(path)
    build_id, w = meta["build_id"], meta["num_shards"]
    par = max(1, spark.sparkContext.defaultParallelism)
    n_tasks = max(w, par * 4)

    def rel(it):
        import pandas as pd

        n = 0
        hit = False
        for pdf in it:
            if len(pdf):
                hit = True
        if hit:
            for key in list(_CACHE):
                if key[1] == build_id:
                    _, handles = _CACHE.pop(key)
                    for h in handles:
                        h.close()
            for s in range(w):
                n += _unlink_shard_segments(build_id, s)
        yield pd.DataFrame({"n": [n]})

    total = (spark.range(0, n_tasks, 1, n_tasks)
             .mapInPandas(rel, schema="n long")
             .toPandas()["n"].sum())
    return int(total)
