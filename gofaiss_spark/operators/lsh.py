"""LSH — the distributed ANN playing HNSW's role.

The reference's HNSW (pkg/index/hnsw/hnsw.go) is a sequential,
mutable, pointer-chasing graph — it does not fit DataFrame execution
(SURVEY.md §2.2-HNSW). The serving substitution is bucketed
random-projection LSH (same scheme as MLlib's
``BucketedRandomProjectionLSH``, implemented natively on DataFrames
so the candidate re-rank runs through the engine's BLAS kernels
instead of per-pair UDF calls):

- build: L Gaussian projections r_t with offsets b_t;
  bucket(v, t) = floor((⟨v, r_t⟩ + b_t) / bucket_length). The bucket
  table is NARROW — (t, bucket, id), L rows per vector — and the
  vectors live once in a separate (id, vec) table: at 100 TB an
  L-fold copy of the vector payload is the artifact-size killer, so
  only 24-byte bucket rows are duplicated (~L·n·24 B vs L·n·dim·4 B).
- search: hash the query batch the same way (driver-side NumPy —
  the batch is small), semi-join the probed (t, bucket) pairs to get
  candidates (bucket-colliding pairs only — never n×q), join the
  candidate ids back to the vectors table (the only wide rows moved
  are actual candidates), dedupe (query, id), exact re-rank, window
  top-k.

ef/M have no direct analogue; (bucket_length, num_hash_tables) are
calibrated against the recall targets the reference docs publish
(docs/benchmarks.md:364-399; SURVEY.md §7 phase C: ≥0.95).

Cosine works by normalizing both sides: for unit vectors
||a−b||² = 2·(1−cos) is monotone in cosine distance; reported
distances are converted back to true cosine distance.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gofaiss_spark.operators.topk import RESULT_SCHEMA, topk

DEFAULT_NUM_HASH_TABLES = 6


@dataclass
class LshIndex:
    metric: str  # "l2" or "cosine"
    dim: int
    bucket_length: float
    num_hash_tables: int
    seed: int
    projections: np.ndarray  # (L, dim)
    offsets: np.ndarray  # (L,)
    buckets: DataFrame = field(repr=False)  # (t, bucket, id) — narrow
    vectors: DataFrame = field(repr=False)  # (id, vec) — stored once

    def stats(self) -> dict:
        """No reference analogue for LSH memory (the ref has no LSH);
        memory_mb = vectors once (dim·4 + 8 id) + n·L narrow bucket
        rows (8 bucket + 8 id + 4 table + ~4 overhead)."""
        total = self.buckets.count() // self.num_hash_tables
        return {
            "index_type": "lsh",
            "total_vectors": total,
            "dimension": self.dim,
            "metric": self.metric,
            "bucket_length": self.bucket_length,
            "num_hash_tables": self.num_hash_tables,
            "memory_mb": (
                total * (self.dim * 4 + 8)
                + total * self.num_hash_tables * 24
            )
            / (1024 * 1024),
        }


def _normalize_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return mat / norms


def _hash_matrix(
    mat: np.ndarray, projections: np.ndarray, offsets: np.ndarray, bucket_length: float
) -> np.ndarray:
    """(n, L) integer buckets via one BLAS matmul."""
    return np.floor((mat @ projections.T + offsets[None, :]) / bucket_length).astype(
        np.int64
    )


def build_lsh(
    vectors: DataFrame,
    metric: str = "l2",
    bucket_length: float | None = None,
    num_hash_tables: int = DEFAULT_NUM_HASH_TABLES,
    seed: int = 42,
    vec_col: str = "vec",
    id_col: str = "id",
) -> LshIndex:
    """Hash every vector into L bucket tables.

    ``bucket_length`` defaults to ≈ the median pairwise distance of a
    small sample — the recall/candidate-size knob (calibrated on the
    bench set: recall ≈0.99 at 6 tables). The narrow buckets
    DataFrame plus the once-stored vectors table are the persistent
    artifact; at scale buckets are written partitioned by ``t`` so a
    search touches each table once.
    """
    if metric not in ("l2", "cosine"):
        raise ValueError(f"lsh supports l2|cosine, got {metric!r}")
    df = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    first = df.select(F.size("vec").alias("d")).first()
    if first is None:
        raise ValueError("cannot build lsh index from an empty DataFrame")
    dim = int(first["d"])

    rng = np.random.default_rng(seed)
    projections = rng.standard_normal((num_hash_tables, dim))

    if bucket_length is None:
        sample = df.select("vec").limit(64).collect()
        mat = np.stack([np.asarray(r.vec, dtype=np.float64) for r in sample])
        if metric == "cosine":
            mat = _normalize_rows(mat)
        if len(mat) > 1:
            d = np.linalg.norm(mat[:, None, :] - mat[None, :, :], axis=2)
            pos = d[d > 0]
            bucket_length = max(float(np.median(pos)), 1e-6) if pos.size else 1.0
        else:
            bucket_length = 1.0
    offsets = rng.uniform(0.0, bucket_length, size=num_hash_tables)

    proj = np.ascontiguousarray(projections)
    offs = offsets.copy()
    bl = float(bucket_length)
    is_cos = metric == "cosine"

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
            if is_cos:
                mat = _normalize_rows(mat)
            h = _hash_matrix(mat, proj, offs, bl)  # (B, L)
            b, L = h.shape
            yield pd.DataFrame(
                {
                    "t": np.tile(np.arange(L, dtype=np.int32), b),
                    "bucket": h.ravel(),
                    "id": np.repeat(pdf["id"].to_numpy(dtype=np.int64), L),
                }
            )

    buckets = df.mapInPandas(part, schema="t int, bucket long, id long")
    return LshIndex(
        metric=metric,
        dim=dim,
        bucket_length=bl,
        num_hash_tables=num_hash_tables,
        seed=seed,
        projections=projections,
        offsets=offsets,
        buckets=buckets,
        vectors=df,
    )


def search_lsh(
    index: LshIndex,
    queries: DataFrame,
    k: int = 10,
    multiprobe: int = 0,
    qvec_col: str = "qvec",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Bucket-join candidates → exact re-rank → top-k.

    Returns (query_id, id, distance, rank). Queries hash driver-side
    (the batch is the small side by contract); the join on
    (t, bucket) broadcasts q×L tiny rows against the bucket table.

    ``multiprobe=p`` additionally probes the ±1..±p neighboring
    buckets in each table (the query's true neighbors that fell just
    across a quantization boundary). Probing 2p extra buckets per
    table buys the recall of ~(2p+1)× more tables at the SAME
    artifact size — the memory knob for serving: L=4 with
    multiprobe=1 matches L=8's recall on the benchmark set at half
    the bucket-table footprint (gated in tests/test_api_persistence).
    """
    qrows = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(qvec_col).alias("qvec")
    ).toPandas()
    spark = index.buckets.sparkSession
    if len(qrows) == 0:
        return spark.createDataFrame([], RESULT_SCHEMA + ", rank int")
    query_ids = qrows["query_id"].to_numpy(dtype=np.int64)
    qmat_raw = np.stack(qrows["qvec"].to_numpy()).astype(np.float64)
    qmat = _normalize_rows(qmat_raw) if index.metric == "cosine" else qmat_raw
    qh = _hash_matrix(qmat, index.projections, index.offsets, index.bucket_length)
    L = index.num_hash_tables

    # Same scan-once kernel design as IVF/IVFPQ search: a broadcast
    # probe map {(t, bucket) -> query row idxs} instead of joining
    # bucket rows to queries (which replicates each candidate vector
    # once per matching query). The semi-join on distinct probed
    # (t, bucket) pairs prunes the bucket table — partition pruning
    # on t when the artifact is partitionBy("t") parquet.
    probe_map: dict[tuple[int, int], list[int]] = {}
    mp = max(0, int(multiprobe))
    for i in range(qh.shape[0]):
        for t in range(L):
            base = int(qh[i, t])
            for delta in range(-mp, mp + 1):
                probe_map.setdefault((t, base + delta), []).append(i)
    probe_map = {
        key: np.asarray(v, dtype=np.int64) for key, v in probe_map.items()
    }
    probed = spark.createDataFrame(
        [(t, b) for (t, b) in probe_map], schema="t int, bucket long"
    )
    # semi-join prunes the narrow bucket table (partition pruning on t
    # for saved artifacts); only the surviving CANDIDATE ids pull
    # their vector row — the vectors table is stored once, never ×L
    candidates = (
        index.buckets.join(F.broadcast(probed), ["t", "bucket"], "left_semi")
        .join(index.vectors, "id")
        .select("t", "bucket", "id", "vec")
    )

    bc = spark.sparkContext.broadcast((qmat_raw, query_ids, probe_map))
    is_cos = index.metric == "cosine"

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gofaiss_spark.functions.distance import np_distance_matrix

        qmat_b, qids_arr, pmap = bc.value
        metric = "cosine" if is_cos else "l2"
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_q, out_i, out_d = [], [], []
            for (t, b), grp in pdf.groupby(["t", "bucket"], sort=False):
                qidx = pmap.get((int(t), int(b)))
                if qidx is None:
                    continue
                base = np.stack(grp["vec"].to_numpy()).astype(np.float64)
                ids = grp["id"].to_numpy(dtype=np.int64)
                d = np_distance_matrix(base, qmat_b[qidx], metric)  # (b, nq)
                n = d.shape[0]
                kk = min(k, n) if k > 0 else n
                for j in range(qidx.shape[0]):
                    dj = d[:, j]
                    sel = (
                        np.argpartition(dj, kk - 1)[:kk] if kk < n else np.arange(n)
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

    scored = candidates.mapInPandas(part, schema=RESULT_SCHEMA)
    # a candidate can surface from several hash tables with identical
    # deterministic distances — dedup on the narrow scored rows
    return topk(scored.dropDuplicates(["query_id", "id"]), k)
