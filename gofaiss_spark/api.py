"""Unified search API — the ``Searcher`` façade.

Reference: pkg/search/search.go. ``build_index`` plays Builder
(search.go:211-319, defaults there: hnsw/dim 128/l2 — ours defaults
to the LSH role-player for "hnsw"), ``search`` plays
Search/BatchSearch dispatch (search.go:56-112; batch is native),
``SearchOptions{K, Nprobe, EfSearch}`` becomes the ``params`` dict
(defaults K=10, nprobe=10 — search.go:32-39). The reference façade's
ivfpq arm returns empty results (search.go:72-80, a bug); ours
dispatches correctly. ``range_search`` is exact instead of the
reference's oversample-then-filter approximation (search.go:165-189).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession

from gofaiss_spark.operators.flat import FlatIndex, build_flat
from gofaiss_spark.operators.ivf import IvfIndex, build_ivf, search_ivf
from gofaiss_spark.operators.ivfpq import IvfPqIndex, build_ivfpq, search_ivfpq
from gofaiss_spark.operators.lsh import LshIndex, build_lsh, search_lsh
from gofaiss_spark.operators.pq import PqIndex, build_pq, search_pq
from gofaiss_spark.operators.ivfsq import IvfSqIndex, build_ivfsq, search_ivfsq
from gofaiss_spark.operators.sq import SqIndex, build_sq, search_sq
from gofaiss_spark.operators.topk import range_search as _range_search

INDEX_TYPES = (
    "flat", "ivf", "pq", "sq", "ivfpq", "ivfsq", "opq", "lsh", "hnsw",
    "hnsw_local", "hnsw_sharded", "hnsw_routed",
)

DEFAULT_K = 10
DEFAULT_NPROBE = 10


def build_index(
    vectors: DataFrame,
    index_type: str = "flat",
    metric: str = "l2",
    params: dict | None = None,
    vec_col: str = "vec",
    id_col: str = "id",
):
    """Builder parity (search.go:211-319). ``index_type="hnsw"`` maps
    to the LSH ANN role-player (SURVEY.md §7 phase C)."""
    params = dict(params or {})
    if index_type == "flat":
        return build_flat(vectors, metric=metric, vec_col=vec_col, id_col=id_col)
    if index_type == "ivf":
        return build_ivf(
            vectors,
            nlist=params.get("nlist"),
            metric=metric,
            seed=params.get("seed", 42),
            train_fraction=params.get("train_fraction"),
            vec_col=vec_col,
            id_col=id_col,
        )
    if index_type == "pq":
        return build_pq(
            vectors,
            m=params.get("m", 8),
            nbits=params.get("nbits", 8),
            train_fraction=params.get("train_fraction"),
            seed=params.get("seed", 42),
            vec_col=vec_col,
            id_col=id_col,
        )
    if index_type == "sq":
        return build_sq(vectors, metric=metric, vec_col=vec_col, id_col=id_col)
    if index_type == "ivfsq":
        return build_ivfsq(
            vectors,
            nlist=params.get("nlist"),
            metric=metric,
            seed=params.get("seed", 42),
            train_fraction=params.get("train_fraction"),
            vec_col=vec_col,
            id_col=id_col,
        )
    if index_type == "ivfpq":
        return build_ivfpq(
            vectors,
            nlist=params.get("nlist"),
            m=params.get("m"),
            nbits=params.get("nbits", 8),
            metric=metric,
            seed=params.get("seed", 42),
            train_fraction=params.get("train_fraction"),
            vec_col=vec_col,
            id_col=id_col,
        )
    if index_type == "hnsw_local":
        # the small-index fidelity path (SURVEY.md §7: graph build is
        # sequential; distributed ANN is "hnsw" → LSH below)
        from gofaiss_spark.operators.hnsw import build_hnsw

        return build_hnsw(
            vectors,
            m=params.get("m", 16),
            ef_construction=params.get("ef_construction", 200),
            metric=metric,
            seed=params.get("seed", 42),
            max_vectors=params.get("max_vectors", 1_000_000),
            vec_col=vec_col,
            id_col=id_col,
        )
    if index_type == "hnsw_sharded":
        # the distributed HNSW (FAISS IndexShards pattern): S
        # independent graphs built in parallel executor-side
        from gofaiss_spark.operators.hnsw import build_hnsw_sharded

        return build_hnsw_sharded(
            vectors,
            num_shards=params.get("num_shards"),
            m=params.get("m", 16),
            ef_construction=params.get("ef_construction", 200),
            metric=metric,
            seed=params.get("seed", 42),
            vec_col=vec_col,
            id_col=id_col,
        )
    if index_type == "hnsw_routed":
        # cluster-routed shards (FAISS IVF+HNSW composition): queries
        # probe only nprobe of nlist k-means cells
        from gofaiss_spark.operators.hnsw import build_hnsw_routed

        return build_hnsw_routed(
            vectors,
            nlist=params.get("nlist"),
            nprobe_default=params.get("nprobe", 10),
            m=params.get("m", 16),
            ef_construction=params.get("ef_construction", 200),
            metric=metric,
            seed=params.get("seed", 42),
            train_fraction=params.get("train_fraction"),
            vec_col=vec_col,
            id_col=id_col,
        )
    if index_type == "opq":
        from gofaiss_spark.operators.opq import build_opq

        return build_opq(
            vectors,
            m=params.get("m", 8),
            nbits=params.get("nbits", 8),
            n_iter=params.get("n_iter", 10),
            train_fraction=params.get("train_fraction"),
            seed=params.get("seed", 42),
            vec_col=vec_col,
            id_col=id_col,
        )
    if index_type in ("lsh", "hnsw"):
        return build_lsh(
            vectors,
            metric=metric,
            bucket_length=params.get("bucket_length"),
            num_hash_tables=params.get("num_hash_tables", 6),
            seed=params.get("seed", 42),
            vec_col=vec_col,
            id_col=id_col,
        )
    raise ValueError(f"unknown index type {index_type!r} (expected one of {INDEX_TYPES})")


def cache_index(index) -> None:
    """Materialize + cache the index's resident DataFrames — the
    serving-mode contract (an in-memory reference index is always
    'cached'; on a cluster, persist-to-parquet + load plays this
    role). No-op for driver-side indexes."""
    for attr in ("vectors", "assignments", "codes", "buckets"):
        df = getattr(index, attr, None)
        if df is not None and hasattr(df, "cache"):
            df.cache().count()


def search(index, queries: DataFrame, k: int = DEFAULT_K, params: dict | None = None) -> DataFrame:
    """Search/BatchSearch dispatch (search.go:56-112) — batch-native:
    ``queries`` is always a (query_id, qvec) DataFrame."""
    params = dict(params or {})
    if isinstance(index, FlatIndex):
        return index.search(queries, k=k, method=params.get("method", "local"))
    if isinstance(index, IvfIndex):
        return search_ivf(index, queries, k=k, nprobe=params.get("nprobe", DEFAULT_NPROBE))
    if isinstance(index, PqIndex):
        return search_pq(
            index,
            queries,
            k=k,
            refine=params.get("refine"),
            base=params.get("base"),
        )
    if isinstance(index, SqIndex):
        return search_sq(
            index,
            queries,
            k=k,
            refine=params.get("refine"),
            base=params.get("base"),
        )
    if isinstance(index, IvfSqIndex):
        return search_ivfsq(
            index,
            queries,
            k=k,
            nprobe=params.get("nprobe", DEFAULT_NPROBE),
            refine=params.get("refine"),
            base=params.get("base"),
        )
    if isinstance(index, IvfPqIndex):
        return search_ivfpq(
            index,
            queries,
            k=k,
            nprobe=params.get("nprobe", DEFAULT_NPROBE),
            refine=params.get("refine"),
            base=params.get("base"),
        )
    if isinstance(index, LshIndex):
        return search_lsh(
            index, queries, k=k, multiprobe=params.get("multiprobe", 0)
        )
    from gofaiss_spark.operators.opq import OpqIndex, search_opq

    if isinstance(index, OpqIndex):
        return search_opq(
            index,
            queries,
            k=k,
            refine=params.get("refine"),
            base=params.get("base"),
        )
    from gofaiss_spark.operators.hnsw import (
        HnswIndex,
        HnswRoutedIndex,
        HnswShardedIndex,
        search_hnsw,
        search_hnsw_routed,
        search_hnsw_sharded,
    )

    if isinstance(index, HnswIndex):
        return search_hnsw(index, queries, k=k, ef_search=params.get("ef_search"))
    if isinstance(index, HnswShardedIndex):
        return search_hnsw_sharded(
            index, queries, k=k, ef_search=params.get("ef_search")
        )
    if isinstance(index, HnswRoutedIndex):
        return search_hnsw_routed(
            index,
            queries,
            k=k,
            nprobe=params.get("nprobe"),
            ef_search=params.get("ef_search"),
        )
    raise TypeError(f"cannot search index of type {type(index).__name__}")


batch_search = search  # the batch IS the native shape (SURVEY.md §4 row 11)


def range_search(index, queries: DataFrame, threshold: float, max_results: int | None = None) -> DataFrame:
    """Exact threshold search (improvement over search.go:165-189's
    oversampling; SURVEY.md §4 row 12). Exact for flat; for ANN
    indexes it re-ranks the index's candidate set."""
    if isinstance(index, FlatIndex):
        return index.range_search(queries, threshold, max_results)
    # ANN candidate path: oversample top-k then exact filter, with the
    # same (k·10, capped) heuristic as the reference for parity.
    k = min((max_results or DEFAULT_K) * 10, 10000)
    from pyspark.sql import functions as F

    res = search(index, queries, k=k)
    out = res.filter(F.col("distance") <= float(threshold)).drop("rank")
    from gofaiss_spark.operators.topk import topk

    return topk(out, max_results if max_results else 0)


def remove_ids(index, ids: list[int]):
    """Remove vectors by id — an anti-join over the index's resident
    DataFrames. The reference returns "not supported" for IVF/IVFPQ
    (ivf.go:177-179, ivfpq.go:299-302); Spark's immutable-DataFrame
    model makes deletion a filter, so we implement it (documented
    deviation, SURVEY.md §2.2). HNSW routes to its graph-aware remove
    (hnsw.go:203-242 parity). Returns the updated index (same object;
    DataFrame fields replaced)."""
    from gofaiss_spark.operators.hnsw import (
        HnswIndex,
        HnswShardedIndex,
        remove_hnsw,
        remove_hnsw_sharded,
    )

    if isinstance(index, HnswIndex):
        for vid in ids:
            remove_hnsw(index, vid)
        return index
    if isinstance(index, HnswShardedIndex):
        return remove_hnsw_sharded(index, ids)
    from pyspark.sql import functions as F

    id_set = [int(i) for i in ids]
    for attr in ("vectors", "assignments", "codes", "buckets"):
        df = getattr(index, attr, None)
        if df is not None and hasattr(df, "filter"):
            setattr(index, attr, df.filter(~F.col("id").isin(id_set)))
    return index


def search_with_metadata(index, queries: DataFrame, k: int = DEFAULT_K, params: dict | None = None) -> tuple[list, dict]:
    """Timing wrapper (search.go:150-162): returns (rows, metadata)."""
    t0 = time.monotonic()
    rows = search(index, queries, k=k, params=params).collect()
    elapsed = time.monotonic() - t0
    return rows, {
        "index_type": stats(index)["index_type"],
        "elapsed_sec": elapsed,
        "n_results": len(rows),
    }


def stats(index) -> dict:
    """Stats dispatch (search.go:125-140)."""
    return index.stats()


def save(index, path: str) -> None:
    from gofaiss_spark.plans.artifacts import save_index

    save_index(index, path)


def load(spark: SparkSession, path: str):
    from gofaiss_spark.plans.artifacts import load_index

    return load_index(spark, path)


def reconstruct(index, ids: list[int] | None = None) -> DataFrame:
    """(id, vec) for stored ids — decoded approximations for
    quantized indexes (FAISS Index.reconstruct; the reference exposes
    raw vectors only on Flat, flat.go:118-120)."""
    from gofaiss_spark.operators.reconstruct import reconstruct as _r

    return _r(index, ids)


def merge(a, b):
    """Union two compatible same-type indexes without retraining
    (FAISS merge_from). Raises on mismatched trained state."""
    from gofaiss_spark.operators.reconstruct import merge_index

    return merge_index(a, b)
