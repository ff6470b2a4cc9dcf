"""reconstruct() + merge_index() (operators/reconstruct.py):
exact round-trip for storing indexes, bounded decode error for
quantized ones, merge equivalence and incompatibility errors."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gofaiss_spark.operators.reconstruct import merge_index, reconstruct


@pytest.fixture(scope="module")
def vectors(embeddings):
    return embeddings.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    ).cache()


@pytest.fixture(scope="module")
def vec_map(vectors):
    return {
        r["id"]: np.asarray(r["vec"], dtype=np.float64)
        for r in vectors.collect()
    }


def _recon_map(df):
    return {
        r["id"]: np.asarray(r["vec"], dtype=np.float64) for r in df.collect()
    }


def test_reconstruct_flat_exact(vectors, vec_map):
    from gofaiss_spark.operators.flat import build_flat

    idx = build_flat(vectors)
    got = _recon_map(reconstruct(idx, ids=[0, 1, 2]))
    assert set(got) == {0, 1, 2}
    for i, v in got.items():
        assert np.allclose(v, vec_map[i], atol=1e-6)


def test_reconstruct_ivf_exact(vectors, vec_map):
    from gofaiss_spark.operators.ivf import build_ivf

    idx = build_ivf(vectors, nlist=4, seed=42)
    got = _recon_map(reconstruct(idx))
    assert len(got) == len(vec_map)
    for i in (0, 5, 17):
        assert np.allclose(got[i], vec_map[i], atol=1e-6)


def test_reconstruct_sq_within_step(vectors, vec_map):
    from gofaiss_spark.operators.sq import build_sq

    idx = build_sq(vectors)
    got = _recon_map(reconstruct(idx, ids=[0, 3, 9]))
    for i, v in got.items():
        assert np.all(np.abs(v - vec_map[i]) <= idx.step + 1e-5)


def test_reconstruct_pq_matches_manual_decode(vectors):
    from gofaiss_spark.operators.pq import build_pq

    idx = build_pq(vectors, m=8, nbits=4, seed=42)
    row = idx.codes.filter(F.col("id") == 0).collect()[0]
    manual = np.concatenate(
        [idx.codebooks[j, int(row["code"][j])] for j in range(idx.m)]
    )
    got = _recon_map(reconstruct(idx, ids=[0]))[0]
    assert np.allclose(got, manual, atol=1e-5)


def test_reconstruct_ivfpq_centroid_plus_residual(vectors):
    from gofaiss_spark.operators.ivfpq import build_ivfpq

    idx = build_ivfpq(vectors, nlist=4, m=8, nbits=4, seed=42)
    row = idx.codes.filter(F.col("id") == 0).collect()[0]
    manual = idx.centroids[int(row["list_id"])] + np.concatenate(
        [idx.codebooks[j, int(row["code"][j])] for j in range(idx.m)]
    )
    got = _recon_map(reconstruct(idx, ids=[0]))[0]
    assert np.allclose(got, manual, atol=1e-4)


def test_reconstruct_quantized_decode_is_close(vectors, vec_map):
    """The decoded vector is the index's own approximation: the
    decode error must be well under the data spread."""
    from gofaiss_spark.operators.ivfsq import build_ivfsq

    idx = build_ivfsq(vectors, nlist=4)
    got = _recon_map(reconstruct(idx, ids=[0, 7]))
    for i, v in got.items():
        err = np.linalg.norm(v - vec_map[i])
        assert err <= idx.distance_error_bound() + 1e-5


def test_reconstruct_hnsw_sharded(vectors, vec_map):
    from gofaiss_spark.operators.hnsw import build_hnsw_sharded

    idx = build_hnsw_sharded(vectors, num_shards=4, ef_construction=50)
    got = _recon_map(reconstruct(idx, ids=[1, 2]))
    assert set(got) == {1, 2}
    for i, v in got.items():
        assert np.allclose(v, vec_map[i], atol=1e-5)


def test_merge_flat_search_equals_union(spark, vectors):
    from gofaiss_spark.operators.flat import build_flat
    from gofaiss_spark.operators.topk import search_flat

    a_vec = vectors.filter(F.col("id") % 2 == 0)
    b_vec = vectors.filter(F.col("id") % 2 == 1)
    merged = merge_index(build_flat(a_vec), build_flat(b_vec))
    q = vectors.filter(F.col("id") < 5).select(
        F.col("id").alias("query_id"), F.col("vec").alias("qvec")
    )
    expect = sorted(
        (r.query_id, r.rank, r.id)
        for r in search_flat(vectors, q, k=5).collect()
    )
    got = sorted(
        (r.query_id, r.rank, r.id) for r in merged.search(q, k=5).collect()
    )
    assert got == expect


def test_merge_ivf_search_equals_single_build(spark, vectors):
    from gofaiss_spark.operators.ivf import (
        assign_to_centroids,
        build_ivf,
        search_ivf,
    )
    import dataclasses

    full = build_ivf(vectors, nlist=4, seed=42)
    # split the assignments into two indexes sharing the centroids
    a = dataclasses.replace(
        full, assignments=full.assignments.filter(F.col("id") % 2 == 0)
    )
    b = dataclasses.replace(
        full, assignments=full.assignments.filter(F.col("id") % 2 == 1)
    )
    merged = merge_index(a, b)
    q = vectors.filter(F.col("id") < 5).select(
        F.col("id").alias("query_id"), F.col("vec").alias("qvec")
    )
    expect = sorted(
        (r.query_id, r.rank, r.id)
        for r in search_ivf(full, q, k=5, nprobe=4).collect()
    )
    got = sorted(
        (r.query_id, r.rank, r.id)
        for r in search_ivf(merged, q, k=5, nprobe=4).collect()
    )
    assert got == expect


def test_merge_incompatible_raises(vectors):
    from gofaiss_spark.operators.flat import build_flat
    from gofaiss_spark.operators.ivf import build_ivf
    from gofaiss_spark.operators.pq import build_pq

    with pytest.raises(ValueError, match="incompatible"):
        merge_index(build_flat(vectors), build_ivf(vectors, nlist=4, seed=42))
    a = build_pq(vectors, m=8, nbits=4, seed=42)
    b = build_pq(vectors, m=8, nbits=4, seed=43)  # different codebooks
    if not np.allclose(a.codebooks, b.codebooks):
        with pytest.raises(ValueError, match="codebooks"):
            merge_index(a, b)


def test_merge_hnsw_sharded_serves_both_halves(spark, vectors):
    from gofaiss_spark.operators.hnsw import (
        build_hnsw_sharded,
        search_hnsw_sharded,
    )

    a_vec = vectors.filter(F.col("id") % 2 == 0)
    b_vec = vectors.filter(F.col("id") % 2 == 1)
    a = build_hnsw_sharded(a_vec, num_shards=2, ef_construction=100)
    b = build_hnsw_sharded(b_vec, num_shards=2, ef_construction=100)
    merged = merge_index(a, b)
    assert merged.num_shards == 4
    assert merged.stats()["total_vectors"] == vectors.count()
    # a query identical to a vector from either half must surface it
    q = vectors.filter(F.col("id").isin([0, 1, 2, 3])).select(
        F.col("id").alias("query_id"), F.col("vec").alias("qvec")
    )
    res = search_hnsw_sharded(merged, q, k=3, ef_search=100)
    top1 = {r["query_id"]: r["id"] for r in res.collect() if r["rank"] == 1}
    assert top1 == {0: 0, 1: 1, 2: 2, 3: 3}


def test_merge_hnsw_routed_same_centroids(spark, vectors):
    import dataclasses

    from gofaiss_spark.operators.hnsw import (
        build_hnsw_routed,
        search_hnsw_routed,
    )

    full = build_hnsw_routed(vectors, nlist=4, ef_construction=100, seed=42)
    # split blobs is awkward; instead rebuild halves against the SAME
    # centroids by reusing full's centroid table via assign-time build
    a_vec = vectors.filter(F.col("id") % 2 == 0)
    b_vec = vectors.filter(F.col("id") % 2 == 1)
    a = build_hnsw_routed(a_vec, nlist=4, ef_construction=100, seed=42)
    b = build_hnsw_routed(b_vec, nlist=4, ef_construction=100, seed=42)
    # force identical routing tables for the merge contract
    b = dataclasses.replace(b, centroids=a.centroids)
    merged = merge_index(a, b)
    assert merged.stats()["total_vectors"] == vectors.count()
    q = vectors.filter(F.col("id") < 4).select(
        F.col("id").alias("query_id"), F.col("vec").alias("qvec")
    )
    res = search_hnsw_routed(merged, q, k=3, nprobe=4, ef_search=100)
    assert res.filter(F.col("rank") == 1).count() == 4
