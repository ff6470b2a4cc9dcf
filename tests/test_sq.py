"""Scalar quantization: bounded reconstruction error, near-exact
recall, refine path, save/load, unified-API dispatch."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gofaiss_spark.bench_util import recall_at_k
from gofaiss_spark.operators.sq import build_sq, search_sq
from gofaiss_spark.operators.topk import search_flat
from gofaiss_spark.sources.readers import (
    load_embeddings_as_vectors,
    load_query_vectors,
)

SF_DIR = "/root/testdata/sf0.001"
K = 10


@pytest.fixture(scope="module")
def vectors(spark):
    df = load_embeddings_as_vectors(spark, SF_DIR).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def queries(spark, vectors):
    df = load_query_vectors(spark, SF_DIR, 20).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def truth(vectors, queries):
    df = search_flat(vectors, queries, k=K).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def idx(vectors):
    i = build_sq(vectors)
    i.codes.cache().count()
    return i


def test_codes_in_range_and_bounds(idx, vectors):
    rows = idx.codes.select(
        F.array_min("code").alias("mn"), F.array_max("code").alias("mx")
    ).agg(F.min("mn"), F.max("mx")).first()
    assert rows[0] >= 0 and rows[1] <= 255
    assert idx.dim == 64
    assert idx.distance_error_bound() > 0


def test_sq_distances_within_error_bound(idx, vectors, queries):
    """Every reported distance must be within the analytic
    reconstruction bound of the exact distance."""
    res = search_sq(idx, queries, k=K)
    exact = search_flat(vectors, queries, k=0, method="expr").select(
        "query_id", "id", F.col("distance").alias("_exact")
    )
    joined = res.join(exact, ["query_id", "id"])
    assert joined.count() == res.count()
    bound = idx.distance_error_bound() + 1e-6
    assert (
        joined.filter(F.abs(F.col("distance") - F.col("_exact")) > bound).count()
        == 0
    )


def test_sq_recall_near_exact(idx, queries, truth):
    assert recall_at_k(search_sq(idx, queries, k=K), truth, K) >= 0.95


def test_sq_refine_exact_distances(idx, vectors, queries, truth):
    res = search_sq(idx, queries, k=K, refine=5, base=vectors)
    assert recall_at_k(res, truth, K) >= 0.99
    exact = search_flat(vectors, queries, k=0, method="expr").select(
        "query_id", "id", F.col("distance").alias("_exact")
    )
    joined = res.join(exact, ["query_id", "id"])
    assert (
        joined.filter(F.abs(F.col("distance") - F.col("_exact")) > 1e-6).count()
        == 0
    )


def test_sq_save_load_roundtrip(idx, queries, tmp_path, spark):
    from gofaiss_spark.plans.artifacts import load_index, save_index

    path = str(tmp_path / "sq_art")
    save_index(idx, path)
    loaded = load_index(spark, path)
    np.testing.assert_allclose(loaded.vmin, idx.vmin, atol=1e-12)
    np.testing.assert_allclose(loaded.vmax, idx.vmax, atol=1e-12)
    a = sorted(
        (r["query_id"], r["rank"], r["id"])
        for r in search_sq(idx, queries, k=K).collect()
    )
    b = sorted(
        (r["query_id"], r["rank"], r["id"])
        for r in search_sq(loaded, queries, k=K).collect()
    )
    assert a == b


def test_sq_unified_api_and_stats(vectors, queries, truth):
    from gofaiss_spark.api import build_index, search, stats

    i = build_index(vectors, index_type="sq")
    st = stats(i)
    assert st["index_type"] == "sq"
    assert st["compression_ratio"] == 4.0
    assert st["n_vectors"] == vectors.count()
    res = search(i, queries, k=K, params={"refine": 5, "base": vectors})
    assert recall_at_k(res, truth, K) >= 0.99
    with pytest.raises(ValueError, match="l2 only"):
        build_sq(vectors, metric="cosine")
    with pytest.raises(ValueError, match="base"):
        search_sq(i, queries, k=K, refine=5)
