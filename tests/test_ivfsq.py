"""IVFSQ: full-probe ≈ SQ-exactness (bounded error), pruned recall,
refine, save/load with partition pruning, unified API."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gofaiss_spark.bench_util import recall_at_k
from gofaiss_spark.operators.ivfsq import build_ivfsq, search_ivfsq
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
    i = build_ivfsq(vectors, nlist=10, seed=42)
    i.codes.cache().count()
    return i


def test_fullprobe_distances_within_bound(idx, vectors, queries, truth):
    """nprobe=nlist scans everything: every reported distance must be
    within the analytic reconstruction bound of the exact one, and
    recall must be near-exact."""
    res = search_ivfsq(idx, queries, k=K, nprobe=10)
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
    assert recall_at_k(res, truth, K) >= 0.9


def test_pruned_search_and_refine(idx, vectors, queries, truth):
    plain = recall_at_k(search_ivfsq(idx, queries, k=K, nprobe=4), truth, K)
    refined = recall_at_k(
        search_ivfsq(idx, queries, k=K, nprobe=4, refine=5, base=vectors),
        truth,
        K,
    )
    assert refined >= plain >= 0.3  # pruning-limited, not quantizer-limited


def test_save_load_roundtrip_and_pruning(idx, queries, tmp_path, spark):
    from gofaiss_spark.plans.artifacts import load_index, save_index

    path = str(tmp_path / "ivfsq_art")
    save_index(idx, path)
    loaded = load_index(spark, path)
    assert loaded.colocated is True
    np.testing.assert_allclose(loaded.vmin, idx.vmin, atol=1e-12)
    np.testing.assert_allclose(loaded.centroids, idx.centroids, atol=1e-12)
    a = sorted(
        (r["query_id"], r["rank"], r["id"])
        for r in search_ivfsq(idx, queries, k=K, nprobe=10).collect()
    )
    b = sorted(
        (r["query_id"], r["rank"], r["id"])
        for r in search_ivfsq(loaded, queries, k=K, nprobe=10).collect()
    )
    assert a == b
    # nprobe pruning reaches the parquet partition filters
    cand = loaded.codes.filter(F.col("list_id").isin([1, 2, 3]))
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan


def test_unified_api_and_stats(vectors, queries, truth):
    from gofaiss_spark.api import build_index, search, stats

    i = build_index(vectors, index_type="ivfsq", params={"nlist": 10})
    st = stats(i)
    assert st["index_type"] == "ivfsq"
    assert st["compression_ratio"] == 4.0
    res = search(
        i, queries, k=K, params={"nprobe": 10, "refine": 5, "base": vectors}
    )
    assert recall_at_k(res, truth, K) >= 0.95
    with pytest.raises(ValueError, match="l2 only"):
        build_ivfsq(vectors, nlist=10, metric="cosine")
