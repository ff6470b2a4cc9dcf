"""Cluster-routed sharded HNSW (operators/hnsw.py build_hnsw_routed /
search_hnsw_routed): recall vs the flat oracle, nprobe routing
behavior, artifact round-trip, stats."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gofaiss_spark.bench_util import recall_at_k
from gofaiss_spark.operators.hnsw import (
    build_hnsw_routed,
    search_hnsw_routed,
)
from gofaiss_spark.operators.topk import search_flat


@pytest.fixture(scope="module")
def vectors(embeddings):
    return embeddings.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    ).cache()


@pytest.fixture(scope="module")
def queries(embeddings):
    return (
        embeddings.filter(F.col("vec_id") < 20)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
        .cache()
    )


@pytest.fixture(scope="module")
def index(vectors):
    return build_hnsw_routed(
        vectors, nlist=4, m=16, ef_construction=100, metric="l2", seed=42
    )


@pytest.fixture(scope="module")
def truth(vectors, queries):
    return search_flat(vectors, queries, k=10).cache()


def test_fullprobe_recall_vs_flat(queries, index, truth):
    """Probing every cell removes the routing approximation — recall
    is the per-cell graphs' own (≥0.9 at this scale)."""
    res = search_hnsw_routed(index, queries, k=10, nprobe=4, ef_search=100)
    assert recall_at_k(res, truth, 10) >= 0.9


def test_routing_recall_monotone_in_nprobe(queries, index, truth):
    recalls = [
        recall_at_k(
            search_hnsw_routed(index, queries, k=10, nprobe=p, ef_search=100),
            truth,
            10,
        )
        for p in (1, 2, 4)
    ]
    assert recalls[0] <= recalls[-1] + 1e-9
    assert recalls[-1] >= 0.9


def test_results_sorted_k_bounded_exact_distances(index, queries, vectors):
    res = search_hnsw_routed(index, queries, k=5, nprobe=2, ef_search=100)
    rows = res.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append((r.rank, r.distance, r.id))
    base = {
        r["id"]: np.asarray(r["vec"], dtype=np.float64)
        for r in vectors.collect()
    }
    qv = {
        r["query_id"]: np.asarray(r["qvec"], dtype=np.float64)
        for r in
        queries.collect()
    }
    for q, items in by_q.items():
        items.sort()
        assert len(items) <= 5
        dists = [d for _, d, _ in items]
        assert dists == sorted(dists)
        # reported distances are exact L2 to the returned vector
        # (float32 kernel → ~1e-3 absolute tolerance)
        for _, d, vid in items:
            exact = float(np.linalg.norm(qv[q] - base[vid]))
            assert d == pytest.approx(exact, abs=5e-3)


def test_nprobe_one_reads_one_cell(index, queries):
    """nprobe=1 returns only ids assigned to each query's nearest
    cell — the routing actually prunes."""
    res = search_hnsw_routed(index, queries, k=10, nprobe=1, ef_search=100)
    n_full = search_hnsw_routed(
        index, queries, k=10, nprobe=4, ef_search=100
    ).count()
    assert 0 < res.count() <= n_full


def test_stats(index):
    s = index.stats()
    assert s["index_type"] == "hnsw_routed"
    assert s["total_vectors"] > 0
    assert s["memory_mb"] > 0
    assert s["extra"]["nlist"] == 4
    assert 1 <= s["extra"]["built_shards"] <= 4


def test_save_load_search_roundtrip(spark, tmp_path, index, queries):
    from gofaiss_spark.plans.artifacts import load_index, save_index

    path = str(tmp_path / "hnsw_routed_art")
    save_index(index, path)
    loaded = load_index(spark, path)
    a = sorted(
        (r.query_id, r.rank, r.id)
        for r in search_hnsw_routed(index, queries, k=5, nprobe=2).collect()
    )
    b = sorted(
        (r.query_id, r.rank, r.id)
        for r in search_hnsw_routed(loaded, queries, k=5, nprobe=2).collect()
    )
    assert a == b
    assert loaded.nlist == index.nlist
    assert np.allclose(loaded.centroids, index.centroids)


def test_empty_queries(spark, index):
    q = spark.createDataFrame([], "query_id long, qvec array<float>")
    assert search_hnsw_routed(index, q, k=5).count() == 0


def test_routing_wins_on_clustered_data(spark):
    """The design case: a Gaussian-mixture corpus. Probing 4 of 16
    cells keeps recall ≥0.9 because neighbors co-locate with their
    cluster — the routing assumption uniform data lacks (SCALE.md
    §7)."""
    import numpy as np

    rng = np.random.default_rng(7)
    centers = rng.normal(0, 10, size=(16, 32))
    rows = []
    for i in range(2000):
        c = i % 16
        rows.append((i, (centers[c] + rng.normal(0, 0.5, 32)).tolist()))
    vectors = spark.createDataFrame(rows, "id long, vec array<float>")
    queries = spark.createDataFrame(
        [(i, rows[i * 40][1]) for i in range(20)],
        "query_id long, qvec array<float>",
    )
    idx = build_hnsw_routed(
        vectors, nlist=16, m=16, ef_construction=100, seed=42
    )
    truth = search_flat(vectors, queries, k=10)
    res = search_hnsw_routed(idx, queries, k=10, nprobe=4, ef_search=100)
    assert recall_at_k(res, truth, 10) >= 0.9
