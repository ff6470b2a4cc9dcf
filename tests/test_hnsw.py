"""HNSW driver-side index tests: recall vs the flat oracle, efSearch
sweep, Remove, edges-DataFrame export, and the size guard —
mirroring test/integration/index_test.go:58-102 of the reference."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gofaiss_spark.bench_util import recall_at_k
from gofaiss_spark.operators.hnsw import (
    build_hnsw,
    remove_hnsw,
    search_hnsw,
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
    return build_hnsw(vectors, m=16, ef_construction=100, metric="l2", seed=42)


def test_recall_vs_flat(vectors, queries, index):
    truth = search_flat(vectors, queries, k=10)
    res = search_hnsw(index, queries, k=10, ef_search=100)
    assert recall_at_k(res, truth, 10) >= 0.95


def test_results_sorted_and_k_bounded(index, queries):
    rows = search_hnsw(index, queries, k=5).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append((r.rank, r.distance))
    for q, items in by_q.items():
        items.sort()
        assert len(items) <= 5
        dists = [d for _, d in items]
        assert dists == sorted(dists)
        assert all(np.isfinite(d) and d >= 0 for d in dists)


def test_ef_search_sweep_recall_monotone(vectors, queries, index):
    truth = search_flat(vectors, queries, k=10)
    recalls = [
        recall_at_k(search_hnsw(index, queries, k=10, ef_search=ef), truth, 10)
        for ef in (10, 50, 200)
    ]
    assert recalls[-1] >= recalls[0]
    assert recalls[-1] >= 0.99


def test_cosine_metric(vectors, queries):
    idx = build_hnsw(vectors, m=8, ef_construction=64, metric="cosine", seed=1)
    truth = search_flat(vectors, queries, k=10, metric="cosine")
    res = search_hnsw(idx, queries, k=10, ef_search=100)
    assert recall_at_k(res, truth, 10) >= 0.9


def test_remove(vectors, queries):
    idx = build_hnsw(vectors, m=8, ef_construction=64, seed=7)
    target = int(
        search_hnsw(idx, queries.limit(1), k=1).collect()[0].id
    )
    remove_hnsw(idx, target)
    ids_after = {r.id for r in search_hnsw(idx, queries, k=10).collect()}
    assert target not in ids_after
    with pytest.raises(KeyError):
        remove_hnsw(idx, 10**12)


def test_edges_df(index, spark):
    edges = index.edges_df(spark)
    assert edges.columns == ["level", "src", "dst"]
    lvl0 = edges.filter(F.col("level") == 0)
    n = index.graph.n()
    assert lvl0.select("src").distinct().count() == n
    # degree cap: 2M at level 0 (hnsw.go:317-320)
    max_deg = (
        lvl0.groupBy("src").count().agg(F.max("count").alias("m")).collect()[0]["m"]
    )
    assert max_deg <= 2 * index.graph.m


def test_max_vectors_guard(vectors):
    with pytest.raises(ValueError, match="small-index"):
        build_hnsw(vectors, max_vectors=10)


def test_save_load_roundtrip(index, queries, spark, tmp_path):
    """Loaded index returns identical results to the original — the
    integration-test invariant of index_test.go:20-56."""
    from gofaiss_spark.api import load, save

    path = str(tmp_path / "hnsw_idx")
    save(index, path)
    loaded = load(spark, path)
    orig = sorted(
        (r.query_id, r.id, round(r.distance, 6))
        for r in search_hnsw(index, queries, k=10, ef_search=100).collect()
    )
    redo = sorted(
        (r.query_id, r.id, round(r.distance, 6))
        for r in search_hnsw(loaded, queries, k=10, ef_search=100).collect()
    )
    assert orig == redo


def test_api_dispatch(vectors, queries):
    from gofaiss_spark.api import build_index, search

    idx = build_index(vectors, index_type="hnsw_local", params={"ef_construction": 64})
    res = search(idx, queries, k=5, params={"ef_search": 64})
    assert res.count() == queries.count() * 5


def test_stats(index):
    s = index.stats()
    assert s["index_type"] == "hnsw"
    assert s["total_vectors"] == index.graph.n()
    assert s["extra"]["m"] == 16
    assert s["extra"]["max_level"] == index.graph.max_level


# ---------------------------------------------------------------------------
# sharded HNSW — the distributed build/serve path (FAISS IndexShards
# pattern; hnsw.go:291-341 semantics per shard)
# ---------------------------------------------------------------------------

from gofaiss_spark.operators.hnsw import (  # noqa: E402
    build_hnsw_sharded,
    remove_hnsw_sharded,
    search_hnsw_sharded,
)


@pytest.fixture(scope="module")
def sharded(vectors):
    return build_hnsw_sharded(
        vectors, num_shards=4, m=16, ef_construction=100, metric="l2", seed=42
    )


def test_sharded_recall_vs_flat(vectors, queries, sharded):
    truth = search_flat(vectors, queries, k=10)
    res = search_hnsw_sharded(sharded, queries, k=10, ef_search=100)
    assert recall_at_k(res, truth, 10) >= 0.95


def test_sharded_results_sorted_and_exact_distances(
    vectors, queries, sharded
):
    """Distances are exact L2 (graph only picks candidates), sorted,
    deduplicated — shards partition the id space so no id can appear
    twice."""
    rows = search_hnsw_sharded(sharded, queries, k=5).collect()
    base = {
        r.id: np.asarray(r.vec, dtype=np.float64) for r in vectors.collect()
    }
    qmap = {
        r.query_id: np.asarray(r.qvec, dtype=np.float64)
        for r in queries.collect()
    }
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, items in by_q.items():
        items.sort(key=lambda r: r.rank)
        assert len(items) <= 5
        assert len({r.id for r in items}) == len(items)
        dists = [r.distance for r in items]
        assert dists == sorted(dists)
        for r in items:
            exact = float(np.linalg.norm(base[r.id] - qmap[r.query_id]))
            assert abs(r.distance - exact) < 1e-3


def test_sharded_covers_all_shards(vectors, sharded):
    s = sharded.stats()
    assert s["index_type"] == "hnsw_sharded"
    assert s["total_vectors"] == vectors.count()
    assert s["extra"]["num_shards"] == 4
    assert s["memory_mb"] > 0


def test_sharded_remove(vectors, queries, sharded):
    idx = build_hnsw_sharded(vectors, num_shards=4, m=8, ef_construction=64)
    n0 = idx.stats()["total_vectors"]
    victims = [
        int(r.id)
        for r in search_hnsw_sharded(idx, queries.limit(1), k=3).collect()
    ]
    remove_hnsw_sharded(idx, victims)
    assert idx.stats()["total_vectors"] == n0 - len(victims)
    ids_after = {
        r.id for r in search_hnsw_sharded(idx, queries, k=10).collect()
    }
    assert not (set(victims) & ids_after)


def test_sharded_save_load_roundtrip(sharded, queries, spark, tmp_path):
    from gofaiss_spark.api import load, save

    path = str(tmp_path / "hnsw_sharded_idx")
    save(sharded, path)
    loaded = load(spark, path)
    assert loaded.ef_construction == 100 and loaded.num_shards == 4
    orig = sorted(
        (r.query_id, r.id, round(r.distance, 6))
        for r in search_hnsw_sharded(sharded, queries, k=10).collect()
    )
    redo = sorted(
        (r.query_id, r.id, round(r.distance, 6))
        for r in search_hnsw_sharded(loaded, queries, k=10).collect()
    )
    assert orig == redo


def test_sharded_api_dispatch(vectors, queries):
    from gofaiss_spark.api import build_index, search

    idx = build_index(
        vectors,
        index_type="hnsw_sharded",
        params={"num_shards": 3, "ef_construction": 64},
    )
    res = search(idx, queries, k=5, params={"ef_search": 64})
    assert res.count() == queries.count() * 5


# --- round 8: lock-step batch kernel vs the sequential reference ---


@pytest.mark.parametrize("metric", ["l2", "cosine", "dot"])
def test_batch_kernel_matches_sequential_reference(metric):
    """The vectorized `_search_graph_batch` must return BIT-IDENTICAL
    results to the per-query kernel (`_search_graph_batch_seq`) —
    both score via the same einsum row reduction since round 9, so
    the small-batch dispatch can never change a result the
    cross-tier bit-equality gates see (exact f32 score ties
    excepted; absent on random data)."""
    from gofaiss_spark.operators.hnsw import (
        _build_graph,
        _prep,
        _search_graph_batch,
        _search_graph_batch_seq,
    )

    rng = np.random.default_rng(11)
    vecs = _prep(rng.random((800, 32), dtype=np.float32), metric)
    g = _build_graph(
        np.arange(800, dtype=np.int64) * 3, vecs, 8, 64, metric, 5
    )
    q = _prep(rng.random((60, 32), dtype=np.float32), metric)
    qids = np.arange(60, dtype=np.int64)
    a = _search_graph_batch(g, q, qids, 10, 50)
    b = _search_graph_batch_seq(g, q, qids, 10, 50)
    for df in (a, b):
        df.sort_values(["query_id", "id"], inplace=True)
        df.reset_index(drop=True, inplace=True)
    assert (a["query_id"].to_numpy() == b["query_id"].to_numpy()).all()
    assert (a["id"].to_numpy() == b["id"].to_numpy()).all()
    assert (a["distance"].to_numpy() == b["distance"].to_numpy()).all()


@pytest.mark.parametrize("metric", ["l2", "cosine", "dot"])
def test_small_batch_dispatch_bit_equal(metric):
    """Batches below SEQ_DISPATCH_MAX route to the sequential kernel
    (r8 A/B: lock-step 1.34x slower at batch=6); the dispatched
    result must be bit-identical to a forced lock-step run of the
    same queries."""
    from gofaiss_spark.operators import hnsw as H

    rng = np.random.default_rng(23)
    vecs = H._prep(rng.random((600, 24), dtype=np.float32), metric)
    g = H._build_graph(
        np.arange(600, dtype=np.int64), vecs, 8, 64, metric, 9
    )
    q = H._prep(rng.random((5, 24), dtype=np.float32), metric)
    qids = np.arange(5, dtype=np.int64)
    assert 5 < H.SEQ_DISPATCH_MAX
    a = H._search_graph_batch(g, q, qids, 10, 50)  # → sequential arm
    orig = H.SEQ_DISPATCH_MAX
    H.SEQ_DISPATCH_MAX = 1
    try:
        b = H._search_graph_batch(g, q, qids, 10, 50)  # → lock-step
    finally:
        H.SEQ_DISPATCH_MAX = orig
    for df in (a, b):
        df.sort_values(["query_id", "id"], inplace=True)
        df.reset_index(drop=True, inplace=True)
    assert (a["id"].to_numpy() == b["id"].to_numpy()).all()
    assert (a["distance"].to_numpy() == b["distance"].to_numpy()).all()


def test_packed_visited_bit_equal():
    """The bit-packed visited bitmap (graphs above _BOOL_VISITED_MAX_N
    nodes — round-9 decoupling of chunk width from graph size) must
    produce bit-identical results to the bool-matrix path."""
    from gofaiss_spark.operators import hnsw as H

    rng = np.random.default_rng(31)
    vecs = H._prep(rng.random((3000, 16), dtype=np.float32), "l2")
    g = H._build_graph(
        np.arange(3000, dtype=np.int64), vecs, 8, 64, "l2", 7
    )
    q = H._prep(rng.random((200, 16), dtype=np.float32), "l2")
    qids = np.arange(200, dtype=np.int64)
    a = H._search_graph_batch(g, q, qids, 10, 50)  # bool path
    orig = H._BOOL_VISITED_MAX_N
    H._BOOL_VISITED_MAX_N = 100  # force the packed path
    try:
        b = H._search_graph_batch(g, q, qids, 10, 50)
    finally:
        H._BOOL_VISITED_MAX_N = orig
    for df in (a, b):
        df.sort_values(["query_id", "id"], inplace=True)
        df.reset_index(drop=True, inplace=True)
    assert (a["id"].to_numpy() == b["id"].to_numpy()).all()
    assert (a["distance"].to_numpy() == b["distance"].to_numpy()).all()


def test_batch_kernel_csr_cache_invalidated_by_remove(vectors, queries):
    """Remove must reset the cached CSR adjacency: a search after
    remove_hnsw runs on the updated graph (the removed id never
    reappears), not a stale CSR snapshot."""
    idx = build_hnsw(vectors, m=8, ef_construction=64, seed=13)
    first = search_hnsw(idx, queries, k=5)  # populates the CSR cache
    target = int(first.limit(1).collect()[0].id)
    remove_hnsw(idx, target)
    after = {r.id for r in search_hnsw(idx, queries, k=10).collect()}
    assert target not in after
