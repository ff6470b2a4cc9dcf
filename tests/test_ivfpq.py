"""IVFPQ tests, mirroring test/integration/index_test.go:194-249
(end-to-end + nprobe sweep). Implements the search path the
reference façade left broken (search.go:72-80)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gofaiss_spark.bench_util import recall_at_k
from gofaiss_spark.operators.ivfpq import build_ivfpq, default_m, search_ivfpq
from gofaiss_spark.operators.topk import search_flat


@pytest.fixture(scope="module")
def vectors(embeddings):
    return embeddings.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    ).cache()


@pytest.fixture(scope="module")
def queries(embeddings):
    return embeddings.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )


@pytest.fixture(scope="module")
def index(vectors):
    # 500 vectors: nlist=10 (500 ≥ 10·10), M=8, nbits=5 → ksub=32
    return build_ivfpq(vectors, nlist=10, m=8, nbits=5)


def test_default_m():
    assert default_m(64) == 8
    assert default_m(128) == 8
    assert default_m(96) == 8
    assert default_m(33) == 11  # smallest divisor in [8,32]
    assert default_m(13) == 13  # 13 divides itself, in [8,32]
    assert default_m(7) == 4  # no divisor in [8,32] → fallback


def test_min_train_guard(vectors):
    with pytest.raises(ValueError):
        build_ivfpq(vectors.limit(50), nlist=10, m=8, nbits=4)  # 50 < 100


def test_codes_cover_all(index, vectors):
    n = vectors.count()
    assert index.codes.count() == n
    sizes = index.list_sizes().collect()
    assert sum(r.n_vectors for r in sizes) == n
    row = index.codes.first()
    assert len(row.code) == 8
    assert all(0 <= c < 32 for c in row.code)


def test_search_shape_and_order(index, queries):
    k = 10
    res = search_ivfpq(index, queries, k=k, nprobe=3).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r.query_id, []).append(r)
    assert len(by_q) == 20
    for rs in by_q.values():
        rs.sort(key=lambda r: r.rank)
        assert len(rs) == k
        ds = [r.distance for r in rs]
        assert ds == sorted(ds)
        assert all(np.isfinite(d) and d >= 0 for d in ds)


def test_recall_improves_with_nprobe(index, vectors, queries):
    k = 10
    truth = search_flat(vectors, queries, k=k, metric="l2")
    r_small = recall_at_k(search_ivfpq(index, queries, k=k, nprobe=1), truth, k)
    r_full = recall_at_k(search_ivfpq(index, queries, k=k, nprobe=10), truth, k)
    assert r_full >= r_small - 1e-9
    # full probe: quantization is the only loss; clustered data with
    # 8×5-bit residual codebooks should recall most true neighbors
    assert r_full >= 0.4, f"IVFPQ full-probe recall {r_full}"


def test_stats(index, vectors):
    s = index.stats()
    n = vectors.count()
    assert s["total_vectors"] == n
    assert s["compression_ratio"] == 32.0
    assert s["index_type"] == "ivfpq"
    # ivfpq.go:322-364: codes + codebooks + centroids
    ksub, dsub = 1 << s["nbits"], s["dimension"] // s["m"]
    assert s["memory_mb"] == pytest.approx(
        (n * s["m"] + s["m"] * ksub * dsub * 4 + s["nlist"] * s["dimension"] * 4)
        / (1024 * 1024)
    )
