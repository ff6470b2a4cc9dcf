"""IVF tests, mirroring test/integration/index_test.go:104-150
(IVF end-to-end + nprobe sweep + list distribution) with the flat
oracle as ground truth."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gofaiss_spark.bench_util import recall_at_k
from gofaiss_spark.operators.ivf import (
    build_ivf,
    default_nlist,
    probe_lists,
    search_ivf,
)
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
    return build_ivf(vectors, nlist=16, metric="l2", seed=42)


def test_default_nlist():
    assert default_nlist(100) == 10  # sqrt clamped up
    assert default_nlist(100_000) == 316
    assert default_nlist(10**12) == 65536  # clamp


def test_too_few_vectors_rejected(vectors):
    with pytest.raises(ValueError):
        build_ivf(vectors.limit(5), nlist=16)


def test_every_vector_assigned(vectors, index):
    n = vectors.count()
    assert index.assignments.count() == n
    sizes = index.list_sizes().collect()
    assert sum(r.n_vectors for r in sizes) == n
    assert all(0 <= r.list_id < 16 for r in sizes)


def test_assignment_is_argmin(index):
    rows = index.assignments.limit(50).collect()
    for r in rows:
        d = np.linalg.norm(index.centroids - np.asarray(r.vec, dtype=np.float64), axis=1)
        assert r.list_id == int(np.argmin(d))


def test_fullprobe_equals_flat(vectors, queries, index):
    """nprobe = nlist scans every list → identical to brute force."""
    k = 10
    ivf_res = search_ivf(index, queries, k=k, nprobe=16).collect()
    flat_res = search_flat(vectors, queries, k=k, metric="l2").collect()
    ivf_set = {(r.query_id, r.id, r.rank) for r in ivf_res}
    flat_set = {(r.query_id, r.id, r.rank) for r in flat_res}
    assert ivf_set == flat_set


def test_nprobe_sweep_recall_monotone(vectors, queries, index):
    k = 10
    truth = search_flat(vectors, queries, k=k, metric="l2")
    recalls = {}
    for nprobe in (1, 4, 16):
        res = search_ivf(index, queries, k=k, nprobe=nprobe)
        recalls[nprobe] = recall_at_k(res, truth, k)
    assert recalls[16] == pytest.approx(1.0)
    assert recalls[1] <= recalls[4] + 1e-9 <= recalls[16] + 2e-9
    # tuned-recall target analogue (docs/benchmarks.md:134-144):
    # probing a quarter of the lists should already recall well
    assert recalls[4] >= 0.5


def test_nprobe_bounds(index, queries):
    # nprobe <= 0 or > nlist ⇒ nlist (ivf.go:122-129)
    q = np.zeros((1, index.dim))
    p0 = probe_lists(index.centroids, np.array([0]), q, 0, "l2")
    p_big = probe_lists(index.centroids, np.array([0]), q, 999, "l2")
    assert len(p0) == index.nlist
    assert len(p_big) == index.nlist


def test_stats(index, vectors):
    s = index.stats()
    n = vectors.count()
    assert s["total_vectors"] == n
    assert s["nlist"] == 16
    assert s["index_type"] == "ivf"
    # ivf.go:199-224: (n + nlist) * dim * 4 bytes
    assert s["memory_mb"] == pytest.approx(
        (n + 16) * index.dim * 4 / (1024 * 1024)
    )


def test_ivf_health_distortion_and_balance(vectors):
    from gofaiss_spark.operators.ivf import build_ivf, ivf_health

    idx = build_ivf(vectors, nlist=4, seed=42)
    rows = ivf_health(idx).collect()
    assert len(rows) <= 4
    total = sum(r["n_vectors"] for r in rows)
    assert total == vectors.count()
    for r in rows:
        assert r["n_vectors"] > 0
        assert r["mean_dist"] >= 0
    # distortion must not exceed the corpus-wide pairwise scale; for
    # unit-ish synthetic embeddings the mean member-to-centroid
    # distance is bounded well below the max vector norm
    import numpy as np

    from pyspark.sql import functions as F

    max_norm = vectors.select(
        F.sqrt(
            F.aggregate(
                F.col("vec").cast("array<double>"),
                F.lit(0.0),
                lambda s, x: s + x * x,
            )
        ).alias("n")
    ).agg(F.max("n")).collect()[0][0]
    for r in rows:
        assert r["mean_dist"] <= 2 * max_norm


def test_local_trainer_builds_valid_index(spark):
    """trainer="local" (driver-side Lloyd, k-means++ init) must yield
    a working IVF index: full-probe search is exact regardless of the
    clustering, and centroids are finite with the right shape."""
    import numpy as np
    from pyspark.sql import functions as F

    from gofaiss_spark.bench_util import recall_at_k
    from gofaiss_spark.operators.ivf import build_ivf, search_ivf
    from gofaiss_spark.operators.topk import search_flat

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    v = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    idx = build_ivf(v, nlist=8, seed=42, trainer="local")
    assert idx.centroids.shape[0] == 8
    assert np.isfinite(idx.centroids).all()
    truth = search_flat(v, q, k=5)
    res = search_ivf(idx, q, k=5, nprobe=8)  # full probe == exact
    assert recall_at_k(res, truth, 5) == 1.0
