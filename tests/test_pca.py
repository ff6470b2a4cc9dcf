"""PCA: orthonormal components, contraction, rotation-exactness at
k=dim, determinism, and pre-PQ usefulness."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gofaiss_spark.operators.pca import apply_pca, train_pca
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
def model(vectors):
    return train_pca(vectors, k=32)


def test_components_orthonormal_and_variance_sorted(model):
    w = model.components
    assert w.shape == (32, 64)
    np.testing.assert_allclose(w @ w.T, np.eye(32), atol=1e-8)
    ev = model.explained_variance
    assert np.all(np.diff(ev) <= 1e-12)  # descending
    assert np.all(ev >= 0)


def test_projection_is_contraction(vectors, spark):
    model = train_pca(vectors, k=16)
    proj = apply_pca(vectors, model, out_col="pvec")
    from gofaiss_spark.functions.distance import l2_distance

    # distance to a fixed row must never grow under projection
    row = vectors.first()
    q = np.array(row["vec"], dtype=np.float64)
    qp = q @ model.components.T
    checked = proj.select(
        l2_distance(
            F.col("vec").cast("array<double>"),
            F.array(*[F.lit(float(v)) for v in q]),
        ).alias("d_full"),
        l2_distance(
            F.col("pvec").cast("array<double>"),
            F.array(*[F.lit(float(v)) for v in qp]),
        ).alias("d_proj"),
    )
    bad = checked.filter(F.col("d_proj") > F.col("d_full") + 1e-5).count()
    assert bad == 0


def test_full_rank_projection_preserves_topk(vectors, spark):
    """k=dim ⇒ the projection is a rotation: flat top-k in projected
    space must equal flat top-k in the original space."""
    model = train_pca(vectors, k=64)
    proj = apply_pca(vectors, model, out_col="vec").cache()
    queries = load_query_vectors(spark, SF_DIR, 10).cache()
    pq_queries = apply_pca(queries, model, vec_col="qvec", out_col="qvec")
    got = sorted(
        (r["query_id"], r["rank"], r["id"])
        for r in search_flat(proj, pq_queries, k=K).collect()
    )
    want = sorted(
        (r["query_id"], r["rank"], r["id"])
        for r in search_flat(vectors, queries, k=K).collect()
    )
    assert got == want


def test_determinism_and_validation(vectors):
    m1 = train_pca(vectors, k=8)
    m2 = train_pca(vectors, k=8)
    np.testing.assert_allclose(m1.components, m2.components, atol=1e-10)
    with pytest.raises(ValueError, match="k <= dim"):
        train_pca(vectors, k=65)
    with pytest.raises(ValueError, match="k <= dim"):
        train_pca(vectors, k=0)


def test_pca_half_dim_recall(vectors, spark):
    """The practical check: searching in 32 of 64 dims keeps recall
    high on real(istic) embeddings — the pre-PQ use case."""
    from gofaiss_spark.bench_util import recall_at_k

    model = train_pca(vectors, k=32)
    proj = apply_pca(vectors, model, out_col="vec").cache()
    queries = load_query_vectors(spark, SF_DIR, 20).cache()
    pq_queries = apply_pca(queries, model, vec_col="qvec", out_col="qvec")
    truth = search_flat(vectors, queries, k=K)
    got = search_flat(proj, pq_queries, k=K)
    # the synthetic embeddings are near-isotropic (PCA's worst case:
    # variance is spread evenly, so dropping dims drops information
    # uniformly) — measured 0.45 here; real embedding spectra decay
    # and land far higher. The floor guards the plumbing, not the data.
    assert recall_at_k(got, truth, K) >= 0.3


def test_pca_save_load_roundtrip(vectors, tmp_path, spark):
    from gofaiss_spark.plans.artifacts import load_index, save_index

    model = train_pca(vectors, k=16)
    path = str(tmp_path / "pca_art")
    save_index(model, path)
    loaded = load_index(spark, path)
    assert (loaded.dim, loaded.k) == (model.dim, model.k)
    np.testing.assert_allclose(loaded.components, model.components, atol=1e-12)
    np.testing.assert_allclose(
        loaded.explained_variance, model.explained_variance, atol=1e-12
    )
    a = apply_pca(vectors, model, out_col="p").select("id", "p").collect()
    b = apply_pca(vectors, loaded, out_col="p").select("id", "p").collect()
    assert sorted((r["id"], tuple(r["p"])) for r in a) == sorted(
        (r["id"], tuple(r["p"])) for r in b
    )
