"""Property-based invariant tests (hypothesis) — beyond the
reference's table-driven tests (SURVEY.md §5 lists property testing
as absent there). Each property runs the REAL distributed operators
on small generated inputs; Spark jobs are expensive, so examples are
bounded and deadlines disabled."""

import math

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SET = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _vec_df(spark, mat):
    rows = [(i, [float(x) for x in row]) for i, row in enumerate(mat)]
    return spark.createDataFrame(rows, "id long, vec array<float>")


@st.composite
def matrices(draw, max_n=40, dim=8):
    n = draw(st.integers(min_value=2, max_value=max_n))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, dim)).astype(np.float32)


@given(matrices())
@SET
def test_flat_topk_invariants(spark, mat):
    """Sorted ascending, finite, non-negative, ≤k per query, and the
    nearest neighbor of an indexed vector is itself at distance 0
    (helpers.go:160-212 invariants, generalized)."""
    from gofaiss_spark.operators.topk import search_flat

    df = _vec_df(spark, mat)
    q = df.limit(3).select(
        F.col("id").alias("query_id"), F.col("vec").alias("qvec")
    )
    rows = search_flat(df, q, k=5).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert len(rs) <= 5
        ds = [r.distance for r in rs]
        assert all(math.isfinite(d) and d >= 0 for d in ds)
        assert ds == sorted(ds)
        assert rs[0].id == qid and ds[0] < 1e-5  # self is nearest


@given(matrices(max_n=30))
@SET
def test_ivf_fullprobe_equals_flat(spark, mat):
    """nprobe = nlist scans every list ⇒ identical result set to the
    flat oracle, for ANY input (ivf.go:122-129 normalization)."""
    from gofaiss_spark.operators.ivf import build_ivf, search_ivf
    from gofaiss_spark.operators.topk import search_flat

    df = _vec_df(spark, mat)
    q = df.limit(2).select(F.col("id").alias("query_id"), F.col("vec").alias("qvec"))
    nlist = min(4, mat.shape[0])
    idx = build_ivf(df, nlist=nlist, seed=0)
    got = {
        (r.query_id, r.id)
        for r in search_ivf(idx, q, k=3, nprobe=nlist).collect()
    }
    want = {(r.query_id, r.id) for r in search_flat(df, q, k=3).collect()}
    assert got == want


@given(matrices(max_n=25), st.integers(min_value=1, max_value=3))
@SET
def test_range_search_matches_filtered_flat(spark, mat, scale):
    """Range search ≡ exact filter of the scored join at ANY
    threshold (our intentional improvement over the reference's
    oversampling, search.go:165-189)."""
    from gofaiss_spark.operators.topk import range_search, search_flat

    df = _vec_df(spark, mat)
    q = df.limit(2).select(F.col("id").alias("query_id"), F.col("vec").alias("qvec"))
    thresh = 0.5 * scale
    got = {
        (r.query_id, r.id)
        for r in range_search(df, q, threshold=thresh).collect()
    }
    full = search_flat(df, q, k=0).collect()  # k<=0 ⇒ all (flat.go:82-84)
    want = {(r.query_id, r.id) for r in full if r.distance <= thresh}
    assert got == want


@given(st.lists(st.text(alphabet="ab ", min_size=0, max_size=30), min_size=1, max_size=8))
@SET
def test_exact_dedup_partition_property(spark, texts):
    """Survivors + dropped = input; survivors are fingerprint-unique;
    every dropped doc shares a fingerprint with a lower-id survivor."""
    from gofaiss_spark.functions.text import doc_fingerprint
    from gofaiss_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    survivors = exact_dedup(df).collect()
    fps = {
        r.doc_id: r.fp
        for r in df.select("doc_id", doc_fingerprint("text").alias("fp")).collect()
    }
    surv_ids = {r.doc_id for r in survivors}
    surv_fps = [fps[i] for i in surv_ids]
    assert len(surv_fps) == len(set(surv_fps))  # unique per fingerprint
    for i in fps:
        if i not in surv_ids:
            assert any(fps[s] == fps[i] and s < i for s in surv_ids)


@given(matrices(max_n=20, dim=4))
@SET
def test_centroid_is_columnwise_mean(spark, mat):
    from gofaiss_spark.functions.vector import vector_centroid

    df = _vec_df(spark, mat)
    row = vector_centroid(df, "vec").collect()[0]
    got = np.asarray(row.centroid, dtype=np.float64)
    want = mat.astype(np.float64).mean(axis=0)
    assert np.allclose(got, want, atol=1e-6)
