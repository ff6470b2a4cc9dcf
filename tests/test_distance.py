"""Distance kernel unit tests.

Mirrors the table-driven exact-value tests of
internal/math/distance_test.go:8-261 (reference): L2/L2²/dot/norm/
cosine incl. zero-vector and clamp edge cases, plus the NumPy batch
backend agreeing with the column-expression backend.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from gofaiss_spark.functions.distance import (
    cosine_distance,
    distance_col,
    dot_product,
    inner_product_distance,
    l2_distance,
    l2_distance_squared,
    norm,
    np_distance_matrix,
    validate_metric,
)

CASES = [
    # (a, b, l2, dot, cosine)
    ([1.0, 2.0, 3.0], [4.0, 5.0, 6.0], math.sqrt(27.0), 32.0, None),
    ([1.0, 0.0], [0.0, 1.0], math.sqrt(2.0), 0.0, 1.0),  # orthogonal
    ([1.0, 0.0], [1.0, 0.0], 0.0, 1.0, 0.0),  # identical
    ([1.0, 0.0], [-1.0, 0.0], 2.0, -1.0, 2.0),  # opposite
    ([0.0, 0.0], [1.0, 2.0], math.sqrt(5.0), 0.0, 1.0),  # zero vector → cosine 1.0
]


def _eval(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_exact_values(spark):
    for a, b, l2, dot, cos in CASES:
        ac = F.array(*[F.lit(float(x)) for x in a])
        bc = F.array(*[F.lit(float(x)) for x in b])
        assert _eval(spark, l2_distance(ac, bc)) == pytest.approx(l2, abs=1e-12)
        assert _eval(spark, l2_distance_squared(ac, bc)) == pytest.approx(
            l2 * l2, abs=1e-12
        )
        assert _eval(spark, dot_product(ac, bc)) == pytest.approx(dot, abs=1e-12)
        assert _eval(spark, inner_product_distance(ac, bc)) == pytest.approx(
            -dot, abs=1e-12
        )
        if cos is not None:
            assert _eval(spark, cosine_distance(ac, bc)) == pytest.approx(
                cos, abs=1e-12
            )


def test_norm(spark):
    v = F.array(F.lit(3.0), F.lit(4.0))
    assert _eval(spark, norm(v)) == pytest.approx(5.0)


def test_unknown_metric_rejected():
    with pytest.raises(ValueError):
        validate_metric("manhattan")
    with pytest.raises(ValueError):
        distance_col("manhattan", F.lit(1), F.lit(2))


def test_np_matches_expr(spark):
    rng = np.random.default_rng(42)
    base = rng.random((50, 8), dtype=np.float32)
    queries = rng.random((5, 8), dtype=np.float32)
    for metric in ("l2", "cosine", "dot"):
        dm = np_distance_matrix(base, queries, metric)
        for qi in range(queries.shape[0]):
            for bi in range(0, 50, 17):
                ac = F.array(*[F.lit(float(x)) for x in base[bi]])
                bc = F.array(*[F.lit(float(x)) for x in queries[qi]])
                expected = _eval(spark, distance_col(metric, ac, bc))
                assert dm[bi, qi] == pytest.approx(expected, abs=1e-9)


def test_np_zero_vector_cosine():
    base = np.array([[0.0, 0.0], [1.0, 0.0]])
    queries = np.array([[1.0, 1.0]])
    dm = np_distance_matrix(base, queries, "cosine")
    assert dm[0, 0] == 1.0


def test_matrix_vector_multiply(spark):
    """Exact values, distance_test.go style (simd.go:105-115)."""
    from gofaiss_spark.functions.vector import matrix_vector_multiply

    mat = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [3.0, 4.0]), (2, [0.0, 0.0])],
        schema="id long, vec array<double>",
    )
    got = {r["id"]: r["value"] for r in matrix_vector_multiply(mat, [1.0, 1.0]).collect()}
    assert got == {0: pytest.approx(3.0), 1: pytest.approx(7.0), 2: pytest.approx(0.0)}
    got2 = {r["id"]: r["value"] for r in matrix_vector_multiply(mat, [2.0, -1.0]).collect()}
    assert got2 == {0: pytest.approx(0.0), 1: pytest.approx(2.0), 2: pytest.approx(0.0)}


def test_pairwise_l2_distance_exact(spark):
    """Upper triangle of simd.go:117-136's matrix: 3-4-5 triangle."""
    from gofaiss_spark.functions.vector import pairwise_l2_distance

    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [3.0, 4.0]), (2, [3.0, 0.0])],
        schema="id long, vec array<double>",
    )
    got = {(r["id_a"], r["id_b"]): r["distance"] for r in pairwise_l2_distance(df).collect()}
    assert got == {
        (0, 1): pytest.approx(5.0),
        (0, 2): pytest.approx(3.0),
        (1, 2): pytest.approx(4.0),
    }


def test_pairwise_l2_distance_banded_matches_exact(spark):
    """The LSH-pruned scale path must return exactly the exact kernel's
    pairs within max_distance (candidate recall 1 at this geometry)."""
    from gofaiss_spark.functions.vector import pairwise_l2_distance

    rng = np.random.default_rng(7)
    pts = rng.random((40, 4))
    pts[20:] = pts[:20] + rng.normal(scale=0.01, size=(20, 4))  # planted close pairs
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(pts)],
        schema="id long, vec array<double>",
    )
    exact = {
        (r["id_a"], r["id_b"]): r["distance"]
        for r in pairwise_l2_distance(df).filter(F.col("distance") <= 0.1).collect()
    }
    banded = {
        (r["id_a"], r["id_b"]): r["distance"]
        for r in pairwise_l2_distance(df, max_distance=0.1).collect()
    }
    assert set(banded) == set(exact)
    for k in exact:
        assert banded[k] == pytest.approx(exact[k])
