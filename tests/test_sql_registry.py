"""SQL function surface (functions/sql_registry.py): each registered
SQL function must agree with its Column-builder twin in
functions/distance.py to the last bit (both are sequential double
folds), and must plan as inlined JVM expressions — never a Python
UDF node."""

import pytest
from pyspark.sql import functions as F

from gofaiss_spark.functions import distance as d
from gofaiss_spark.functions.sql_registry import register_sql_functions


@pytest.fixture(scope="module")
def pairs(spark):
    register_sql_functions(spark)
    df = spark.createDataFrame(
        [
            ([1.0, 2.0, 3.0], [4.0, 5.0, 6.0]),
            ([0.5, -1.5, 2.5], [-0.5, 1.5, -2.5]),
            ([0.0, 0.0, 0.0], [1.0, 2.0, 2.0]),  # zero vector: cosine → 1.0
            ([3.0, 4.0, 0.0], [3.0, 4.0, 0.0]),  # identical: l2 0, cos 0
        ],
        "a array<double>, b array<double>",
    )
    return df


@pytest.mark.parametrize(
    "sql_name,col_fn",
    [
        ("dot_product", d.dot_product),
        ("inner_product_distance", d.inner_product_distance),
        ("l2_distance_squared", d.l2_distance_squared),
        ("l2_distance", d.l2_distance),
        ("cosine_distance", d.cosine_distance),
    ],
)
def test_sql_matches_column_builder(pairs, sql_name, col_fn):
    rows = pairs.select(
        F.expr(f"{sql_name}(a, b)").alias("sql"),
        col_fn("a", "b").alias("col"),
    ).collect()
    for r in rows:
        assert r["sql"] == r["col"], f"{sql_name}: {r['sql']} != {r['col']}"


def test_norm_functions(pairs):
    rows = pairs.select(
        F.expr("vector_norm(a)").alias("n_sql"),
        d.norm("a").alias("n_col"),
        F.expr("vector_norm_squared(a)").alias("n2_sql"),
        d.norm_squared("a").alias("n2_col"),
    ).collect()
    for r in rows:
        assert r["n_sql"] == r["n_col"]
        assert r["n2_sql"] == r["n2_col"]


def test_zero_vector_cosine_is_one(pairs):
    row = pairs.filter(F.expr("a[0] = 0.0 AND a[1] = 0.0")).select(
        F.expr("cosine_distance(a, b)").alias("c")
    ).collect()[0]
    assert row["c"] == 1.0


def test_sql_functions_stay_jvm_side(pairs):
    """The CREATE FUNCTION bodies must inline — a plan containing
    BatchEvalPython/ArrowEvalPython would mean a Python boundary in
    what is sold as a codegen'd SQL surface."""
    plan = (
        pairs.selectExpr("l2_distance(a, b) AS x", "cosine_distance(a, b) AS y")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan


def test_float_arrays_widen(spark):
    register_sql_functions(spark)
    df = spark.createDataFrame(
        [([1.0, 2.0], [3.0, 4.0])], "a array<float>, b array<float>"
    )
    got = df.selectExpr(
        "l2_distance(CAST(a AS ARRAY<DOUBLE>), CAST(b AS ARRAY<DOUBLE>)) AS v"
    ).collect()[0]["v"]
    assert got == pytest.approx(8.0**0.5)
