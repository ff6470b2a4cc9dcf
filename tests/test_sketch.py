"""Sketch profiling invariants (functions/sketch.py)."""

import pytest
from pyspark.sql import functions as F

from gofaiss_spark.functions.sketch import distinct_sketch, quantile_sketch


def test_distinct_sketch_exact_and_ok(spark):
    df = spark.range(10_000).select(
        (F.col("id") % 1000).alias("a"), (F.col("id") % 7).alias("b")
    )
    rows = {r["column_name"]: r for r in distinct_sketch(df, ["a", "b"]).collect()}
    assert rows["a"]["exact_distinct"] == 1000
    assert rows["b"]["exact_distinct"] == 7
    assert rows["a"]["approx_ok"] and rows["b"]["approx_ok"]


def test_distinct_sketch_with_nulls(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (2,), (None,)], "x int"
    )
    r = distinct_sketch(df, ["x"]).collect()[0]
    # count_distinct and approx_count_distinct both ignore nulls
    assert r["exact_distinct"] == 2
    assert r["approx_ok"]


def test_quantile_sketch_known_values(spark):
    # 0..1000 uniformly: p50 = 500 exactly (odd count, exact middle)
    df = spark.range(1001).select(F.col("id").cast("double").alias("v"))
    rows = {r["prob"]: r for r in
            quantile_sketch(df, "v", probs=(0.5, 0.9)).collect()}
    assert rows[0.5]["exact_value"] == pytest.approx(500.0)
    assert rows[0.9]["exact_value"] == pytest.approx(900.0)
    assert all(r["approx_ok"] for r in rows.values())


def test_quantile_sketch_interpolates(spark):
    # 4 points: p50 of (1,2,3,10) = 2.5 under linear interpolation
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,), (10.0,)], "v double")
    r = quantile_sketch(df, "v", probs=(0.5,)).collect()[0]
    assert r["exact_value"] == pytest.approx(2.5)


def test_heavy_hitters_cms(spark):
    from gofaiss_spark.functions.sketch import heavy_hitters_cms

    df = spark.range(1000).select((F.col("id") % 10).alias("u"))
    # key 0..9 each 100× → exact ties broken by key asc
    rows = heavy_hitters_cms(df, "u", k=3).collect()
    assert [(r["key"], r["exact_count"]) for r in rows] == [
        (0, 100), (1, 100), (2, 100)
    ]
    assert all(r["cms_ge_exact"] for r in rows)


def test_heavy_hitters_skewed(spark):
    from gofaiss_spark.functions.sketch import heavy_hitters_cms

    df = spark.range(10_000).select(
        F.when(F.col("id") % 2 == 0, 7).otherwise(F.col("id")).alias("u")
    )
    rows = heavy_hitters_cms(df, "u", k=1).collect()
    # 5000 evens map to 7, plus id=7 itself (odd, unmapped)
    assert rows[0]["key"] == 7 and rows[0]["exact_count"] == 5001
    assert rows[0]["cms_ge_exact"]


def test_profile_columns_nulls_and_ranges(spark):
    from gofaiss_spark.functions.sketch import profile_columns

    df = spark.createDataFrame(
        [(1, None), (2, 5.0), (None, 7.5)], "a int, b double"
    )
    rows = {r["column_name"]: r for r in profile_columns(df, ["a", "b"]).collect()}
    assert rows["a"]["n_rows"] == 3 and rows["a"]["n_null"] == 1
    assert rows["a"]["min_value"] == "1" and rows["a"]["max_value"] == "2"
    assert rows["b"]["n_null"] == 1
    assert rows["b"]["min_value"] == "5.0" and rows["b"]["max_value"] == "7.5"
