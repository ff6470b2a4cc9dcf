"""Elementwise vector arithmetic + centroid aggregation.

Reference: pkg/vector/vector.go:54-131 (Add/Subtract/Scale/Normalize/
Centroid) and internal/math/simd.go:62-92. All are pure column
expressions — they stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gofaiss_spark.functions.distance import norm


def _as_col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def validate_dimension(df: DataFrame, dim: int, vec_col: str = "vec") -> DataFrame:
    """Ingest-time schema assertion (ValidateDimension parity,
    vector.go:37-44): raises if any row's vector length ≠ dim.
    Distributed count of violations — no collect of the data."""
    bad = df.filter(F.size(_as_col(vec_col)) != dim).count()
    if bad:
        raise ValueError(
            f"vector dimension mismatch: {bad} row(s) where size({vec_col}) != {dim}"
        )
    return df


def vector_add(a, b) -> Column:
    return F.zip_with(_as_col(a), _as_col(b), lambda x, y: x + y)


def vector_subtract(a, b) -> Column:
    """a − b; also the IVFPQ residual expression (ivfpq.go:139-147)."""
    return F.zip_with(_as_col(a), _as_col(b), lambda x, y: x - y)


def vector_scale(v, s) -> Column:
    s = F.lit(s) if isinstance(s, (int, float)) else _as_col(s)
    return F.transform(_as_col(v), lambda x: x * s)


def vector_normalize(v) -> Column:
    """v / ||v||; zero vector passes through unchanged
    (vector.go:93-108 returns the zero vector untouched)."""
    v = _as_col(v)
    n = norm(v)
    return F.when(n == 0.0, v).otherwise(F.transform(v, lambda x: x.cast("double") / n))


def vector_centroid(
    df: DataFrame, vec_col: str = "vec", group_cols: list[str] | None = None
) -> DataFrame:
    """Mean vector per group (vector.go:111-131; ivf.go:296-313).

    Scale shape: posexplode → groupBy(group, pos).avg → re-assemble
    ordered by pos. The explode multiplies rows by dim but the
    aggregation is map-side-combined by Catalyst, so the shuffle
    carries only (groups × dim) partial sums — safe at 100 TB.

    Returns ``group_cols + [centroid: array<double>, n: long]``.
    """
    group_cols = group_cols or []
    exploded = df.select(
        *group_cols, F.posexplode(vec_col).alias("pos", "component")
    )
    per_dim = exploded.groupBy(*group_cols, "pos").agg(
        F.avg("component").alias("mean_component"), F.count(F.lit(1)).alias("n")
    )
    assembled = (
        per_dim.groupBy(*group_cols)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "mean_component"))
            ).alias("pairs"),
            F.first("n").alias("n"),
        )
        .select(
            *group_cols,
            F.transform("pairs", lambda p: p["mean_component"]).alias("centroid"),
            "n",
        )
    )
    return assembled
