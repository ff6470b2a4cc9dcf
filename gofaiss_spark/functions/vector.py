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


def matrix_vector_multiply(
    matrix: DataFrame, vector, vec_col: str = "vec", id_col: str = "id"
) -> DataFrame:
    """result[i] = dot(matrix[i], v) (MatrixVectorMultiply,
    internal/math/simd.go:105-115).

    The matrix is a DataFrame of row vectors; ``vector`` is a small
    driver-side constant folded into the plan as an array literal, so
    the dot product is a pure JVM column expression (codegen, no UDF,
    no shuffle). Returns (id, value)."""
    from gofaiss_spark.functions.distance import dot_product

    lit = F.array(*[F.lit(float(x)) for x in vector])
    return matrix.select(
        F.col(id_col).alias("id"),
        dot_product(_as_col(vec_col).cast("array<double>"), lit).alias("value"),
    )


def pairwise_l2_distance(
    df: DataFrame,
    vec_col: str = "vec",
    id_col: str = "id",
    max_distance: float | None = None,
    num_hash_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """All-pairs L2 distances (PairwiseL2Distance,
    internal/math/simd.go:117-136) as rows (id_a, id_b, distance),
    id_a < id_b — the n×n matrix's upper triangle.

    With ``max_distance=None`` this is the exact O(n²) self-join:
    a bounded verify kernel for small inputs, mirroring the
    reference's dense matrix. The 100 TB path sets ``max_distance``:
    LSH buckets (seed-fixed random projections) prune the candidate
    pairs before the exact distance filter, so the shuffle carries
    narrow (id, bucket) rows instead of the full cross product —
    the same candidate-then-verify shape as
    operators/dedup.embedding_near_dup_pairs."""
    from gofaiss_spark.functions.distance import l2_distance

    base = df.select(F.col(id_col).alias("id"), _as_col(vec_col).alias("vec"))
    if max_distance is None:
        a = base.select(F.col("id").alias("id_a"), F.col("vec").alias("_va"))
        b = base.select(F.col("id").alias("id_b"), F.col("vec").alias("_vb"))
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    else:
        from gofaiss_spark.operators.lsh import build_lsh

        idx = build_lsh(
            base,
            metric="l2",
            num_hash_tables=num_hash_tables,
            bucket_length=max(2.0 * max_distance, 1e-6),
            seed=seed,
        )
        bk = idx.buckets.select("t", "bucket", "id")
        cands = (
            bk.select(F.col("id").alias("id_a"), "t", "bucket")
            .join(bk.select(F.col("id").alias("id_b"), "t", "bucket"), ["t", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .dropDuplicates(["id_a", "id_b"])
        )
        pairs = cands.join(
            base.select(F.col("id").alias("id_a"), F.col("vec").alias("_va")), "id_a"
        ).join(
            base.select(F.col("id").alias("id_b"), F.col("vec").alias("_vb")), "id_b"
        )
    out = pairs.select(
        "id_a",
        "id_b",
        l2_distance(
            F.col("_va").cast("array<double>"), F.col("_vb").cast("array<double>")
        ).alias("distance"),
    )
    if max_distance is not None:
        out = out.filter(F.col("distance") <= max_distance)
    return out


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
