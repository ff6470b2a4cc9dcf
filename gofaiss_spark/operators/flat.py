"""Flat index as an artifact: the base vectors DataFrame + metadata.

Reference: pkg/index/flat/flat.go. New validates dim>0 and metric ∈
{l2, cosine} (flat.go:23-35); Add precomputes norms for cosine and
rejects zero vectors (flat.go:38-58); Search is the brute-force plan
in operators/topk.py. We additionally allow metric="dot" at the
index level (the reference's flat index forbids it but its metric
layer supports it — documented deviation, SURVEY.md §1.2).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gofaiss_spark.functions.distance import norm, validate_metric
from gofaiss_spark.operators.topk import range_search, search_flat


@dataclass
class FlatIndex:
    metric: str
    dim: int
    vectors: DataFrame = field(repr=False)  # (id, vec[, norm])

    def search(self, queries: DataFrame, k: int = 10, method: str = "local") -> DataFrame:
        return search_flat(self.vectors, queries, k=k, metric=self.metric, method=method)

    def to_local(self):
        """Driver-colocated serving copy (operators/local_serve.py):
        collect once, answer query batches in-process — the
        single-node regime; bounded by driver RAM by contract."""
        from gofaiss_spark.operators.local_serve import to_local

        return to_local(self)

    def range_search(self, queries: DataFrame, threshold: float, max_results: int | None = None) -> DataFrame:
        return range_search(
            self.vectors, queries, threshold, metric=self.metric, max_results=max_results
        )

    def stats(self) -> dict:
        """Count/dim summary — the reference stubs this out
        (flat.go:151); ours is real. memory_mb follows the reference's
        logical-bytes convention (n·dim·4, float32)."""
        total = self.vectors.count()
        return {
            "index_type": "flat",
            "total_vectors": total,
            "dimension": self.dim,
            "metric": self.metric,
            "memory_mb": (total * self.dim * 4) / (1024 * 1024),
        }


def build_flat(
    vectors: DataFrame,
    metric: str = "l2",
    vec_col: str = "vec",
    id_col: str = "id",
    validate: bool = True,
) -> FlatIndex:
    """Ingest + validation (flat.go:38-58).

    Dimension uniformity is asserted distributed-side
    (ValidateDimension, pkg/vector/vector.go:37-44); for cosine, a
    ``norm`` column is materialized and zero vectors are rejected
    (flat.go:48-53)."""
    validate_metric(metric)
    df = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    first = df.select(F.size("vec").alias("d")).first()
    if first is None:
        raise ValueError("cannot build flat index from an empty DataFrame")
    dim = int(first["d"])
    if dim <= 0:
        raise ValueError(f"dimension must be positive, got {dim}")
    if validate:
        bad = df.filter(F.size("vec") != dim).count()
        if bad:
            raise ValueError(f"{bad} vectors do not match dimension {dim}")
    if metric == "cosine":
        df = df.withColumn("norm", norm("vec"))
        zeros = df.filter(F.col("norm") == 0.0).count()
        if zeros:
            raise ValueError(
                f"{zeros} zero vectors rejected for cosine metric (flat.go:50-52)"
            )
    return FlatIndex(metric=metric, dim=dim, vectors=df)
