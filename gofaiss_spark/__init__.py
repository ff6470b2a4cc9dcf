"""gofaiss_spark — a PySpark-native vector/analytics engine.

A from-scratch rebuild of the capabilities of tahcohcat/gofaiss
(reference at /root/reference/, snapshot 2025-10-17) on idiomatic
PySpark: vectors, centroids, PQ codes and search results are
DataFrames; training is MLlib KMeans / groupBy().agg(); search is
broadcast-join + per-query top-k; indexes persist as partitioned
Parquet with a ``_meta.json`` sidecar.

Nothing in this package is a translation of the reference's Go code —
the reference defines WHAT to compute (SURVEY.md §2); the HOW is
DataFrame/SQL plans chosen for 1000-executor / 100 TB scale.
"""

from gofaiss_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
