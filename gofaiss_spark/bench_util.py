"""Recall / latency metrics.

Reference: benchmark/benchmark_comparison.go:459-487 (Recall@K =
|result ∩ truth| / min(k, |truth|) per query, averaged) and
:408-457 (avg/p50/p95/p99 latency, QPS).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recall_at_k(results: DataFrame, truth: DataFrame, k: int) -> float:
    """Average Recall@K of ``results`` against exact ``truth``.

    Both inputs: (query_id, id, ...). A distributed join-count — no
    driver-side collection of result sets.
    """
    r = results.select("query_id", "id")
    t = truth.select("query_id", "id")
    hits = (
        r.join(t, ["query_id", "id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    truth_sizes = t.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_truth"))
    per_query = truth_sizes.join(hits, "query_id", "left").select(
        (
            F.coalesce(F.col("n_hits"), F.lit(0))
            / F.least(F.lit(k), F.col("n_truth"))
        ).alias("recall")
    )
    row = per_query.agg(F.avg("recall").alias("r")).collect()[0]
    return float(row["r"]) if row["r"] is not None else 0.0


def timed(fn, warmup: int = 1, runs: int = 3) -> dict:
    """Wall-clock timing around an action (SearchWithMetadata parity,
    pkg/search/search.go:150-162)."""
    for _ in range(warmup):
        fn()
    times = []
    for _ in range(runs):
        t0 = time.monotonic()
        fn()
        times.append(time.monotonic() - t0)
    times.sort()
    n = len(times)
    return {
        "avg_sec": sum(times) / n,
        "p50_sec": times[n // 2],
        "min_sec": times[0],
        "max_sec": times[-1],
        "runs": n,
    }
