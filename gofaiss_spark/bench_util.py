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
    pkg/search/search.go:150-162; percentile fields mirror
    benchmark_comparison.go:408-457 — avg/p50/p95/p99 + QPS)."""
    for _ in range(warmup):
        fn()
    times = []
    for _ in range(runs):
        t0 = time.monotonic()
        fn()
        times.append(time.monotonic() - t0)
    times.sort()
    n = len(times)

    def pct(p: float) -> float:
        return times[min(n - 1, int(p * n))]

    avg = sum(times) / n
    return {
        "avg_sec": avg,
        "p50_sec": pct(0.50),
        "p95_sec": pct(0.95),
        "p99_sec": pct(0.99),
        "min_sec": times[0],
        "max_sec": times[-1],
        "qps": 1.0 / avg if avg > 0 else None,
        "runs": n,
    }


# Regression thresholds — benchmark/scripts/compare_baseline.py:12-18.
REGRESSION_THRESHOLDS = {
    "qps_drop_pct": 10.0,
    "recall_drop_pct": 2.0,
    "memory_grow_pct": 20.0,
    "build_time_grow_pct": 50.0,
}


def compare_to_baseline(
    current: dict, baseline: dict, thresholds: dict | None = None
) -> dict:
    """Regression check (compare_baseline.py parity): both inputs are
    per-index dicts with any of {qps, recall, memory_mb,
    build_time_ms}. Returns {regressions: [...], warnings: [...],
    ok: bool} — QPS/recall drops are regressions, memory/build-time
    growth are warnings, matching the reference's severity split."""
    t = {**REGRESSION_THRESHOLDS, **(thresholds or {})}
    regressions, warnings = [], []

    def pct_change(cur, base):
        return (cur - base) / base * 100.0 if base else 0.0

    for key, base in baseline.items():
        if key not in current:
            continue
        cur = current[key]
        for field, kind, thresh, direction in (
            ("qps", "regression", t["qps_drop_pct"], "drop"),
            ("recall", "regression", t["recall_drop_pct"], "drop"),
            ("memory_mb", "warning", t["memory_grow_pct"], "grow"),
            ("build_time_ms", "warning", t["build_time_grow_pct"], "grow"),
        ):
            if field in cur and field in base and base[field]:
                change = pct_change(cur[field], base[field])
                bad = change < -thresh if direction == "drop" else change > thresh
                if bad:
                    msg = {
                        "index": key,
                        "metric": field,
                        "baseline": base[field],
                        "current": cur[field],
                        "change_pct": round(change, 2),
                    }
                    (regressions if kind == "regression" else warnings).append(msg)
    return {"regressions": regressions, "warnings": warnings, "ok": not regressions}


def aggregate_runs(runs: list[dict]) -> dict:
    """Mean/stddev/95% CI across benchmark runs per numeric field
    (benchmark/scripts/aggregate_runs.py:18-31 parity)."""
    import math

    if not runs:
        return {}
    keys = [k for k, v in runs[0].items() if isinstance(v, (int, float))]
    out = {}
    for k in keys:
        vals = [float(r[k]) for r in runs if isinstance(r.get(k), (int, float))]
        n = len(vals)
        mean = sum(vals) / n
        var = sum((v - mean) ** 2 for v in vals) / (n - 1) if n > 1 else 0.0
        std = math.sqrt(var)
        ci = 1.96 * std / math.sqrt(n) if n > 1 else 0.0
        out[k] = {
            "mean": mean,
            "stddev": std,
            "ci95": [mean - ci, mean + ci],
            "n": n,
        }
    return out
