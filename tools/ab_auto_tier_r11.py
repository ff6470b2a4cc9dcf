"""Round-11 verdict item 1: single-window interleaved façade+pool A/B.

The r10 direct measurement put the DEFAULT api.serve/search_np path at
9,688 QPS clean-window = 0.40x the reference's in-RAM HNSW (24,086 —
README.md:122 / benchmark_results_100k.json:28), below the >=0.5x
gate (12,043), while the hand-built LocalServerPool row reached
14,122-16,434 on the same fixture in OTHER windows. Hypothesis to
adjudicate: the deficit is window spread on the pool row itself, not
façade overhead. Protocol: one window holds BOTH arms, interleaved,
with bracketing sentinel probes on EACH arm; success = a clean window
where façade >= 12,043 AND façade/pool >= 0.95. If the POOL itself
cannot reach 12,043 in any clean window across the attempt budget,
the script records the pool's measured clean ceiling instead — the
renegotiated-gate evidence SCALE.md needs.

Fixture = bench.py's clustered block verbatim: mixture-of-100-
Gaussians (sigma=0.05), n=100k, dim=128, routed HNSW m=16 efc=100
efS=50, nprobe=4, 10k query batch.
"""

from __future__ import annotations

import datetime
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SENTINEL_REF = 0.062
SENTINEL_GEMM_REF = 0.085
GOAL_QPS = 24086 * 0.5
K = 10
MAX_ATTEMPTS = int(os.environ.get("AB_MAX_ATTEMPTS", "14"))
CLEAN = 1.5


def _fma() -> float:
    best = float("inf")
    for _ in range(3):
        x = np.full(1_000_000, 1.000001, dtype=np.float64)
        t0 = time.monotonic()
        for _ in range(100):
            np.multiply(x, 1.0000001, out=x)
            np.add(x, 1e-9, out=x)
        best = min(best, time.monotonic() - t0)
    return best


_G = np.random.default_rng(0)
_GA = _G.standard_normal((4096, 4096), dtype=np.float32)
_GB = _G.standard_normal((4096, 4096), dtype=np.float32)


def _gemm() -> float:
    _GA @ _GB  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        _GA @ _GB
        best = min(best, time.monotonic() - t0)
    return best


def probe() -> dict:
    f, g = _fma(), _gemm()
    return {
        "fma1_sec": round(f, 4),
        "gemm32_sec": round(g, 4),
        "ratio": round(max(f / SENTINEL_REF, g / SENTINEL_GEMM_REF), 2),
    }


def main() -> None:
    from pyspark.sql import SparkSession

    from gofaiss_spark import api
    from gofaiss_spark.operators.hnsw import build_hnsw_routed
    from gofaiss_spark.operators.local_serve import (
        LocalServerPool,
        hnsw_routed_to_local,
        to_local,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from gofaiss_spark.session import get_spark

    spark = get_spark("gofaiss_ab_r11", cpus=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    import pandas as pd

    n, dim, n_cl = 100_000, 128, 100
    rng = np.random.default_rng(42)
    centers = rng.random((n_cl, dim), dtype=np.float32)
    cl = rng.integers(0, n_cl, size=n)
    cdata = centers[cl] + rng.normal(0, 0.05, (n, dim)).astype(np.float32)
    cvec = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                      "vec": list(cdata)}),
        schema="id long, vec array<float>",
    ).cache()
    cvec.count()
    # bench.py consumes 1k-query draws before the 10k draw; replicate
    # the exact cq10k is unnecessary — truth is recomputed here
    cq10k = cdata[rng.integers(0, n, size=10_000)] \
        + rng.normal(0, 0.01, (10_000, dim)).astype(np.float32)

    t0 = time.monotonic()
    brt = build_hnsw_routed(cvec, nlist=n_cl, m=16, ef_construction=100)
    build_sec = round(time.monotonic() - t0, 4)
    brt.set_ef_search(50)

    cflat = to_local(cvec)
    truth, _ = cflat.search(cq10k, k=K)
    tsets = [set(t) for t in truth]

    # pool arm: the hand-built LocalServerPool over the localized graphs
    hlocal = hnsw_routed_to_local(brt, ef_search=50)
    hpool = LocalServerPool(hlocal)
    hpool.search(cq10k[:1024], k=K, nprobe=4)  # spawn + warm

    # façade arm: DEFAULT api path
    asrv = api.serve(brt)
    assert asrv.tier == "local", asrv.tier
    asrv.search_np(cq10k[:1024], k=K, params={"nprobe": 4})  # spawn + warm

    def run_arm(which: str) -> dict:
        best, runs = float("inf"), []
        for _ in range(3):
            t0 = time.monotonic()
            if which == "facade":
                ids, _ = asrv.search_np(cq10k, k=K, params={"nprobe": 4})
            else:
                ids, _ = hpool.search(cq10k, k=K, nprobe=4)
            runs.append(round(time.monotonic() - t0, 4))
            best = min(best, runs[-1])
        rec = float(np.mean(
            [len(set(ids[i]) & tsets[i]) / K for i in range(len(cq10k))]))
        return {
            "search_sec": round(best, 4),
            "search_sec_range": [min(runs), max(runs)],
            "qps_batch": round(len(cq10k) / best, 1),
            "recall": round(rec, 4),
        }

    attempts = []
    success = None
    backoff = 10.0
    for i in range(MAX_ATTEMPTS):
        before = probe()
        order = ("facade", "pool") if i % 2 == 0 else ("pool", "facade")
        arms = {w: run_arm(w) for w in order}
        after = probe()
        clean = before["ratio"] <= CLEAN and after["ratio"] <= CLEAN
        rec = {
            "attempt": i, "order": list(order),
            "sentinel_before": before, "sentinel_after": after,
            "window": "clean" if clean else "throttled",
            "facade": arms["facade"], "pool": arms["pool"],
            "facade_over_pool": round(
                arms["facade"]["qps_batch"] / arms["pool"]["qps_batch"], 3),
        }
        attempts.append(rec)
        print(json.dumps(rec), flush=True)
        if clean:
            if (arms["facade"]["qps_batch"] >= GOAL_QPS
                    and rec["facade_over_pool"] >= 0.95):
                success = rec
                break
        if not clean:
            time.sleep(min(backoff, 240.0))
            backoff *= 1.8

    clean_attempts = [a for a in attempts if a["window"] == "clean"]
    best_clean = max(
        clean_attempts, key=lambda a: a["facade"]["qps_batch"], default=None)
    pool_ceiling = max(
        (a["pool"]["qps_batch"] for a in clean_attempts), default=None)
    out = {
        "ts": datetime.datetime.now(datetime.timezone.utc).strftime(
            "%Y-%m-%dT%H:%M:%SZ"),
        "fixture": (
            "bench.py clustered 100k (mixture-of-100-Gaussians), routed "
            "HNSW m=16 efc=100 efS=50, nprobe=4, 10k batch; INTERLEAVED "
            "facade (api.serve/search_np) + hand-built LocalServerPool "
            "arms, alternating order, bracketing probes on the pair"),
        "build_sec": build_sec,
        "goal": (
            ">= 0.5x reference in-RAM HNSW 24086 QPS => facade >= 12043 "
            "AND facade/pool >= 0.95 in ONE clean window"),
        "attempts": attempts,
        "n_clean_windows": len(clean_attempts),
        "best_clean_window": best_clean,
        "pool_clean_ceiling_qps": pool_ceiling,
        "goal_met": success is not None,
    }
    path = os.path.join(REPO, "BENCH_AB.json")
    with open(path) as f:
        ab = json.load(f)
    ab["auto_tier_facade_pool_r11"] = out
    with open(path, "w") as f:
        json.dump(ab, f, indent=1)
    print("WROTE auto_tier_facade_pool_r11 goal_met=", out["goal_met"],
          flush=True)
    hpool.close()
    asrv.close()
    spark.stop()


if __name__ == "__main__":
    main()
