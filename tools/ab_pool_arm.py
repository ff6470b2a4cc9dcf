"""One arm of the HEAD-vs-r8 pool A/B: build the clustered routed-HNSW
fixture, serve via LocalServerPool (hand-built, same as the bench pool
row), print one ``ABRESULT {json}`` line. Driven by
``tools/ab_harness.py pool_headvr8``, which alternates PYTHONPATH
between the repo (HEAD) and an r8 worktree and brackets each pair
with its own sentinel probes. Self-contained (no harness import) so
it runs identically under BOTH trees' PYTHONPATH."""
import json
import os
import sys
import time

import numpy as np

SENTINEL_REF = 0.062
SENTINEL_GEMM_REF = 0.085
K = 10


def _fma():
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


def _gemm():
    _GA @ _GB
    best = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        _GA @ _GB
        best = min(best, time.monotonic() - t0)
    return best


def probe():
    f, g = _fma(), _gemm()
    return {"fma1_sec": round(f, 4), "gemm32_sec": round(g, 4),
            "ratio": round(max(f / SENTINEL_REF, g / SENTINEL_GEMM_REF), 2)}


def main():
    arm = sys.argv[1]  # "head" | "r8"
    import pandas as pd
    from gofaiss_spark.session import get_spark
    from gofaiss_spark.operators.hnsw import build_hnsw_routed
    from gofaiss_spark.operators.local_serve import (
        LocalServerPool, hnsw_routed_to_local,
    )

    spark = get_spark(f"ab_pool_{arm}", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    n, dim, n_cl = 100_000, 128, 100
    rng = np.random.default_rng(42)
    centers = rng.random((n_cl, dim), dtype=np.float32)
    cl = rng.integers(0, n_cl, size=n)
    cdata = centers[cl] + rng.normal(0, 0.05, (n, dim)).astype(np.float32)
    cvec = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                      "vec": list(cdata)}),
        schema="id long, vec array<float>").cache()
    cvec.count()
    cq10k = cdata[rng.integers(0, n, size=10_000)] \
        + rng.normal(0, 0.01, (10_000, dim)).astype(np.float32)

    brt = build_hnsw_routed(cvec, nlist=n_cl, m=16, ef_construction=100)
    hlocal = hnsw_routed_to_local(brt, ef_search=50)
    hpool = LocalServerPool(hlocal)
    hpool.search(cq10k[:1024], k=K, nprobe=4)  # spawn + warm

    before = probe()
    best, runs = float("inf"), []
    for _ in range(5):
        t0 = time.monotonic()
        hpool.search(cq10k, k=K, nprobe=4)
        runs.append(round(time.monotonic() - t0, 4))
        best = min(best, runs[-1])
    after = probe()
    print("ABRESULT " + json.dumps({
        "arm": arm, "gofaiss_path": os.path.dirname(os.path.dirname(
            os.path.abspath(sys.modules["gofaiss_spark"].__file__))),
        "sentinel_before": before, "sentinel_after": after,
        "search_sec_runs": runs, "best_sec": round(best, 4),
        "qps_batch": round(10_000 / best, 1),
    }), flush=True)
    hpool.close()
    spark.stop()


if __name__ == "__main__":
    main()
