"""Reusable sentinel-bracketed interleaved A/B harness (round 12).

Folds the protocol the three r11 scripts (ab_auto_tier_r11.py,
ab_pool_headvr8.py, ab_regressions_r11.py) each re-implemented into
one library + CLI:

1. **Sentinel probe** — single-thread FMA loop + 32-thread GEMM, each
   against a committed clean-box reference time; the max ratio tags a
   window ``clean`` (<= CLEAN) or ``throttled``.
2. **Bracketed attempt** — [probe -> run every arm, alternating order
   per attempt -> probe]; an attempt is clean only when BOTH probes
   are.
3. **Exponential backoff** between throttled attempts (bounded), so a
   multi-minute throttle wave is outlasted instead of sampled.
4. **Adjudication** — helpers that classify a regression row as
   window-vs-code from the clean attempts (the compare_baseline -10%
   QPS gate), and write the named row into ``BENCH_AB.json``.

Arms may be in-process callables (same-window interleave, cancels
the throttle exactly) or subprocesses (for tree-vs-tree A/Bs where
the two arms import different code — e.g. HEAD vs a pristine r8
worktree via PYTHONPATH; the subprocess prints one ``ABRESULT {json}``
line, the harness parses it).

CLI experiments (``python tools/ab_harness.py <name>``):
- ``facade_pool``   — the per-round façade+pool interleaved pair the
  renegotiated auto-tier gate tracks (SCALE.md:319-322).
- ``pool_headvr8``  — pool-level HEAD vs r8-worktree subprocess arms
  (requires ``AB_R8_TREE`` pointing at a checkout of c0cdf9a).
- ``kernel_shape``  — in-process HEAD vs r8 `_search_graph_batch`
  at the routed-pool per-cell batch shapes (bit-equality asserted);
  requires ``AB_R8_HNSW`` pointing at r8's hnsw.py
  (``git show c0cdf9a:gofaiss_spark/operators/hnsw.py``).
"""

from __future__ import annotations

import datetime
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# Clean-box sentinel references (memory: sentinel ref 0.062s; gemm ref
# measured alongside it in the r10 canonical) and the tag threshold
# every r10/r11 artifact used.
SENTINEL_REF = 0.062
SENTINEL_GEMM_REF = 0.085
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


_GEMM_MATS: list | None = None


def _gemm() -> float:
    global _GEMM_MATS
    if _GEMM_MATS is None:
        g = np.random.default_rng(0)
        _GEMM_MATS = [g.standard_normal((4096, 4096), dtype=np.float32)
                      for _ in range(2)]
        _GEMM_MATS[0] @ _GEMM_MATS[1]  # warm BLAS pool
    a, b = _GEMM_MATS
    best = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        a @ b
        best = min(best, time.monotonic() - t0)
    return best


def probe() -> dict:
    """One sentinel probe: {fma1_sec, gemm32_sec, ratio}."""
    f, g = _fma(), _gemm()
    return {"fma1_sec": round(f, 4), "gemm32_sec": round(g, 4),
            "ratio": round(max(f / SENTINEL_REF, g / SENTINEL_GEMM_REF), 2)}


def is_clean(rec: dict, clean: float = CLEAN) -> bool:
    """Window classification for one bracketed attempt record."""
    return (rec["sentinel_before"]["ratio"] <= clean
            and rec["sentinel_after"]["ratio"] <= clean)


def run_interleaved(
    arms: dict,
    attempts: int = 6,
    stop_when=None,
    backoff0: float = 10.0,
    backoff_cap: float = 240.0,
    on_attempt=None,
) -> list[dict]:
    """The shared protocol: per attempt, bracket [probe -> every arm
    in alternating order -> probe]; back off exponentially after a
    throttled attempt; optionally stop early once ``stop_when(rec)``
    says a clean attempt answered the question.

    ``arms``: {name: zero-arg callable -> dict} — the callable runs
    the timed measurement and returns at least ``qps_batch``.
    Returns the attempt records (arm results keyed by arm name).
    """
    names = list(arms)
    out: list[dict] = []
    backoff = backoff0
    for i in range(attempts):
        order = names[i % len(names):] + names[:i % len(names)]
        before = probe()
        results = {a: arms[a]() for a in order}
        after = probe()
        rec = {
            "attempt": i, "order": order,
            "sentinel_before": before, "sentinel_after": after,
            **{a: results[a] for a in names},
        }
        rec["window"] = "clean" if is_clean(rec) else "throttled"
        out.append(rec)
        if on_attempt:
            on_attempt(rec)
        print(json.dumps(rec), flush=True)
        if rec["window"] == "clean":
            backoff = backoff0
            if stop_when and stop_when(rec):
                break
        else:
            time.sleep(min(backoff, backoff_cap))
            backoff *= 1.8
    return out


def subprocess_arm(argv: list[str], env: dict | None = None):
    """Wrap a subprocess as an arm: runs ``argv``, parses the single
    ``ABRESULT {json}`` line from its stdout. Use for tree-vs-tree
    A/Bs where the arms must import different code."""
    import subprocess

    def run() -> dict:
        full_env = dict(os.environ)
        if env:
            full_env.update(env)
        proc = subprocess.run(
            argv, env=full_env, capture_output=True, text=True,
            timeout=3600)
        for line in proc.stdout.splitlines():
            if line.startswith("ABRESULT "):
                return json.loads(line[len("ABRESULT "):])
        raise RuntimeError(
            f"no ABRESULT line from {argv}: rc={proc.returncode}\n"
            f"stdout tail: {proc.stdout[-2000:]}\n"
            f"stderr tail: {proc.stderr[-2000:]}")

    return run


def adjudicate_regression(attempts: list[dict], arm: str,
                          baseline_qps: float, regressed_qps: float,
                          gate: float = 0.9) -> dict:
    """compare_baseline's window-vs-code rule over clean attempts."""
    clean = [a for a in attempts if a["window"] == "clean"]
    best_clean = max((a[arm]["qps_batch"] for a in clean), default=None)
    if not clean:
        verdict = "inconclusive: no clean window in the attempt budget"
    elif best_clean >= gate * baseline_qps:
        verdict = (
            f"window: clean-bracketed {best_clean} QPS >= {gate}x "
            f"baseline ({baseline_qps}) on unchanged code — the "
            f"regressed number ({regressed_qps}) was a throttle-wave "
            f"artifact")
    else:
        verdict = (
            f"code-or-box: best clean-bracketed {best_clean} QPS < "
            f"{gate}x baseline ({baseline_qps}) — investigate")
    return {"baseline_qps": baseline_qps, "regressed_qps": regressed_qps,
            "best_clean_qps": best_clean, "verdict": verdict}


def write_ab_row(name: str, payload: dict) -> None:
    """Insert/overwrite one named row in BENCH_AB.json (timestamped)."""
    payload = {
        "ts": datetime.datetime.now(datetime.timezone.utc).strftime(
            "%Y-%m-%dT%H:%M:%SZ"),
        **payload,
    }
    path = os.path.join(REPO, "BENCH_AB.json")
    with open(path) as f:
        ab = json.load(f)
    ab[name] = payload
    with open(path, "w") as f:
        json.dump(ab, f, indent=1)
    print(f"WROTE {name}", flush=True)


# ---------------------------------------------------------------------
# Shared fixture: bench.py's clustered routed-HNSW serving block
# (mixture-of-100-Gaussians, 100k x 128, m=16 efc=100 efS=50, np=4).
# ---------------------------------------------------------------------

def _clustered_fixture(spark):
    import pandas as pd

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
    return cvec, cdata, cq10k


def exp_facade_pool(round_tag: str) -> None:
    """Per-round façade+pool interleaved pair (the renegotiated
    auto-tier gate's tracking clause, SCALE.md:319-322)."""
    from gofaiss_spark import api
    from gofaiss_spark.operators.hnsw import build_hnsw_routed
    from gofaiss_spark.operators.local_serve import (
        LocalServerPool, hnsw_routed_to_local, to_local,
    )
    from gofaiss_spark.session import get_spark

    K = 10
    spark = get_spark(f"ab_facade_pool_{round_tag}",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    cvec, cdata, cq10k = _clustered_fixture(spark)
    brt = build_hnsw_routed(cvec, nlist=100, m=16, ef_construction=100)
    brt.set_ef_search(50)
    cflat = to_local(cvec)
    truth, _ = cflat.search(cq10k, k=K)
    tsets = [set(t) for t in truth]

    hpool = LocalServerPool(hnsw_routed_to_local(brt, ef_search=50))
    hpool.search(cq10k[:1024], k=K, nprobe=4)
    asrv = api.serve(brt)
    assert asrv.tier == "local", asrv.tier
    asrv.search_np(cq10k[:1024], k=K, params={"nprobe": 4})

    def arm(which):
        def run():
            best, runs = float("inf"), []
            for _ in range(3):
                t0 = time.monotonic()
                if which == "facade":
                    ids, _ = asrv.search_np(cq10k, k=K,
                                            params={"nprobe": 4})
                else:
                    ids, _ = hpool.search(cq10k, k=K, nprobe=4)
                runs.append(round(time.monotonic() - t0, 4))
                best = min(best, runs[-1])
            rec = float(np.mean([len(set(ids[i]) & tsets[i]) / K
                                 for i in range(len(cq10k))]))
            return {"search_sec": round(best, 4),
                    "search_sec_range": [min(runs), max(runs)],
                    "qps_batch": round(len(cq10k) / best, 1),
                    "recall": round(rec, 4)}
        return run

    attempts = run_interleaved(
        {"facade": arm("facade"), "pool": arm("pool")},
        attempts=int(os.environ.get("AB_MAX_ATTEMPTS", "8")),
        stop_when=lambda r: (r["facade"]["qps_batch"]
                             / r["pool"]["qps_batch"]) >= 0.95,
    )
    clean = [a for a in attempts if a["window"] == "clean"]
    for a in attempts:
        a["facade_over_pool"] = round(
            a["facade"]["qps_batch"] / a["pool"]["qps_batch"], 3)
    write_ab_row(f"auto_tier_facade_pool_{round_tag}", {
        "fixture": ("bench.py clustered 100k routed-HNSW m=16 efc=100 "
                    "efS=50 np=4, 10k batch; interleaved facade "
                    "(api.serve/search_np) + hand-built pool arms"),
        "gate": "facade/pool >= 0.95 in one clean window "
                "(renegotiated r11 gate, SCALE.md:302-326)",
        "attempts": attempts,
        "n_clean_windows": len(clean),
        "pool_clean_ceiling_qps": max(
            (a["pool"]["qps_batch"] for a in clean), default=None),
        "facade_clean_best_qps": max(
            (a["facade"]["qps_batch"] for a in clean), default=None),
        "gate_met": any(a["facade_over_pool"] >= 0.95 for a in clean),
    })
    hpool.close()
    asrv.close()
    spark.stop()


def exp_pool_headvr8(round_tag: str) -> None:
    """Pool-level HEAD vs r8-worktree A/B: alternating subprocess
    arms (each builds the fixture, serves, prints ABRESULT)."""
    r8tree = os.environ.get("AB_R8_TREE")
    if not r8tree or not os.path.isdir(r8tree):
        raise SystemExit("set AB_R8_TREE to a checkout of c0cdf9a "
                         "(git worktree add /tmp/r8tree c0cdf9a)")
    arm_script = os.path.join(REPO, "tools", "ab_pool_arm.py")
    arms = {
        "head": subprocess_arm(
            [sys.executable, arm_script, "head"],
            env={"PYTHONPATH": REPO}),
        "r8": subprocess_arm(
            [sys.executable, arm_script, "r8"],
            env={"PYTHONPATH": r8tree}),
    }
    attempts = run_interleaved(
        arms, attempts=int(os.environ.get("AB_MAX_ATTEMPTS", "6")))
    clean = [a for a in attempts if a["window"] == "clean"]
    for a in attempts:
        a["head_over_r8"] = round(
            a["head"]["qps_batch"] / a["r8"]["qps_batch"], 3)
    write_ab_row(f"pool_head_vs_r8_{round_tag}", {
        "fixture": ("clustered 100k routed-HNSW pool @10k np=4; "
                    "alternating subprocess arms, PYTHONPATH HEAD vs "
                    f"r8 worktree ({r8tree})"),
        "attempts": attempts,
        "n_clean_windows": len(clean),
        "head_clean_best_qps": max(
            (a["head"]["qps_batch"] for a in clean), default=None),
        "r8_clean_best_qps": max(
            (a["r8"]["qps_batch"] for a in clean), default=None),
        "clean_ratios_head_over_r8": [
            a["head_over_r8"] for a in clean],
    })


def exp_kernel_shape(round_tag: str) -> None:
    """In-process HEAD vs r8 `_search_graph_batch` at the routed-pool
    per-cell shapes. Interleaved per call inside one process — the
    throttle cancels exactly — with bit-equality asserted between
    arms. This is the kernel-level adjudication of the r11
    pool_head_vs_r8 9-11%% gap (VERDICT r11 item 1)."""
    import importlib.util

    r8_hnsw = os.environ.get("AB_R8_HNSW", "/tmp/hnsw_r8.py")
    if not os.path.exists(r8_hnsw):
        raise SystemExit(
            "set AB_R8_HNSW to r8's hnsw.py (git show "
            "c0cdf9a:gofaiss_spark/operators/hnsw.py > /tmp/hnsw_r8.py)")
    from gofaiss_spark.operators import hnsw as head

    spec = importlib.util.spec_from_file_location("hnsw_r8", r8_hnsw)
    r8 = importlib.util.module_from_spec(spec)
    sys.modules["hnsw_r8"] = r8
    spec.loader.exec_module(r8)

    DIM, NCELL, PERCELL = 128, 100, 1000
    M, EFC, EFS, K = 16, 100, 50, 10
    rng = np.random.default_rng(42)
    centers = rng.random((NCELL, DIM), dtype=np.float32)

    from concurrent.futures import ProcessPoolExecutor
    t0 = time.monotonic()
    with ProcessPoolExecutor(max_workers=32) as ex:
        graphs = list(ex.map(
            _kernel_shape_build_cell,
            [(c, DIM, NCELL, PERCELL, M, EFC) for c in range(NCELL)]))
    build_sec = round(time.monotonic() - t0, 1)

    qrng = np.random.default_rng(7)
    rows = []
    for B in (8, 32, 128, 512, 1024):
        Q = centers[3] + qrng.normal(0, 0.01, (B, DIM)).astype(np.float32)
        qids = np.arange(B, dtype=np.int64)
        g = graphs[3]
        head._search_graph_batch(g, Q, qids, K, EFS)
        r8._search_graph_batch(g, Q, qids, K, EFS)
        best = {"head": float("inf"), "r8": float("inf")}
        eq = None
        reps = 14 if B >= 128 else 40
        res = {}
        for it in range(reps):
            for arm in (("head", "r8") if it % 2 == 0
                        else ("r8", "head")):
                mod = head if arm == "head" else r8
                t = time.monotonic()
                res[arm] = mod._search_graph_batch(g, Q, qids, K, EFS)
                best[arm] = min(best[arm], time.monotonic() - t)
            if eq is None:
                a = res["head"].sort_values(
                    ["query_id", "distance", "id"]).reset_index(drop=True)
                b = res["r8"].sort_values(
                    ["query_id", "distance", "id"]).reset_index(drop=True)
                eq = bool(
                    (a["id"].to_numpy() == b["id"].to_numpy()).all()
                    and (a["distance"].to_numpy()
                         == b["distance"].to_numpy()).all())
        rows.append({
            "batch": B, "reps": reps, "bit_equal": eq,
            "head_ms": round(best["head"] * 1e3, 2),
            "r8_ms": round(best["r8"] * 1e3, 2),
            "head_over_r8": round(best["head"] / best["r8"], 3),
        })
        print(json.dumps(rows[-1]), flush=True)
    write_ab_row(f"hnsw_kernel_shape_ab_{round_tag}", {
        "fixture": (f"{NCELL} driver-built cells x {PERCELL} nodes, "
                    f"dim={DIM}, m={M} efc={EFC} efS={EFS} k={K}; "
                    "min-of-reps per arm, arms interleaved per rep "
                    "in ONE process (throttle cancels exactly)"),
        "build_sec": build_sec,
        "rows": rows,
    })


def _kernel_shape_build_cell(args):
    c, dim, ncell, percell, m, efc = args
    from gofaiss_spark.operators.hnsw import _build_graph
    rng_c = np.random.default_rng(1000 + c)
    center = np.random.default_rng(42).random(
        (ncell, dim), dtype=np.float32)[c]
    data = center + rng_c.normal(
        0, 0.05, (percell, dim)).astype(np.float32)
    ids = np.arange(c * percell, (c + 1) * percell, dtype=np.int64)
    return _build_graph(ids, data, m, efc, "l2", seed=c)


EXPERIMENTS = {
    "facade_pool": exp_facade_pool,
    "pool_headvr8": exp_pool_headvr8,
    "kernel_shape": exp_kernel_shape,
}


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] not in EXPERIMENTS:
        raise SystemExit(
            f"usage: python tools/ab_harness.py "
            f"{{{','.join(EXPERIMENTS)}}} [round_tag]")
    tag = sys.argv[2] if len(sys.argv) > 2 else "r12"
    EXPERIMENTS[sys.argv[1]](tag)


if __name__ == "__main__":
    main()
