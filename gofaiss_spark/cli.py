"""CLI — build / search / bench.

Reference: cmd/cli/main.go. Its ``bench`` generates seeded vectors,
builds indexes, warms up 10 queries, times 100, prints QPS + stats
(main.go:17-59, :73-168); its ``build`` and ``search`` are stubs
("not fully implemented", main.go:170-180) — here they are real:
``build`` writes a Parquet index artifact from any parquet of
vectors, ``search`` loads one and answers a query batch.

Run: ``python -m gofaiss_spark <build|search|bench> ...`` (or via
``spark-submit`` on a cluster — the session builder only sets
master when none is configured).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def generate_random_vectors(
    spark: SparkSession, n: int, dim: int, seed: int = 42
) -> DataFrame:
    """GenerateRandom parity (pkg/vector/vector.go:23-34): n seeded
    uniform[0,1) vectors, IDs 0..n-1 — expressed as a distributed
    ``spark.range`` + per-dimension ``rand(seed)`` (bit-compat with
    Go's PRNG is out of scope; SURVEY.md §2.1)."""
    cols = F.array(*[F.rand(seed + j).cast("float") for j in range(dim)])
    return spark.range(n).select(F.col("id"), cols.alias("vec"))


def _parse_params(pairs: list[str]) -> dict:
    out: dict = {}
    for p in pairs:
        k, _, v = p.partition("=")
        try:
            out[k] = int(v)
        except ValueError:
            try:
                out[k] = float(v)
            except ValueError:
                out[k] = v
    return out


def cmd_build(args, spark: SparkSession) -> int:
    from gofaiss_spark.api import build_index, save, stats

    vectors = spark.read.parquet(args.input)
    if args.vec_col != "vec":
        vectors = vectors.withColumnRenamed(args.vec_col, "vec")
    if args.id_col != "id":
        vectors = vectors.withColumnRenamed(args.id_col, "id")
    t0 = time.monotonic()
    idx = build_index(
        vectors,
        index_type=args.index_type,
        metric=args.metric,
        params=_parse_params(args.param),
    )
    save(idx, args.output)
    print(
        json.dumps(
            {
                "action": "build",
                "index_type": args.index_type,
                "output": args.output,
                "build_sec": round(time.monotonic() - t0, 3),
                "stats": stats(idx),
            }
        )
    )
    return 0


def cmd_search(args, spark: SparkSession) -> int:
    from gofaiss_spark.api import load, search

    idx = load(spark, args.index)
    queries = spark.read.parquet(args.queries)
    if args.qvec_col != "qvec":
        queries = queries.withColumnRenamed(args.qvec_col, "qvec")
    if args.query_id_col != "query_id":
        queries = queries.withColumnRenamed(args.query_id_col, "query_id")
    params = _parse_params(args.param)
    if args.base:
        # original vectors for --param refine=N exact re-ranking
        # (PQ/IVFPQ artifacts store codes; the originals live in the lake)
        base = spark.read.parquet(args.base)
        if args.vec_col != "vec":
            base = base.withColumnRenamed(args.vec_col, "vec")
        if args.id_col != "id":
            base = base.withColumnRenamed(args.id_col, "id")
        params["base"] = base
    t0 = time.monotonic()
    res = search(idx, queries, k=args.k, params=params)
    if args.output:
        res.write.mode("overwrite").parquet(args.output)
        n = spark.read.parquet(args.output).count()
    else:
        rows = res.collect()
        n = len(rows)
        for r in rows[: args.show]:
            print(f"query={r.query_id} id={r.id} distance={r.distance:.6f}")
    elapsed = time.monotonic() - t0
    nq = queries.count()
    print(
        json.dumps(
            {
                "action": "search",
                "k": args.k,
                "n_queries": nq,
                "n_results": n,
                "elapsed_sec": round(elapsed, 4),
                "qps": round(nq / elapsed, 2) if elapsed > 0 else None,
            }
        )
    )
    return 0


def cmd_bench(args, spark: SparkSession) -> int:
    """Benchmark loop parity (cmd/cli/main.go:73-168): generate,
    build each index, warm up, run the timed query batch, print
    QPS/latency/recall per index — batch-native (the whole query set
    is one job; per-query latency is elapsed/n, matching how the
    reference's averages are consumed)."""
    from gofaiss_spark.api import build_index, cache_index, search, stats
    from gofaiss_spark.bench_util import recall_at_k
    from gofaiss_spark.operators.topk import search_flat

    vectors = generate_random_vectors(spark, args.n, args.dim, args.seed).cache()
    vectors.count()
    queries = (
        generate_random_vectors(spark, args.num_queries, args.dim, args.seed + 1)
        .withColumnRenamed("id", "query_id")
        .withColumnRenamed("vec", "qvec")
        .cache()
    )
    queries.count()
    truth = search_flat(vectors, queries, k=args.k).cache()
    truth.count()

    results = []
    for index_type in args.index_type:
        t0 = time.monotonic()
        # train on ≤5k vectors like the reference benchmark protocol
        # (benchmark_comparison.go:258-263 trains IVF/PQ/IVFPQ on 5k)
        params = (
            {"train_fraction": min(1.0, 5000.0 / args.n)}
            if index_type in ("ivf", "pq", "ivfpq", "ivfsq", "opq")
            else {}
        )
        idx = build_index(
            vectors, index_type=index_type, metric=args.metric, params=params
        )
        cache_index(idx)  # materialize the artifact — build ends here
        st = stats(idx)
        build_sec = time.monotonic() - t0
        # warmup (main.go:140-143)
        search(idx, queries.limit(10), k=args.k).count()
        t1 = time.monotonic()
        res = search(idx, queries, k=args.k).cache()
        res.count()
        query_sec = time.monotonic() - t1  # search only — recall is scored after
        recall = recall_at_k(res, truth, args.k)
        res.unpersist()
        results.append(
            {
                "index_type": index_type,
                "n_vectors": args.n,
                "dimension": args.dim,
                "build_time_ms": round(build_sec * 1000, 1),
                "avg_query_ms": round(query_sec * 1000 / args.num_queries, 4),
                "qps": round(args.num_queries / query_sec, 1),
                "recall_at_k": round(recall, 4),
                "k": args.k,
                "stats": st,
            }
        )
    print(json.dumps({"action": "bench", "results": results}))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="gofaiss_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build an index artifact from parquet vectors")
    b.add_argument("--input", required=True)
    b.add_argument("--output", required=True)
    b.add_argument("--index-type", default="flat")
    b.add_argument("--metric", default="l2")
    b.add_argument("--vec-col", default="vec")
    b.add_argument("--id-col", default="id")
    b.add_argument("--param", action="append", default=[], metavar="K=V")

    s = sub.add_parser("search", help="search a saved index artifact")
    s.add_argument("--index", required=True)
    s.add_argument("--queries", required=True)
    s.add_argument("--k", type=int, default=10)
    s.add_argument("--qvec-col", default="qvec")
    s.add_argument("--query-id-col", default="query_id")
    s.add_argument("--output", default=None)
    s.add_argument("--show", type=int, default=10)
    s.add_argument("--param", action="append", default=[], metavar="K=V")
    s.add_argument(
        "--base",
        default=None,
        help="parquet of original vectors; enables --param refine=N",
    )
    s.add_argument("--vec-col", default="vec")
    s.add_argument("--id-col", default="id")

    be = sub.add_parser("bench", help="generate-build-query benchmark")
    be.add_argument("--n", type=int, default=10000)
    be.add_argument("--dim", type=int, default=128)
    be.add_argument("--k", type=int, default=10)
    be.add_argument("--num-queries", type=int, default=100)
    be.add_argument("--seed", type=int, default=42)
    be.add_argument("--metric", default="l2")
    be.add_argument(
        "--index-type",
        action="append",
        default=None,
        help="repeatable; defaults to flat,ivf,pq,sq,ivfpq,lsh",
    )

    args = p.parse_args(argv)
    if args.cmd == "bench" and args.index_type is None:
        args.index_type = ["flat", "ivf", "pq", "sq", "ivfpq", "lsh"]

    from gofaiss_spark.session import get_spark

    spark = get_spark("gofaiss_spark_cli")
    try:
        return {"build": cmd_build, "search": cmd_search, "bench": cmd_bench}[
            args.cmd
        ](args, spark)
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
