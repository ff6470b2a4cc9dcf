"""Per-query measurement harness for the optimization rounds.

Times every declared query at $SPARK_GRAFT_SF_DIR with the SAME
session factory bench.py uses, and captures .explain("formatted")
for each into --plans-dir. Two timings per query:

- construct_sec: building the DataFrame (includes any eager driver
  work a query does — kmeans fits, collects, artifact writes).
- count_sec: the bench.py timed action (df.count()).
- noop_sec: a second run through the noop sink (guide §1.4) on a
  freshly constructed DataFrame, so compute is measured with every
  column materialized. Queries whose construction is the dominant
  cost show construct >> count.

Usage: python tools/measure_queries.py [--out out.json]
       [--plans-dir plans/r12] [--suffix _before] [--only a,b,c]
       [--skip-noop]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/measure_queries.json")
    ap.add_argument("--plans-dir", default="")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--only", default="")
    ap.add_argument("--skip", default="")
    ap.add_argument("--skip-noop", action="store_true")
    args = ap.parse_args()

    from gofaiss_spark.session import get_spark

    spark = get_spark("gofaiss_spark_measure", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qmap = entry_mod.queries()
    names = [n for n in sorted(qmap)]
    if args.only:
        names = [n for n in args.only.split(",") if n]
    if args.skip:
        skip = set(args.skip.split(","))
        names = [n for n in names if n not in skip]

    if args.plans_dir:
        os.makedirs(args.plans_dir, exist_ok=True)

    results: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"measure:{name}")
        rec: dict[str, object] = {}
        try:
            t0 = time.monotonic()
            df = qmap[name](spark, SF_DIR)
            rec["construct_sec"] = round(time.monotonic() - t0, 4)
            if args.plans_dir:
                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                with open(
                    os.path.join(args.plans_dir, f"{name}{args.suffix}.txt"), "w"
                ) as f:
                    f.write(buf.getvalue())
            t0 = time.monotonic()
            n = df.count()
            rec["count_sec"] = round(time.monotonic() - t0, 4)
            rec["rows"] = n
            if not args.skip_noop:
                t0 = time.monotonic()
                df2 = qmap[name](spark, SF_DIR)
                df2.write.format("noop").mode("overwrite").save()
                rec["noop_sec"] = round(time.monotonic() - t0, 4)
        except Exception as e:  # keep going; record the failure
            rec["error"] = f"{type(e).__name__}: {e}"[:500]
        results[name] = rec
        print(
            f"{name}: construct={rec.get('construct_sec')} "
            f"count={rec.get('count_sec')} noop={rec.get('noop_sec')} "
            f"rows={rec.get('rows')} err={rec.get('error')}",
            flush=True,
        )
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    tot_c = sum(
        r.get("construct_sec", 0) + r.get("count_sec", 0) for r in results.values()
    )
    print(f"TOTAL construct+count: {tot_c:.1f}s over {len(results)} queries")


if __name__ == "__main__":
    main()
