"""Row-level content hash per declared query — the equality oracle
for optimization A/Bs at SFs the DuckDB driver check doesn't cover.

Normalizes exactly like the driver (columns sorted by name, floats
through %.9g, rows sorted) and emits {query: md5-of-rows}.

Usage: python tools/rowhash_queries.py --only a,b,c
       [--sf /root/testdata/sf0.1] [--out hashes.json]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--only", default="")
    ap.add_argument("--out", default="/tmp/rowhash.json")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from gofaiss_spark.session import get_spark

    spark = get_spark("gofaiss_rowhash", cpus=int(args.cpus))
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as m

    def nc(v):
        if isinstance(v, float):
            return "nan" if math.isnan(v) else f"{v+0.0:.9g}"
        return str(v)

    qs = m.queries()
    names = sorted(qs) if not args.only else [n for n in args.only.split(",") if n]
    out = {}
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            scols = sdf.columns
            idx = sorted(range(len(scols)), key=lambda i: scols[i])
            sr = sorted(
                "\x00".join(nc(r[i]) for i in idx)
                for r in [tuple(x) for x in sdf.collect()]
            )
            h = hashlib.md5(
                ("\x01".join(sorted(scols)) + "\x02" + "\x02".join(sr)).encode()
            ).hexdigest()
            out[name] = {"rows": len(sr), "hash": h}
            print(f"{name}: rows={len(sr)} hash={h} ({time.time()-t0:.1f}s)", flush=True)
        except Exception as e:
            out[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
            print(f"{name}: ERROR {e}", flush=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
