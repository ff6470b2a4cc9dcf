"""Driver-contract oracle check (the verify-skill recipe) with query
filtering: compares each declared query's rows/schema against its
oracle_sql() on DuckDB with the driver's float normalization.

Usage: python tools/verify_oracle.py [--sf /root/testdata/sf0.01]
       [--only a,b,c] [--master local[8]]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    ap.add_argument("--master", default="local[8]")
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master(args.master).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as m

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    def nc(v):
        if isinstance(v, float):
            return "nan" if math.isnan(v) else f"{v+0.0:.9g}"
        return str(v)

    qs, osql = m.queries(), m.oracle_sql()
    names = sorted(qs)
    if args.only:
        names = [n for n in args.only.split(",") if n]
    bad = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            scols = sdf.columns
            idx = sorted(range(len(scols)), key=lambda i: scols[i])
            sr = sorted(
                tuple(nc(r[i]) for i in idx)
                for r in [tuple(x) for x in sdf.collect()]
            )
            cur = con.execute(osql[name])
            dcols = [d[0] for d in cur.description]
            didx = sorted(range(len(dcols)), key=lambda i: dcols[i])
            dr = sorted(tuple(nc(r[i]) for i in didx) for r in cur.fetchall())
            ok = sorted(scols) == sorted(dcols) and sr == dr
            print(
                f"{name}: rows={len(sr)}/{len(dr)} MATCH={ok} "
                f"({time.time()-t0:.1f}s)",
                flush=True,
            )
            if not ok:
                bad.append(name)
        except Exception as e:
            print(f"{name}: ERROR {type(e).__name__}: {e}", flush=True)
            bad.append(name)
    print("BAD:", bad, flush=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
