#!/usr/bin/env python
"""One-pass soak timing: run the bench HEADLINE set (or --queries subset)
once at --sf-dir and print one JSON line. Unlike bench.py (two interleaved
passes, best-of), a soak decade is about SCALING SHAPE, not minimum
steady-state — one warm pass per query is enough and keeps sf10 runnable
inside a single timeout window.

Usage: python tools/soak_run.py --sf-dir .soak/sf10 [--queries a,b,c]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--queries", default=None, help="comma list; default bench HEADLINE")
    ap.add_argument("--warm-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    from bench import HEADLINE
    from xdump_spark.session import get_spark
    import xdump_spark.queries as Q

    names = args.queries.split(",") if args.queries else HEADLINE
    spark = get_spark("soak_run")
    qs = Q.queries()
    for df in Q._cat(spark, args.sf_dir).tables.values():
        df.schema
    timings = {}
    for name in names:
        # warm the plan shape at the small scale (codegen + UDF workers)
        qs[name](spark, args.warm_dir).write.format("noop").mode("overwrite").save()
        Q._closure_cache.clear()
        Q._ivf_cache.clear()
        t0 = time.time()
        qs[name](spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        print(f"{name}: {timings[name]}", file=sys.stderr)
    print(json.dumps({"sf_dir": args.sf_dir, "total": round(sum(timings.values()), 3), "queries": timings}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
