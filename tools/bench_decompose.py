#!/usr/bin/env python
"""Decompose per-query wall time into BUILD / PLAN / EXECUTE (the r9
diagnostic, now a committed tool for the optimization rounds).

For each named query (default: bench HEADLINE + SCALE_TWINS):

* build   — the builder call ``qs[name](spark, sf_dir)``: Python
  DataFrame construction, py4j chatter, eager analysis, and any
  driver-coordinated protocol actions (KMeans fits, localCheckpoint
  materializations) the builder runs;
* plan    — ``df.queryExecution().executedPlan()`` resolution on the
  already-built frame;
* execute — the noop-sink write of a SECOND freshly built frame minus
  its own build+plan time (so JIT-warm execution is isolated).

Two passes; the MIN of each phase is printed (JSON to stdout, one line
per query) so a GC pause poisons at most one reading.

Usage: python tools/bench_decompose.py [--sf DIR] [--profile] [name ...]
  --profile additionally runs cProfile over the build phase and prints
  the top-20 cumulative entries (where the driver seconds live).
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd  # noqa: F401  (pandas_udf type-hint resolution)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    profile = "--profile" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
        args = [a for a in args if a != sf_dir]

    import __spark_entry__ as entry_mod
    from bench import HEADLINE, SCALE_TWINS
    from xdump_spark import queries as Q
    from xdump_spark.session import get_spark

    spark = get_spark("bench_decompose")
    qs = entry_mod.queries()
    twin_builders = {n: getattr(Q, n) for n in SCALE_TWINS}
    names = args or (list(HEADLINE) + list(SCALE_TWINS))

    # same warmup discipline as bench.py: session, catalog, arrow pool,
    # one warm run of each target at the smallest scale
    spark.range(1).count()
    for df in Q._cat(spark, sf_dir).tables.values():
        df.schema
    warm_dir = "/root/testdata/sf0.001"
    builders = {}
    for n in names:
        builders[n] = qs[n] if n in qs else twin_builders[n]
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for n, fn in builders.items():
            fn(spark, warm_dir).write.format("noop").mode("overwrite").save()

    for name, fn in builders.items():
        phases = {"build": [], "plan": [], "exec": []}
        for _ in range(2):
            Q._closure_cache.clear()
            Q._ivf_cache.clear()
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df._jdf.queryExecution().executedPlan()
            t2 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.time()
            phases["build"].append(t1 - t0)
            phases["plan"].append(t2 - t1)
            phases["exec"].append(t3 - t2)
        out = {
            "query": name,
            **{k: round(min(v), 3) for k, v in phases.items()},
            "total": round(sum(min(v) for v in phases.values()), 3),
        }
        print(json.dumps(out), flush=True)
        if profile:
            import cProfile
            import pstats

            Q._closure_cache.clear()
            Q._ivf_cache.clear()
            pr = cProfile.Profile()
            pr.enable()
            fn(spark, sf_dir)
            pr.disable()
            stats = pstats.Stats(pr, stream=sys.stderr)
            stats.sort_stats("cumulative").print_stats(20)
    spark.stop()


if __name__ == "__main__":
    main()
