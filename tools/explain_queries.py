#!/usr/bin/env python
"""Dump formatted physical plans for headline queries.

Usage: python tools/explain_queries.py [query ...]   (default: bench HEADLINE)

Review aid for plan quality: look for PushedFilters/ReadSchema on scans
(pushdown + pruning), BroadcastHashJoin on dim joins, partial_ aggregates
before exchanges (map-side combine), and WholeStageCodegen spans. The
plan-shape properties that must not regress are pinned in
tests/test_plans.py; this tool is for eyeballing the rest.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    import __spark_entry__ as entry_mod
    from bench import HEADLINE
    from xdump_spark.session import get_spark

    spark = get_spark("explain_queries")
    qs = entry_mod.queries()
    names = sys.argv[1:] or [n for n in HEADLINE if n in qs]
    for name in names:
        if name not in qs:
            print(f"!! unknown query {name!r}", file=sys.stderr)
            continue
        print(f"\n{'=' * 72}\n{name}\n{'=' * 72}")
        try:
            qs[name](spark, sf_dir).explain(mode="formatted")
        except Exception as e:  # streaming twins etc. may not explain batch-side
            print(f"(explain failed: {type(e).__name__}: {e})")
    spark.stop()


if __name__ == "__main__":
    main()
