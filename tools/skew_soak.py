#!/usr/bin/env python
"""Skew-stress soak (r6, VERDICT r5 #1): measure the skew-mitigation
paths against their plain counterparts on ACTUALLY skewed data — they
were equivalence-tested in r1-r5 but never benchmarked under real hot
keys.

Input: a decade built by ``make_soak_sf1.py --skew`` (Zipf-hot
o_custkey/user_id and a 5% template document cluster; --zipf-s picks
the hot-key share — 1.2 → ~13%, 2.0 → ~50%, the null/default-FK
regime).

Experiments:

A. hot-FK semi-join strategies — orders ⋉ custkey-set, the decision
   ``compute_closure(salt_materialize=…)``/``pull_related(broadcast_keys
   =False)`` controls. Arms: broadcast (the ≤5M-key default), shuffled
   with AQE skew handling, shuffled with AQE skew handling OFF (what a
   streaming join or a non-AQE engine sees), salted left-semi (the
   mitigation). The >5M-key regime is forced by disabling
   autoBroadcastJoinThreshold — at 100 TB the key-set simply IS that big.
B. compute_closure end-to-end, salt_materialize None vs the per-table
   form {"orders": 8} (r6 — the measured r6 finding was that salting
   EVERY table's materialize join costs 7× on tables whose referenced
   key is unique; the dict scopes it to the hot table only), both at
   the default BROADCAST_KEY_LIMIT and with the limit forced to 0 (the
   big-key-set regime).
C. dedup skew guards — candidate-pair counts (the primary evidence:
   unguarded counts grow with cluster², past any wall-clock budget) and
   wall times for estimate-mode MinHash-LSH / xxhash64 SimHash with the
   default max_bucket=1000 guard vs max_bucket=None.
D. per-key top-k — plain row_number window vs skew.topk_per_key over
   the Zipf o_custkey (window functions get NO AQE skew protection).

Each timing is best-of-2 (the first run pays codegen/UDF warmup — the
r6 first cut timed exactly that and made the guarded minhash arm look
slower than unguarded). Prints one JSON line; numbers go to SCALE.md.

Usage: python tools/skew_soak.py [--sf-dir .soak/skew10] [--skip A,B]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F


def timed(label, fn, out: dict, repeats: int = 2):
    best, n = None, None
    for _ in range(repeats):
        t0 = time.time()
        n = fn()
        dt = round(time.time() - t0, 3)
        best = dt if best is None or dt < best else best
    out[label] = best
    print(f"{label}: {best}s (n={n})", file=sys.stderr)
    return n


def noop(df):
    df.write.format("noop").mode("overwrite").save()
    return -1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=".soak/skew10")
    ap.add_argument("--n-salt", type=int, default=16)
    ap.add_argument("--skip", default="",
                    help="comma list of experiments to skip (A,B,C,D)")
    ap.add_argument("--max-unguarded-candidates", type=int, default=200_000_000,
                    help="skip the unguarded minhash WALL measurement past this "
                         "many banded candidate pairs (counts still reported)")
    args = ap.parse_args()
    skip = set(args.skip.split(",")) if args.skip else set()

    from xdump_spark.operators import dedup as D
    from xdump_spark.operators.skew import salted_join, topk_per_key
    from xdump_spark.planner import closure as C
    from xdump_spark.queries import _cat
    from xdump_spark.session import get_spark

    spark = get_spark("skew_soak")
    cat = _cat(spark, args.sf_dir)
    orders = cat.tables["orders"]
    docs = cat.tables["documents"]
    results: dict = {"sf_dir": args.sf_dir}

    top = (
        orders.groupBy("o_custkey").count().orderBy(F.desc("count")).limit(3).collect()
    )
    n_orders = orders.count()
    results["n_orders"] = n_orders
    results["hot_custkey_share"] = round(top[0]["count"] / n_orders, 4)
    print(f"hot keys: {[(r.o_custkey, r['count']) for r in top]}", file=sys.stderr)

    # ---- A: semi-join strategy under a hot FK --------------------------
    if "A" not in skip:
        keys = cat.tables["customer"].select(F.col("c_custkey").alias("o_custkey"))
        a: dict = {}

        def arm(broadcast_thresh, skew_aqe, salted):
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcast_thresh)
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_aqe).lower())
            try:
                if salted:
                    df = salted_join(orders, keys, on="o_custkey",
                                     n_salt=args.n_salt, how="left_semi")
                else:
                    df = orders.join(keys, "o_custkey", "left_semi")
                return noop(df)
            finally:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
                spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

        timed("A_broadcast", lambda: arm("64m", True, False), a)
        timed("A_shuffle_aqe_skewjoin", lambda: arm("-1", True, False), a)
        timed("A_shuffle_no_skewjoin", lambda: arm("-1", False, False), a)
        timed("A_salted_no_skewjoin", lambda: arm("-1", False, True), a)
        results["A_semijoin"] = a

    # ---- B: compute_closure with/without per-table salt ----------------
    if "B" not in skip:
        b: dict = {}
        seed = orders.filter("o_orderkey % 2 = 0")

        def run_closure(salt, key_limit):
            old = C.BROADCAST_KEY_LIMIT
            C.BROADCAST_KEY_LIMIT = key_limit
            try:
                out = C.compute_closure(
                    cat, partial_tables={"orders": seed}, salt_materialize=salt
                )
                return sum(df.count() for df in out.values())
            finally:
                C.BROADCAST_KEY_LIMIT = old

        timed("B_plain_bcast_limit", lambda: run_closure(None, 5_000_000), b)
        timed("B_salt_orders_bcast_limit",
              lambda: run_closure({"orders": 8}, 5_000_000), b)
        timed("B_salt_all_bcast_limit", lambda: run_closure(8, 5_000_000), b)
        timed("B_plain_limit0", lambda: run_closure(None, 0), b)
        timed("B_salt_orders_limit0", lambda: run_closure({"orders": 8}, 0), b)
        results["B_closure"] = b

    # ---- C: dedup skew guards on the template cluster ------------------
    if "C" not in skip:
        from xdump_spark.operators.dedup import _norm_text, minhash_signatures

        normed = docs.select(
            F.col("doc_id").alias("id"), _norm_text(F.col("text")).alias("_norm")
        )
        sigs = minhash_signatures(normed, 64, 5)
        # mirror minhash_lsh_pairs' banding (r = 64/16 = 4)
        band_structs = [
            F.struct(
                F.lit(j).alias("band"),
                F.xxhash64(F.slice("sig", j * 4 + 1, 4)).alias("bucket"),
            )
            for j in range(16)
        ]
        bucket_sizes = (
            sigs.select(F.explode(F.array(*band_structs)).alias("bb"))
            .groupBy("bb.band", "bb.bucket")
            .agg(F.count("*").alias("n"))
        )
        cand = bucket_sizes.agg(
            F.sum(F.expr("n * (n - 1) / 2")).alias("all"),
            F.sum(
                F.expr("CASE WHEN n <= 1000 THEN n * (n - 1) / 2 ELSE 0 END")
            ).alias("guarded"),
        ).collect()[0]
        results["C_candidates_unguarded"] = int(cand["all"])
        results["C_candidates_guarded"] = int(cand["guarded"])
        print(
            f"C candidates: unguarded={int(cand['all'])} "
            f"guarded={int(cand['guarded'])}",
            file=sys.stderr,
        )

        c: dict = {}
        timed(
            "C_minhash_guarded",
            lambda: noop(D.minhash_lsh_pairs(docs, threshold=0.6, max_bucket=1000)),
            c,
        )
        timed("C_simhash_guarded", lambda: noop(D.simhash_pairs(docs, max_bucket=1000)), c)
        timed("C_simhash_unguarded", lambda: noop(D.simhash_pairs(docs, max_bucket=None)), c)
        if int(cand["all"]) <= args.max_unguarded_candidates:
            timed(
                "C_minhash_unguarded",
                lambda: noop(D.minhash_lsh_pairs(docs, threshold=0.6, max_bucket=None)),
                c,
            )
        else:
            c["C_minhash_unguarded"] = None
            print(
                "C_minhash_unguarded: SKIPPED "
                f"({int(cand['all'])} candidates > --max-unguarded-candidates)",
                file=sys.stderr,
            )
        results["C_dedup"] = c

    # ---- D: per-key top-k under the Zipf key ---------------------------
    if "D" not in skip:
        d: dict = {}
        from pyspark.sql import Window as W

        order = [F.desc("o_totalprice"), F.asc("o_orderkey")]
        w = W.partitionBy("o_custkey").orderBy(*order)
        proj = orders.select("o_custkey", "o_orderkey", "o_totalprice")
        timed(
            "D_window_plain",
            lambda: noop(
                proj.withColumn("rn", F.row_number().over(w)).filter("rn <= 3")
            ),
            d,
        )
        timed(
            "D_topk_salted",
            lambda: noop(
                topk_per_key(proj, "o_custkey", order, k=3, n_salt=args.n_salt)
            ),
            d,
        )
        results["D_topk"] = d

    print(json.dumps(results))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
