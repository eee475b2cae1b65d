#!/usr/bin/env python
"""Synthesize an sf1-scale soak dataset (10x sf0.1) under .soak/sf1.

The driver testdata stops at sf0.1; the soak run needs one decade more to
surface memory/plan problems the 2x bar can't. Scaling is replication
with structure-preserving perturbation so operator COST scales while
operator SEMANTICS don't degenerate:

- fixed-cardinality dims (region, nation) stay as-is (TPC-H scaling);
- fact/dim keys get a per-copy offset so FK integrity holds and key
  spaces stay disjoint;
- document text goes through a per-copy alphabet rotation (translate) —
  changes every shingle, so copies are NOT near-duplicates of each other
  and pair outputs stay linear in corpus size;
- embeddings rotate their dimensions per copy — norms preserved,
  neighbors changed, so ANN outputs stay top-k-sized.

Beyond 26 copies (the sf10 decade: --copies 100) plain alphabet
rotation repeats and copies in the same rotation class would be EXACT
cross-copy duplicates — pair outputs would explode quadratically for a
spurious reason. So the text perturbation is a per-copy alphabet
PERMUTATION (rotation composed with powers of a fixed mixing
permutation), distinct for every copy, and embeddings compose their
dimension rotation with a per-copy sign-flip prefix (norms preserved)
once the rotation alone would repeat.

Usage: python tools/make_soak_sf1.py [--copies 10] [--out .soak/sf1]
       python tools/make_soak_sf1.py --copies 100 --out .soak/sf10
       python tools/make_soak_sf1.py --copies 10 --skew --out .soak/skew1

``--skew`` (r6, VERDICT r5 #1) builds the SKEW-STRESS decade: uniform
replication measures scaling, but real 100 TB corpora have Zipf-hot FK
keys and boilerplate-template document clusters. With the flag:

- ``orders.o_custkey`` and ``events.user_id`` are redrawn from a
  Zipf(s=1.2)-tailed distribution (deterministic inverse-CDF on
  xxhash64; Pareto tail P(rank ≥ r) = r^(1-s), ranks past the keyspace
  fall back uniform) over the COPY-0 keyspace — the hottest customer
  owns ~13% of all orders, the top 10 ~38%. FK integrity holds (every
  drawn key exists).
- 5% of documents (doc_id % 20 == 0) become one boilerplate TEMPLATE
  plus a per-doc unique suffix: near-duplicates (not exact), so
  MinHash/SimHash banding sees one giant candidate cluster — the case
  the ``max_bucket`` skew guards exist for.
"""

from __future__ import annotations

import argparse
import os
import string
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"

KEY_OFFSETS = {
    # table -> {column: keyspace} ; offset = copy * 10 * max(keyspace)
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "customer"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}


TEMPLATE = (
    "terms of service please read these terms carefully before using the "
    "site your access to and use of the service is conditioned on your "
    "acceptance of and compliance with these terms these terms apply to "
    "all visitors users and others who access or use the service by "
    "accessing or using the service you agree to be bound by these terms "
    "if you disagree with any part of the terms then you may not access "
    "the service the content on this website is provided for general "
    "information only and is subject to change without notice"
)


def zipf_key(col, n_keys: int, s: float = 1.2, seed: int = 0):
    """Deterministic Zipf(s)-tailed key draw in [0, n_keys): inverse-CDF
    of the Pareto approximation (P(rank >= r) = r^(1-s)) on a uniform
    hash of ``col``; ranks past the keyspace fall back to a uniform
    draw so no clamp-key hotspot appears at the boundary."""
    u = (F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(999_983)).cast("double") + 1.0) / 999_984.0
    rank = (F.floor(F.pow(u, F.lit(-1.0 / (s - 1.0)))) - 1).cast("bigint")
    fallback = F.pmod(F.xxhash64(col, F.lit(seed + 1)), F.lit(n_keys)).cast("bigint")
    return F.when(rank < n_keys, rank).otherwise(fallback)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--out", default=".soak/sf1")
    ap.add_argument("--skew", action="store_true",
                    help="Zipf-hot FK keys + 5%% template docs (see module doc)")
    ap.add_argument("--zipf-s", type=float, default=1.2,
                    help="Zipf exponent for --skew: 1.2 gives a ~13%% hot key, "
                         "2.0 a ~50%% hot key (the null/default-FK regime, e.g. "
                         "guest-checkout customer 0)")
    args = ap.parse_args()

    from xdump_spark.session import get_spark

    spark = get_spark("make_soak", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    # Layout-agnostic pass-through for events.ts: nanosAsLong surfaces an
    # int64-ns column as long (old layout) and is a no-op for timestamp[us]
    # (current layout). Either way the perturbation below never touches ts,
    # so the soak output preserves the source layout and read_events'
    # adaptive branches handle it.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    os.makedirs(args.out, exist_ok=True)
    tables = {}
    for name in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        tables[name] = spark.read.parquet(f"{SRC}/{name}.parquet")

    # keyspace strides: one decade above the source max keeps copies disjoint
    strides = {}
    for space, (tbl, col) in {
        "customer": ("customer", "c_custkey"),
        "supplier": ("supplier", "s_suppkey"),
        "part": ("part", "p_partkey"),
        "orders": ("orders", "o_orderkey"),
        "events": ("events", "event_id"),
        "documents": ("documents", "doc_id"),
        "embeddings": ("embeddings", "vec_id"),
    }.items():
        strides[space] = 10 * int(tables[tbl].agg(F.max(col)).first()[0])

    alpha = string.ascii_lowercase
    # fixed mixing permutation (a 26-cycle written as an image string):
    # perm_for(i) = mix^(i//26) ∘ rotate(i%26) — distinct for every copy,
    # so no two copies share a text character mapping and cross-copy
    # shingle overlap stays incidental (copies are NOT near-duplicates).
    mix = "qwertyuiopasdfghjklzxcvbnm"

    def perm_for(i: int) -> str:
        p = alpha[i % 26 :] + alpha[: i % 26]
        for _ in range(i // 26):
            p = "".join(mix[alpha.index(ch)] for ch in p)
        return p

    for name, df in tables.items():
        out_path = os.path.join(args.out, f"{name}.parquet")
        if name in ("region", "nation"):
            df.write.mode("overwrite").parquet(out_path)
            print(f"{name}: copied as-is")
            continue
        copies = []
        for i in range(args.copies):
            c = df
            for col, space in KEY_OFFSETS[name].items():
                c = c.withColumn(col, F.col(col) + F.lit(i * strides[space]))
            if name == "documents" and i > 0:
                rot = perm_for(i)
                c = c.withColumn(
                    "text", F.translate(F.col("text"), alpha + alpha.upper(),
                                        rot + rot.upper())
                )
            if name == "embeddings" and i > 0:
                dim = len(df.select("embedding").first()[0])
                k = i % dim or 1
                c = c.withColumn(
                    "embedding",
                    F.concat(
                        F.slice(F.col("embedding"), k + 1, dim - k),
                        F.slice(F.col("embedding"), 1, k),
                    ),
                )
                if i >= dim:
                    # rotation alone repeats every `dim` copies; negate a
                    # per-copy prefix (norm-preserving) so vector SETS stay
                    # distinct across copies and near-dup output stays
                    # linear in corpus size
                    n_neg = (i // dim) % dim + 1
                    c = c.withColumn(
                        "embedding",
                        F.transform(
                            F.col("embedding"),
                            lambda x, idx: F.when(idx < F.lit(n_neg), -x).otherwise(x),
                        ),
                    )
            copies.append(c)
        merged = copies[0]
        for c in copies[1:]:
            merged = merged.unionByName(c)
        if args.skew:
            # applied AFTER the copy merge: drawn keys land in the COPY-0
            # keyspace (guaranteed to exist), the template is byte-
            # identical across copies (the per-copy alphabet permutation
            # must not mangle it), and the unique suffix keeps template
            # docs near- rather than exact duplicates.
            if name == "orders":
                n_cust = int(tables["customer"].agg(F.max("c_custkey")).first()[0]) + 1
                merged = merged.withColumn(
                    "o_custkey",
                    zipf_key(F.col("o_orderkey"), n_cust, s=args.zipf_s, seed=11),
                )
            if name == "events":
                n_users = int(tables["events"].agg(F.max("user_id")).first()[0]) + 1
                merged = merged.withColumn(
                    "user_id",
                    zipf_key(F.col("event_id"), n_users, s=args.zipf_s, seed=23),
                )
            if name == "documents":
                merged = merged.withColumn(
                    "text",
                    F.when(
                        F.col("doc_id") % 20 == 0,
                        F.concat(F.lit(TEMPLATE + " u"), F.col("doc_id").cast("string")),
                    ).otherwise(F.col("text")),
                )
        merged.write.mode("overwrite").parquet(out_path)
        print(f"{name}: {args.copies}x{' +skew' if args.skew else ''} -> {out_path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
