"""Semantic-store soak at the 100x decade (the .soak/sf10 embeddings:
200k x 64d): first-increment centroid fit, steady-state increments,
maintain stats/compact, ivf_balance, retrain, post-retrain increment.

Run from the repo root:

    python tools/semantic_soak.py [sf10|sf1] \
        [float64|float32|pq|both|pq-both|pq16-both|pqguard-both]

``both`` runs the full lifecycle once per storage dtype on the SAME
data and prints the byte/time deltas plus a decision-identity check —
the r9 float32-storage measurement. ``pq-both`` compares float64
against the r10 product-quantized store the same way, additionally
reporting the accepted-SET delta per increment (pq decisions may
legitimately flip within the reconstruction margin of the threshold —
the number to document is how many). Increments run with
count_store=False (the r8-verdict item-8 posture: per-increment
full-store counts are reporting, not decisions; stats() reports once
at the end). Prints one timing line per step; results belong in
SCALE.md.
"""
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from xdump_spark.operators.incremental import (
    VectorStore,
    incremental_semantic_dedup,
)
from xdump_spark.operators.similarity import ivf_balance
from xdump_spark.session import get_spark


def lifecycle(spark, emb, n_batches: int, dtype: str,
              collect_ids: bool = False) -> dict:
    path = tempfile.mkdtemp() + f"/vs_{dtype}"
    # "pq16" = the higher-resolution codebook dial (m=16 → 4-dim
    # subspaces): half the compression, much smaller reconstruction
    # error — the knob that trades bytes for post-retrain scope churn.
    # "pqguard" = pq with exact_guard=True (r11): the global vh probe
    # that makes byte-identical re-sends reject ACROSS retrains.
    if dtype == "pq16":
        store = VectorStore(spark, path, dtype="pq", pq_m=16)
    elif dtype == "pqguard":
        store = VectorStore(spark, path, dtype="pq", exact_guard=True)
    else:
        store = VectorStore(spark, path, dtype=dtype)
    print(f"[{dtype}] store at {path}", flush=True)
    inc_times = []
    accepted_per_batch = []
    for i in range(n_batches):
        batch = emb.filter((F.col("vec_id") % n_batches) == i)
        t0 = time.time()
        res = incremental_semantic_dedup(
            batch, store, threshold=0.9, n_cells=64, max_cell=50_000,
            count_store=False,
        )
        if collect_ids:
            ids = frozenset(r["id"] for r in res.accepted.collect())
            n_acc = len(ids)
        else:
            ids = None
            n_acc = res.accepted.count()
        dt = time.time() - t0
        inc_times.append(dt)
        accepted_per_batch.append(ids if collect_ids else n_acc)
        print(f"[{dtype}] increment {i}: {dt:.2f}s accepted {n_acc}", flush=True)
    t0 = time.time()
    st = store.stats()
    print(f"[{dtype}] stats: {st} [{time.time() - t0:.2f}s]", flush=True)
    t0 = time.time()
    rp = store.compact()
    print(f"[{dtype}] compact: {rp} [{time.time() - t0:.2f}s]", flush=True)
    t0 = time.time()
    bal = ivf_balance(store.index())
    print(f"[{dtype}] balance: {bal} [{time.time() - t0:.2f}s]", flush=True)
    t0 = time.time()
    rt = store.retrain(128)
    retrain_s = time.time() - t0
    print(f"[{dtype}] retrain(128): {rt} [{retrain_s:.2f}s]", flush=True)
    # post-retrain increment: steady state under the new geometry (fresh
    # ids so nothing self-rejects by identity)
    batch = emb.filter((F.col("vec_id") % n_batches) == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    t0 = time.time()
    res = incremental_semantic_dedup(
        batch, store, threshold=0.9, count_store=False
    )
    if collect_ids:
        post_ids = frozenset(r["id"] for r in res.accepted.collect())
        post_acc = post_ids
    else:
        post_acc = res.accepted.count()
    post_s = time.time() - t0
    print(
        f"[{dtype}] post-retrain increment: {post_s:.2f}s accepted "
        f"{len(post_acc) if collect_ids else post_acc}",
        flush=True,
    )
    return {
        "dtype": dtype,
        "bytes": st["bytes"],
        "rows": st["rows"],
        "inc_total_s": round(sum(inc_times), 2),
        "inc_mean_s": round(sum(inc_times) / len(inc_times), 2),
        "retrain_s": round(retrain_s, 2),
        "post_s": round(post_s, 2),
        "accepted": accepted_per_batch + [post_acc],
    }


def main() -> None:
    soak = sys.argv[1] if len(sys.argv) > 1 else "sf10"
    dtype = sys.argv[2] if len(sys.argv) > 2 else "float64"
    spark = get_spark("semantic_soak")  # local[32] like bench
    emb = spark.read.parquet(f"/root/repo/.soak/{soak}/embeddings.parquet")
    emb = emb.select("vec_id", "embedding").localCheckpoint(eager=True)
    n = emb.count()
    n_batches = 10
    print(f"{n} vectors, {n_batches} increments", flush=True)
    if dtype in ("both", "pq-both", "pq16-both", "pqguard-both"):
        other = {"both": "float32", "pq-both": "pq",
                 "pq16-both": "pq16", "pqguard-both": "pqguard"}[dtype]
        a = lifecycle(spark, emb, n_batches, "float64", collect_ids=True)
        b = lifecycle(spark, emb, n_batches, other, collect_ids=True)
        same = a["accepted"] == b["accepted"]
        # per-increment accepted-set symmetric difference: the decision
        # delta the storage codec actually caused
        deltas = [
            len(x ^ y) for x, y in zip(a["accepted"], b["accepted"])
        ]
        union = sum(len(x | y) for x, y in zip(a["accepted"], b["accepted"]))
        print(
            "compare: bytes %d -> %d (%.2fx), inc_total %.2fs -> %.2fs, "
            "retrain %.2fs -> %.2fs, decisions_identical=%s, "
            "per-increment set deltas=%s, total delta %d of %d (%.4f%%)"
            % (
                a["bytes"], b["bytes"], a["bytes"] / max(1, b["bytes"]),
                a["inc_total_s"], b["inc_total_s"],
                a["retrain_s"], b["retrain_s"], same,
                deltas, sum(deltas), union,
                100.0 * sum(deltas) / max(1, union),
            ),
            flush=True,
        )
    else:
        lifecycle(spark, emb, n_batches, dtype)
    spark.stop()


if __name__ == "__main__":
    main()
