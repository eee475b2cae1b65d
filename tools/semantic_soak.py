"""Semantic-store soak at the 100x decade (the .soak/sf10 embeddings:
200k x 64d): first-increment centroid fit, steady-state increments,
maintain stats/compact, ivf_balance, retrain, post-retrain increment.

Run from the repo root:

    python tools/semantic_soak.py [sf10|sf1] [float64|float32|both]

``both`` runs the full lifecycle once per storage dtype on the SAME
data and prints the byte/time deltas plus a decision-identity check —
the r9 float32-storage measurement. Increments run with
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


def lifecycle(spark, emb, n_batches: int, dtype: str) -> dict:
    path = tempfile.mkdtemp() + f"/vs_{dtype}"
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
        n_acc = res.accepted.count()
        dt = time.time() - t0
        inc_times.append(dt)
        accepted_per_batch.append(n_acc)
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
    post_acc = res.accepted.count()
    post_s = time.time() - t0
    print(
        f"[{dtype}] post-retrain increment: {post_s:.2f}s accepted {post_acc}",
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
    if dtype == "both":
        a = lifecycle(spark, emb, n_batches, "float64")
        b = lifecycle(spark, emb, n_batches, "float32")
        same = a["accepted"] == b["accepted"]
        print(
            "compare: bytes %d -> %d (%.2fx), inc_total %.2fs -> %.2fs, "
            "retrain %.2fs -> %.2fs, decisions_identical=%s"
            % (
                a["bytes"], b["bytes"], a["bytes"] / max(1, b["bytes"]),
                a["inc_total_s"], b["inc_total_s"],
                a["retrain_s"], b["retrain_s"], same,
            ),
            flush=True,
        )
    else:
        lifecycle(spark, emb, n_batches, dtype)
    spark.stop()


if __name__ == "__main__":
    main()
