"""Semantic-store soak at the 100x decade (the .soak/sf10 embeddings:
200k x 64d): first-increment centroid fit, steady-state increments,
maintain stats/compact, ivf_balance, retrain, post-retrain increment.

Run from the repo root: `python tools/semantic_soak.py [sf10|sf1]`.
Prints one timing line per step; results belong in SCALE.md.
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


def main() -> None:
    soak = sys.argv[1] if len(sys.argv) > 1 else "sf10"
    spark = get_spark("semantic_soak")  # local[32] like bench
    emb = spark.read.parquet(f"/root/repo/.soak/{soak}/embeddings.parquet")
    emb = emb.select("vec_id", "embedding").localCheckpoint(eager=True)
    n = emb.count()
    n_batches = 10
    path = tempfile.mkdtemp() + "/vs"
    store = VectorStore(spark, path)
    print(f"{n} vectors, {n_batches} increments, store at {path}", flush=True)
    for i in range(n_batches):
        batch = emb.filter((F.col("vec_id") % n_batches) == i)
        t0 = time.time()
        res = incremental_semantic_dedup(
            batch, store, threshold=0.9, n_cells=64, max_cell=50_000,
        )
        dt = time.time() - t0
        print(
            f"increment {i}: {dt:.2f}s accepted {res.accepted.count()} "
            f"store_rows {res.store_rows}",
            flush=True,
        )
    t0 = time.time()
    st = store.stats()
    print(f"stats: {st} [{time.time() - t0:.2f}s]", flush=True)
    t0 = time.time()
    rp = store.compact()
    print(f"compact: {rp} [{time.time() - t0:.2f}s]", flush=True)
    t0 = time.time()
    bal = ivf_balance(store.index())
    print(f"balance: {bal} [{time.time() - t0:.2f}s]", flush=True)
    t0 = time.time()
    rt = store.retrain(128)
    print(f"retrain(128): {rt} [{time.time() - t0:.2f}s]", flush=True)
    # post-retrain increment: steady state under the new geometry (fresh
    # ids so nothing self-rejects by identity)
    batch = emb.filter((F.col("vec_id") % n_batches) == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    t0 = time.time()
    res = incremental_semantic_dedup(batch, store, threshold=0.9)
    print(
        f"post-retrain increment: {time.time() - t0:.2f}s "
        f"accepted {res.accepted.count()}",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
