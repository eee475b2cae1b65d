"""VectorStore.retrain cost across store-size decades (r9 verdict #6).

Retrain is BY DESIGN one full-store rewrite (decode for pq → KMeans fit
on a sample → re-bucket → new generation + atomic meta swap). This tool
measures that cost at three store sizes a decade apart per storage
dtype, so the 1e9 cadence math in SCALE.md is extrapolated from
MEASURED per-row cost rather than guessed:

    python tools/retrain_decades.py [float64|pq] [n1 n2 ...]

Stores are built synthetically (deterministic xxhash64-derived 64-dim
vectors) through the real append path — first a small increment to
create the meta (and for pq, train the codebook), then bulk
``append_assigned`` of cell-assigned vectors — so retrain sees the
store layout production writes. KMeans fit uses sample_fraction sized
to ~100k rows (the production posture at 1e9: centroids need a
representative sample, not the corpus).
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
from xdump_spark.operators.similarity import ivf_assign
from xdump_spark.session import get_spark

DIM = 64


def synthetic(spark, n: int, start: int = 0):
    """Deterministic pseudo-embeddings: 64 xxhash64-derived doubles in
    [0, 1) per id — pure codegen, no Python, reproducible."""
    return spark.range(start, start + n).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                (
                    F.pmod(F.xxhash64(F.col("id"), F.lit(i)), F.lit(1000))
                    / 1000.0
                ).cast("double")
                for i in range(DIM)
            ]
        ).alias("embedding"),
    )


def build_store(spark, n: int, dtype: str, n_cells: int) -> VectorStore:
    path = tempfile.mkdtemp() + f"/vs_{dtype}_{n}"
    store = VectorStore(spark, path, dtype=dtype)
    seed = synthetic(spark, 10_000)
    incremental_semantic_dedup(
        seed, store, threshold=0.999, n_cells=n_cells,
    )
    rest = synthetic(spark, n - 10_000, start=10_000)
    assigned = ivf_assign(store.centers(), rest, "vec_id", "embedding")
    if store._store_dtype() == "pq":
        assigned = assigned.withColumn("vh", F.xxhash64(F.col("cv")))
    store.append_assigned(assigned)
    return store


def main() -> None:
    dtype = sys.argv[1] if len(sys.argv) > 1 else "float64"
    sizes = [int(x) for x in sys.argv[2:]] or [250_000, 1_000_000, 2_000_000]
    spark = get_spark("retrain_decades")
    for n in sizes:
        t0 = time.time()
        store = build_store(spark, n, dtype, n_cells=128)
        build_s = time.time() - t0
        st = store.stats()
        frac = min(1.0, 100_000 / n)
        t0 = time.time()
        rpt = store.retrain(256, sample_fraction=frac)
        retrain_s = time.time() - t0
        print(
            f"[{dtype}] n={n}: build {build_s:.1f}s, store "
            f"{st['bytes'] / 1e6:.1f} MB / {st['rows']} rows, "
            f"retrain(256, sample={frac:.3f}) {retrain_s:.1f}s "
            f"({1e6 * retrain_s / n:.2f} us/row) -> {rpt}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
