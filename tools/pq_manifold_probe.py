"""Real-manifold PQ probe (r10 verdict #6): the sf10 soak's synthetic
full-rank gaussians are the codec's WORST case (recon cosine ~0.8); the
claim "real embeddings sit far from that failure mode" needs a measured
number. This probe uses hash-trick embeddings of the soak DOCUMENTS
table — term-frequency geometry: nonnegative, sparse-ish, low intrinsic
dimension, i.e. manifold-structured the way real model embeddings are —
and reports:

1. recon-cosine distribution (mean / p5 / min) for m=8 and m=16, on the
   manifold vectors AND on a gaussian control of the same shape;
2. the OPQ question: the same codebooks after a PCA rotation (the OPQ
   initialization — OPQ's gain over PCA-init is typically small, so
   this bounds what a full OPQ would buy) — if the rotation does not
   move recon cosine materially, not building OPQ stays justified;
3. the decision numbers the soak pins: a 10-increment pq-vs-float64
   lifecycle on the manifold vectors (steady-state accepted-set
   identity per increment, post-retrain churn).

Run from the repo root (defaults: sf1 soak docs, dim 64):

    python tools/pq_manifold_probe.py [sf1|sf10] [dim]

Results belong in SCALE.md (r11 "pq on manifold vectors" row).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
from pyspark.sql import functions as F

from xdump_spark.operators.pq import (
    PQCodebook,
    _assign_codes,
    _normalize_rows,
    pq_reconstruct,
    pq_train,
)
from xdump_spark.operators.text import hash_embed_col
from xdump_spark.session import get_spark


def recon_stats(spark, vecs_df, m: int, sample: np.ndarray) -> dict:
    """Train a codebook on the frame, reconstruct the (collected)
    sample, return cosine(original, reconstruction) stats. PQ operates
    on normalized vectors (pq_train normalizes), so the comparison is
    against the normalized originals."""
    cb = pq_train(vecs_df, m=m, id_col="vec_id", vec_col="embedding")
    cents = cb.matrices()
    X = _normalize_rows(sample.astype(np.float64))
    codes = _assign_codes(X, cb, cents)
    R = pq_reconstruct(codes, cb, cents)
    num = np.einsum("ij,ij->i", X, R)
    den = np.linalg.norm(R, axis=1)
    den[den == 0.0] = 1.0
    cos = num / den
    return {
        "m": m,
        "mean": round(float(cos.mean()), 4),
        "p5": round(float(np.percentile(cos, 5)), 4),
        "min": round(float(cos.min()), 4),
    }


def main() -> None:
    soak = sys.argv[1] if len(sys.argv) > 1 else "sf1"
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark("pq_manifold_probe")
    docs = spark.read.parquet(f"/root/repo/.soak/{soak}/documents.parquet")
    emb = (
        docs.select(
            F.col("doc_id").alias("vec_id"),
            hash_embed_col("text", dim=dim).alias("embedding"),
        )
        .filter(F.size("embedding") == dim)
        .localCheckpoint(eager=True)
    )
    n = emb.count()
    print(f"{n} manifold vectors (hash-embed dim={dim}) from {soak} docs",
          flush=True)

    rng = np.random.default_rng(7)
    sample_rows = emb.orderBy("vec_id").limit(20_000).collect()
    S = np.array([r["embedding"] for r in sample_rows], dtype=np.float64)
    G = rng.standard_normal(S.shape)  # gaussian control, same shape
    gdf = spark.createDataFrame(
        [(int(i), [float(x) for x in G[i]]) for i in range(min(len(G), 20_000))],
        "vec_id long, embedding array<double>",
    ).localCheckpoint(eager=True)

    for m in (8, 16):
        man = recon_stats(spark, emb, m, S)
        gau = recon_stats(spark, gdf, m, G)
        print(f"recon m={m}: manifold {man} | gaussian-control {gau}",
              flush=True)

    # OPQ bound: PCA-rotate (the OPQ init) and re-measure. The rotation
    # is fit driver-side on the sample (dim x dim eigendecomposition).
    Sn = _normalize_rows(S)
    C = np.cov(Sn, rowvar=False)
    _, Vr = np.linalg.eigh(C)
    Rot = Vr[:, ::-1]  # descending-variance order
    SR = Sn @ Rot
    rdf = spark.createDataFrame(
        [(int(i), [float(x) for x in SR[i]]) for i in range(len(SR))],
        "vec_id long, embedding array<double>",
    ).localCheckpoint(eager=True)
    for m in (8, 16):
        rot = recon_stats(spark, rdf, m, SR)
        print(f"recon m={m}: manifold+PCA-rotation {rot}", flush=True)

    # decision lifecycle on the manifold vectors: reuse the soak's
    # pq-vs-float64 comparison machinery
    import tempfile

    from xdump_spark.operators.incremental import (
        VectorStore,
        incremental_semantic_dedup,
    )

    def lifecycle(dtype: str, exact_guard: bool = False):
        store = VectorStore(
            spark, tempfile.mkdtemp() + f"/mvs_{dtype}", dtype=dtype,
            exact_guard=exact_guard,
        )
        acc = []
        for i in range(10):
            batch = emb.filter((F.col("vec_id") % 10) == i)
            res = incremental_semantic_dedup(
                batch, store, threshold=0.9, n_cells=64,
                max_cell=50_000, count_store=False,
            )
            acc.append(frozenset(r["id"] for r in res.accepted.collect()))
        store.retrain(128)
        batch = emb.filter((F.col("vec_id") % 10) == 0).select(
            (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
        )
        res = incremental_semantic_dedup(
            batch, store, threshold=0.9, count_store=False
        )
        acc.append(frozenset(r["id"] for r in res.accepted.collect()))
        return acc

    t0 = time.time()
    a = lifecycle("float64")
    b = lifecycle("pq")
    c = lifecycle("pq", exact_guard=True)
    for label, other in (("pq", b), ("pq+exact_guard", c)):
        deltas = [len(x ^ y) for x, y in zip(a, other)]
        union = sum(len(x | y) for x, y in zip(a, other))
        steady = deltas[:-1]
        print(
            "decisions vs float64 [%s]: per-increment set deltas=%s "
            "(steady %d of %d), post-retrain RE-SEND delta %d, "
            "total %.4f%%"
            % (label, deltas, sum(steady),
               union - len(a[-1] | other[-1]), deltas[-1],
               100.0 * sum(deltas) / max(1, union)),
            flush=True,
        )
    print("lifecycles took %.0fs" % (time.time() - t0), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
