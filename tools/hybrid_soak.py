"""Hybrid retrieval soak: saved BM25 index + pq VectorStore at a soak
decade (default .soak/sf1 — 10x the driver's sf0.1), measuring the
serving-shaped query path the `hybrid_search_scale` bench twin times
at sf0.1:

    python tools/hybrid_soak.py [--sf-dir .soak/sf1] [--queries 8]

Reports: one-time index/store build walls, then per-pass decomposition
(index load / BM25 / store ADC / fused hybrid_topk) over 3 passes, and
the postings-scan prune evidence (files read vs files on disk).
"""
import argparse
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from xdump_spark.operators import retrieval as R  # noqa: E402
from xdump_spark.operators.incremental import (  # noqa: E402
    VectorStore,
    incremental_semantic_dedup,
)
from xdump_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=".soak/sf1")
    ap.add_argument("--queries", type=int, default=8)
    ap.add_argument("--depth", type=int, default=30)
    ap.add_argument("--n-cells", type=int, default=64)
    ap.add_argument("--n-probe", type=int, default=4)
    args = ap.parse_args()

    spark = get_spark("hybrid_soak")
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
    n_docs, n_vecs = docs.count(), emb.count()
    print(f"corpus: {n_docs} docs, {n_vecs} vectors")

    t0 = time.time()
    idx_dir = tempfile.mkdtemp() + "/soak_tidx"
    R.save_text_index(R.build_text_index(docs), idx_dir)
    print(f"index build+save: {time.time() - t0:.1f}s")

    t0 = time.time()
    store = VectorStore(
        spark, tempfile.mkdtemp() + "/soak_store", dtype="pq"
    )
    incremental_semantic_dedup(
        emb, store, threshold=0.95, n_cells=args.n_cells
    )
    print(f"pq store build: {time.time() - t0:.1f}s "
          f"(stats: {store.stats()})")

    # query batch: pinned ids, text = mid-doc words of those docs
    qids = [int(i * (n_docs // args.queries)) for i in range(args.queries)]
    qtext = docs.filter(F.col("doc_id").isin(qids)).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(
            " ",
            F.slice(F.split(F.col("text"), " "), 3, 4),
        ).alias("query"),
    )
    queries = qtext.join(
        emb.withColumnRenamed("vec_id", "query_id"), "query_id"
    ).localCheckpoint(eager=True)

    for i in range(3):
        t0 = time.time()
        idx = R.load_text_index(spark, idx_dir)
        t1 = time.time()
        bm = R.bm25_topk(idx, queries.select("query_id", "query"),
                         k=args.depth)
        bm.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        vq = queries.select(
            F.col("query_id").alias("vec_id"), "embedding"
        )
        store.search(vq, k=args.depth, n_probe=args.n_probe).write.format(
            "noop").mode("overwrite").save()
        t3 = time.time()
        R.hybrid_topk(
            idx, store, queries, k=10, depth=args.depth,
            n_probe=args.n_probe,
        ).write.format("noop").mode("overwrite").save()
        t4 = time.time()
        print(
            f"pass {i}: load {t1-t0:.2f}  bm25 {t2-t1:.2f}  "
            f"adc {t3-t2:.2f}  hybrid(full) {t4-t3:.2f}"
        )

    # prune evidence: postings files touched by the query terms
    idx = R.load_text_index(spark, idx_dir)
    qt = (
        queries.select(F.explode(R.terms_of(F.col("query"))).alias("term"))
        .distinct()
    )
    buckets = {
        r.b for r in qt.select(
            F.pmod(F.xxhash64("term"), F.lit(idx.n_tbuckets)).alias("b")
        ).distinct().collect()
    }
    # plain os.walk: fsutil.list_data_files treats the "_tbucket=" dirs
    # as hidden (underscore prefix) by design — Spark does too, which is
    # why the PARTITION COLUMN keeps working while raw listings skip it
    import os

    all_files = [
        os.path.join(root, f)
        for root, _, fs_ in os.walk(f"{idx_dir}/postings")
        for f in fs_
        if f.endswith(".parquet") and "/_tbucket=" in root + "/"
    ]
    touched = [
        f for f in all_files
        if any(f"/_tbucket={b}/" in f for b in buckets)
    ]
    print(
        f"postings prune: {len(buckets)}/{idx.n_tbuckets} buckets named "
        f"by the query terms -> {len(touched)}/{len(all_files)} files"
    )
    spark.stop()


if __name__ == "__main__":
    main()
