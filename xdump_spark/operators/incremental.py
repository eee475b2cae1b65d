"""Incremental near-dup dedup: new documents vs a persistent signature
store.

A production corpus is not deduped once — it grows (daily crawls, new
shards) and each increment must be checked against everything already
accepted WITHOUT re-scanning the historical text. The store keeps only
MinHash signatures and their LSH band keys (num_perm longs + bands ints
per accepted doc — ~0.5 KB/doc: storable, joinable, orders of magnitude
smaller than the text).

Per increment:

1. sign the new batch (Arrow-batched numpy, narrow);
2. LSH-band the new signatures; candidates = bucket collisions
   new-vs-store and new-vs-new (two equi-joins on small band keys —
   the store side is band-partitioned parquet, never re-signed);
3. verify candidates on signature agreement (the estimate verification
   of ``minhash_lsh_pairs``);
4. survivors are APPENDED to the store.

Acceptance follows GREEDY-SEQUENTIAL semantics — the contract of any
streaming dedup: a doc is kept iff it is not estimated-similar to any
STORED doc nor to any smaller-id KEPT member of its own batch (a doc
whose only near-dup partner was itself rejected is still kept, exactly
as if the batch had arrived one doc at a time). Only docs that appear
in a collision pair need driver-side resolution, so the driver work is
O(|near-dup pairs|), not O(|batch|).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xdump_spark.operators.dedup import (
    _norm_text,
    _spread,
    minhash_signatures,
)


def _banded(sigs: DataFrame, num_perm: int, bands: int) -> DataFrame:
    rows_per_band = num_perm // bands
    band_structs = [
        F.struct(
            F.lit(j).alias("band"),
            F.xxhash64(
                F.slice("sig", j * rows_per_band + 1, rows_per_band)
            ).alias("bucket"),
        )
        for j in range(bands)
    ]
    return sigs.select(
        "id", "sig", F.explode(F.array(*band_structs)).alias("bb")
    ).select("id", "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def _estimate_jaccard(sig_a, sig_b, num_perm: int):
    matches = F.size(F.filter(F.zip_with(sig_a, sig_b, lambda x, y: x == y), lambda v: v))
    return F.round(matches / F.lit(float(num_perm)), 6)


@dataclass
class IncrementResult:
    """One increment's outcome."""

    pairs: list[tuple]      # (dup_id, kept_id, est_jaccard), sorted
    accepted: DataFrame     # (id) — appended to the store
    store_rows: int         # distinct stored ids after the increment


class SignatureStore:
    """Parquet-backed (id, sig, band, bucket) store, partitioned by band
    so candidate probes read only the band layout they join on. At corpus
    scale this is the only persistent dedup state — text never re-reads."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            not n.startswith((".", "_")) for n in os.listdir(self.path)
        )

    def read(self) -> DataFrame | None:
        if not self.exists():
            return None
        return self.spark.read.parquet(self.path)

    def append(self, banded: DataFrame) -> None:
        banded.write.mode("append").partitionBy("band").parquet(self.path)


def incremental_neardup(
    new_docs: DataFrame,
    store: SignatureStore,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.5,
) -> IncrementResult:
    """Run one dedup increment (see module docstring for semantics)."""
    spark = new_docs.sparkSession
    normed = _spread(new_docs.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).alias("id"), _norm_text(F.col(text_col)).alias("_norm")
    )
    sigs = minhash_signatures(normed, num_perm, shingle_k).localCheckpoint(eager=True)
    banded = _banded(sigs, num_perm, bands).localCheckpoint(eager=True)

    est = _estimate_jaccard(F.col("sig_a"), F.col("sig_b"), num_perm)

    # new vs STORE: equi-join on the band key; the (small) new side
    # broadcasts, the store side prunes to matching band partitions.
    # Only COLLIDING pairs come back to the driver.
    stored = store.read()
    if stored is not None:
        store_hits = (
            stored.join(
                F.broadcast(
                    banded.select(
                        "band", "bucket",
                        F.col("id").alias("new_id"), F.col("sig").alias("sig_a"),
                    )
                ),
                ["band", "bucket"],
            )
            .select("new_id", F.col("id").alias("kept_id"), "sig_a", F.col("sig").alias("sig_b"))
            .dropDuplicates(["new_id", "kept_id"])
            .withColumn("est", est)
            .filter(F.col("est") >= threshold)
            .groupBy("new_id")
            .agg(F.min("kept_id").alias("kept_id"), F.max("est").alias("est"))
            .collect()
        )
    else:
        store_hits = []
    rejected: dict = {r["new_id"]: (r["kept_id"], r["est"]) for r in store_hits}

    # new vs NEW bucket-collision pairs (id_a < id_b), then the greedy
    # sequential resolution over pair-involved ids only.
    l = banded.select("band", "bucket", F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    r = banded.select("band", "bucket", F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    intra = (
        l.join(r, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("est", est)
        .filter(F.col("est") >= threshold)
        .select("id_a", "id_b", "est")
        .collect()
    )
    partners: dict = {}
    for row in intra:
        partners.setdefault(row["id_b"], []).append((row["id_a"], row["est"]))
    for d in sorted(partners):
        if d in rejected:
            continue
        hits = [(a, e) for a, e in partners[d] if a not in rejected]
        if hits:
            kept, e = max(hits, key=lambda h: (h[1], -h[0]))
            rejected[d] = (kept, e)

    pairs = sorted((d, k, e) for d, (k, e) in rejected.items())
    if rejected:
        rej_df = spark.createDataFrame([(int(d),) for d in rejected], "id long")
        accepted_banded = banded.join(F.broadcast(rej_df), "id", "left_anti")
    else:
        accepted_banded = banded
    accepted_banded = accepted_banded.localCheckpoint(eager=True)
    store.append(accepted_banded)
    accepted = accepted_banded.select("id").distinct()
    n = store.read().select("id").distinct().count()
    return IncrementResult(pairs=pairs, accepted=accepted, store_rows=n)


def streaming_neardup_dedup(
    doc_stream: DataFrame,
    store: SignatureStore,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    **kwargs,
):
    """Streaming ingest dedup: every micro-batch runs one
    ``incremental_neardup`` increment against the shared signature store
    via ``foreachBatch`` — batch semantics, streaming arrival. The store
    IS the operator state (restart-safe: signatures live in parquet, the
    stream's progress in the checkpoint), which is how a continuous
    crawl-ingest pipeline keeps dedup state without unbounded executor
    memory."""

    def _do_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        incremental_neardup(
            batch_df, store, text_col=text_col, id_col=id_col, **kwargs
        )

    return (
        doc_stream.writeStream.foreachBatch(_do_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
