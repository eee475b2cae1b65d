"""Incremental / streaming near-dup dedup against the signature store."""

import pytest

from pyspark.sql import functions as F

from xdump_spark.operators.incremental import (
    SignatureStore,
    incremental_neardup,
    streaming_neardup_dedup,
)

BASE = "the quick brown fox jumps over the lazy dog again and again in the yard"
NEAR = "the quick brown fox jumped over the lazy dog again and again in the yard"
OTHER = "completely different content about distributed query engines and shuffles"
THIRD = "yet another unrelated document mentioning parquet footers and row groups"

DOC_SCHEMA = "doc_id long, text string"


def _ids(df):
    return sorted(r.id for r in df.collect())


def test_incremental_two_batches(spark, tmp_path):
    store = SignatureStore(spark, str(tmp_path / "store"))

    # increment 1: near-dup pair (1,2) + distinct 3
    b1 = spark.createDataFrame([(1, BASE), (2, NEAR), (3, OTHER)], DOC_SCHEMA)
    r1 = incremental_neardup(b1, store)
    assert _ids(r1.accepted) == [1, 3]
    assert [(d, k) for d, k, _ in r1.pairs] == [(2, 1)]
    assert r1.store_rows == 2

    # increment 2: 10 dups the STORED 1; 11 dups the STORED 3; 12 is new
    b2 = spark.createDataFrame([(10, NEAR), (11, OTHER), (12, THIRD)], DOC_SCHEMA)
    r2 = incremental_neardup(b2, store)
    assert _ids(r2.accepted) == [12]
    assert [(d, k) for d, k, _ in r2.pairs] == [(10, 1), (11, 3)]
    assert r2.store_rows == 3


def test_incremental_greedy_chain_semantics(spark, tmp_path):
    """A doc whose only near-dup partner was itself rejected is still
    kept — greedy-sequential semantics (the batch behaves as if it had
    arrived one doc at a time)."""
    store = SignatureStore(spark, str(tmp_path / "store"))
    b1 = spark.createDataFrame([(1, BASE)], DOC_SCHEMA)
    incremental_neardup(b1, store)

    # 20 dups stored 1 → rejected. 21 dups 20 (same text) BUT its only
    # accepted comparison is the store: NEAR vs BASE → also rejected
    # against the store survivor, not against 20.
    b2 = spark.createDataFrame([(20, NEAR), (21, NEAR)], DOC_SCHEMA)
    r2 = incremental_neardup(b2, store)
    assert _ids(r2.accepted) == []
    assert [(d, k) for d, k, _ in r2.pairs] == [(20, 1), (21, 1)]


def test_incremental_matches_oneshot_survivors(spark, tmp_path):
    """Two increments accept exactly the greedy survivors of the union
    batch (banding is deterministic, so candidates agree)."""
    from xdump_spark.operators.dedup import minhash_lsh_pairs

    docs = [(1, BASE), (2, NEAR), (3, OTHER), (4, THIRD), (5, BASE + " x")]
    union = spark.createDataFrame(docs, DOC_SCHEMA)
    pairs = [
        (r.id_a, r.id_b) for r in minhash_lsh_pairs(union, threshold=0.5).collect()
    ]
    # greedy survivors from the one-shot pair list
    rejected = set()
    for a, b in sorted(pairs, key=lambda p: p[1]):
        if a not in rejected:
            rejected.add(b)
    want = sorted(set(d for d, _ in docs) - rejected)

    store = SignatureStore(spark, str(tmp_path / "store"))
    acc = []
    for batch in (docs[:3], docs[3:]):
        res = incremental_neardup(spark.createDataFrame(batch, DOC_SCHEMA), store)
        acc.extend(_ids(res.accepted))
    assert sorted(acc) == want


def test_streaming_neardup_dedup(spark, tmp_path):
    """foreachBatch wrapper: files arrive as separate micro-batches, the
    store ends in the same state as explicit increments."""
    src = str(tmp_path / "in")
    spark.createDataFrame([(1, BASE), (2, NEAR)], DOC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    spark.createDataFrame([(10, NEAR), (11, OTHER)], DOC_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    store = SignatureStore(spark, str(tmp_path / "store"))
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = streaming_neardup_dedup(
        stream, store, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    kept = sorted(
        r.id for r in store.read().select("id").distinct().collect()
    )
    # one BASE/NEAR survivor (whichever file arrived first) + OTHER
    assert 11 in kept
    assert len(kept) == 2
    assert kept[0] in (1, 10)
