"""BPE tokenizer tests (operators/bpe.py): classic-example merges,
deterministic refit, JSON round-trip, frame-encode agreement with the
pure-Python reference, partition invariance, real-testdata drive."""

import pytest
from pyspark.sql import functions as F

from xdump_spark.operators.bpe import (
    EOW,
    UNK_ID,
    BPETokenizer,
    bpe_decode,
    bpe_encode,
    bpe_encode_frame,
    bpe_train,
    bpe_training_shards,
)


def test_classic_merges_and_roundtrip(spark):
    """The Sennrich paper's running example: 'low/lower/newest/widest'
    frequencies drive the first merges toward 'est</w>' and 'low'."""
    rows = (
        [("low",)] * 5 + [("lower",)] * 2 + [("newest",)] * 6 + [("widest",)] * 3
    )
    corpus = spark.createDataFrame(
        [(i, " ".join(w for (w,) in rows)) for i in range(1)], "doc_id long, text string"
    )
    tok = bpe_train(corpus, vocab_size=40)
    merged_tokens = {a + b for a, b in tok.merges}
    assert f"est{EOW}" in merged_tokens
    assert "lo" in merged_tokens or "low" in merged_tokens
    # every trained word encodes with zero OOV and decodes back exactly
    for w in ("low", "lower", "newest", "widest"):
        ids = bpe_encode(w, tok)
        assert UNK_ID not in ids
        assert bpe_decode(ids, tok) == w
    # unseen word built from seen symbols still round-trips
    ids = bpe_encode("lowest", tok)
    assert bpe_decode(ids, tok) == "lowest"


def test_train_is_deterministic_and_roundtrips(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    t1 = bpe_train(docs, vocab_size=300)
    t2 = bpe_train(docs, vocab_size=300)
    assert t1 == t2
    assert BPETokenizer.from_dict(t1.to_dict()) == t1
    assert len(t1.vocab) <= 300 - 1


def test_vocab_size_bounds_merges(spark):
    corpus = spark.createDataFrame(
        [(1, "aa ab ba bb aa ab aa")], "doc_id long, text string"
    )
    tok = bpe_train(corpus, vocab_size=6)
    # base symbols: a, b, a</w>, b</w> → at most 1 merge fits under 6-1
    assert len(tok.merges) <= 1
    assert len(tok.vocab) <= 5


def test_frame_encode_matches_reference_and_is_partition_invariant(spark):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(60)
        .cache()
    )
    tok = bpe_train(docs, vocab_size=400)
    got = {r.doc_id: list(r.ids) for r in bpe_encode_frame(docs, tok).collect()}
    got13 = {
        r.doc_id: list(r.ids)
        for r in bpe_encode_frame(docs.repartition(13), tok).collect()
    }
    assert got == got13
    ref = {
        r.doc_id: bpe_encode(r.text, tok)
        for r in docs.select("doc_id", "text").collect()
    }
    assert got == ref
    # trained on this very corpus with min_count=1 → no OOV
    oov = bpe_encode_frame(docs, tok).agg(F.sum("n_oov")).collect()[0][0]
    assert oov == 0
    # subword compression: more bpe tokens than words is expected, but
    # every doc's decode must reproduce its normalized text
    sample = docs.limit(5).collect()
    for r in sample:
        assert bpe_decode(ref[r.doc_id], tok) == " ".join(r.text.strip().lower().split())


def test_encode_frame_plan_is_narrow(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    tok = bpe_train(docs, vocab_size=200)
    plan = bpe_encode_frame(docs, tok)._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan and "rangepartitioning" not in plan
    assert "ArrowEvalPython" in plan  # vectorized, not row-at-a-time
    assert "BatchEvalPython" not in plan


def test_empty_and_error_paths(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty corpus"):
        bpe_train(empty)
    docs = spark.createDataFrame([(1, "abc abc")], "doc_id long, text string")
    tok = bpe_train(docs, vocab_size=50)
    out = bpe_encode_frame(
        spark.createDataFrame([(1, ""), (2, None), (3, "abc")], "doc_id long, text string"),
        tok,
    )
    got = {r.doc_id: (list(r.ids), r.n_bpe_tokens) for r in out.collect()}
    assert got[1] == ([], 0) and got[2] == ([], 0)
    assert got[3][1] >= 1


def test_bpe_training_shards_end_to_end(spark):
    """Exactly-once token coverage in subword units, budget bound on
    n_bpe_tokens, concatenation follows pack order."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(80)
        .cache()
    )
    tok = bpe_train(docs, vocab_size=400)
    budget = 256
    shards = bpe_training_shards(docs, tok, budget=budget).cache()
    rows = shards.collect()
    assert rows
    # every sequence's id count matches its declared token count
    assert all(len(r.input_ids) == r.n_tokens for r in rows)
    # budget bound: multi-doc sequences fit; only singletons may exceed
    for r in rows:
        if r.n_docs > 1:
            assert r.n_tokens <= budget
    # exactly-once coverage: total ids == sum of per-doc encode lengths
    per_doc = bpe_encode_frame(docs, tok).agg(F.sum("n_bpe_tokens")).collect()[0][0]
    assert sum(r.n_tokens for r in rows) == per_doc
    # determinism
    again = {r.seq_id: list(r.input_ids) for r in bpe_training_shards(docs, tok, budget=budget).collect()}
    assert again == {r.seq_id: list(r.input_ids) for r in rows}
    shards.unpersist()
    docs.unpersist()
