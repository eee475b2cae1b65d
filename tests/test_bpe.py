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


# -- gpt2 pre-tokenization + byte fallback (unsegmented scripts) ------------

CJK_SENTS = [
    "今天天气很好",
    "今天我们去公园",
    "天气预报说今天下雨",
    "我们今天去学校",
    "公园里天气很好",
    "学校今天放假",
    "今天下雨了",
    "我们去公园玩",
]


def _cjk_corpus(spark, n=40):
    rows = [(i, "。".join(CJK_SENTS) + "。") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gpt2_pretokens_match_spark_regex(spark):
    """The Python scanner used by encode must agree token-for-token with
    the Java-regex column twin the trainer counts with."""
    from xdump_spark.operators.text import bpe_tokens, gpt2_pretokens

    samples = [
        "Hello world's  end",
        "今天天气很好。我们去公园吧！",
        "don't can't I'll we're you've she'd it's",
        "a1b2  c3 \t tabs\nnewlines  3.14 1,000",
        " leading space", "trailing ", "  double  spaces ",
        "mixed日本語toRōmaji123",
        "!!'s ?'re 'S 'unknown",
        "emoji 🦜🎉 done",
        "", "   ", "'", "''", "'s", "x'", "ΑΒΓ ελλην", "٣٤٥ arabic ١٢",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    jv = [list(r["p"]) for r in df.select(bpe_tokens(F.col("t")).alias("p")).collect()]
    for s, want in zip(samples, jv):
        assert gpt2_pretokens(s) == want, repr(s)


def test_cjk_training_compresses_and_roundtrips(spark):
    """r7 verdict #3 'done' gate: a CJK corpus trains a merge table with
    reusable multi-char units (tokens-per-char < 1, i.e. compression)
    and byte-fallback decode is exact — including characters never seen
    in training."""
    tok = bpe_train(
        _cjk_corpus(spark), vocab_size=400, pretok="gpt2", byte_fallback=True
    )
    # merges learned multi-char CJK units
    cjk_merged = [a + b for a, b in tok.merges if all("一" <= ch <= "鿿" for ch in a + b)]
    assert len(cjk_merged) >= 3, cjk_merged
    held_out = "今天天气很好。我们今天去公园。"
    ids = bpe_encode(held_out, tok)
    assert len(ids) < len(held_out)  # compression: fewer tokens than chars
    assert UNK_ID not in ids
    assert bpe_decode(ids, tok) == held_out
    # unseen chars (incl. astral emoji) go through bytes — still exact
    weird = "新字🦜和 mixed latin"
    ids2 = bpe_encode(weird, tok)
    assert UNK_ID not in ids2
    assert bpe_decode(ids2, tok) == weird
    # byte ids are the reserved 1..256 range
    assert any(1 <= i <= 256 for i in ids2)


def test_gpt2_mode_case_and_space_preserved(spark):
    corpus = spark.createDataFrame(
        [(1, "The cat sat. The Cat sat again.")], "doc_id long, text string"
    )
    tok = bpe_train(corpus, vocab_size=200, pretok="gpt2", byte_fallback=True)
    s = "The Cat sat."
    assert bpe_decode(bpe_encode(s, tok), tok) == s  # case survives
    # leading-space tokens: " cat" != "cat" pre-tokens exist
    vocab_toks = {t for t, _ in tok.vocab}
    assert any(t.startswith(" ") for t in vocab_toks)


def test_gpt2_frame_encode_matches_reference(spark):
    tok = bpe_train(
        _cjk_corpus(spark), vocab_size=300, pretok="gpt2", byte_fallback=True
    )
    rows = [
        (1, "今天天气很好。"),
        (2, "我们去公园玩，今天放假！"),
        (3, "mixed 拉丁 and latin 123"),
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(4)
    got = {r["doc_id"]: (list(r["ids"]), r["n_oov"])
           for r in bpe_encode_frame(df, tok).collect()}
    for i, t in rows:
        want = bpe_encode(t, tok) if t and t.strip() else []
        assert got[i] == (want, 0), i
    # JSON round-trip carries the mode fields
    t2 = BPETokenizer.from_dict(tok.to_dict())
    assert t2 == tok and t2.pretok == "gpt2" and t2.byte_fallback


def test_mode_validation(spark):
    corpus = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="pretok"):
        bpe_train(corpus, pretok="nope")
    with pytest.raises(ValueError, match="byte_fallback"):
        bpe_train(corpus, pretok="whitespace", byte_fallback=True)
