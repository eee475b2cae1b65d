"""Unigram-LM tokenizer tests (operators/unigram.py)."""

import math

import pytest

from xdump_spark.operators.unigram import (
    UNK_ID,
    UnigramTokenizer,
    _forward_backward,
    _viterbi,
    unigram_decode,
    unigram_encode,
    unigram_encode_frame,
    unigram_train,
)


# ------------------------------------------------------ lattice kernels ----
def test_viterbi_prefers_high_prob_segmentation():
    logp = {"un": -1.0, "happy": -1.0, "u": -5.0, "n": -5.0, "h": -5.0,
            "a": -5.0, "p": -5.0, "y": -5.0, "unhappy": -3.0}
    pieces, score = _viterbi("unhappy", logp, max_len=7)
    # one piece at -3.0 beats un+happy at -2.0? No: -2.0 > -3.0 → two pieces
    assert pieces == ["un", "happy"]
    assert abs(score - (-2.0)) < 1e-12


def test_viterbi_unknown_chars_are_total():
    logp = {"a": -1.0}
    pieces, _ = _viterbi("axa", logp, max_len=3)
    assert pieces == ["a", "x", "a"]


def test_forward_backward_matches_manual_two_path_case():
    """'ab' with pieces {a, b, ab}: two segmentations. Expected counts
    must equal the posterior weights computed by hand."""
    logp = {"a": math.log(0.3), "b": math.log(0.3), "ab": math.log(0.4)}
    counts, total = _forward_backward("ab", logp, max_len=2)
    p_split = 0.3 * 0.3
    p_whole = 0.4
    z = p_split + p_whole
    assert abs(math.exp(total) - z) < 1e-12
    assert abs(counts["ab"] - p_whole / z) < 1e-12
    assert abs(counts["a"] - p_split / z) < 1e-12
    assert abs(counts["b"] - p_split / z) < 1e-12


# -------------------------------------------------------------- training ---
@pytest.fixture(scope="module")
def morpheme_corpus(spark):
    words = (["unhappy", "unkind", "untested", "unclear"] * 6
             + ["happily", "kindly", "clearly"] * 4
             + ["test", "tests", "tested"] * 4)
    rows = [(i, " ".join(words[i::7])) for i in range(7)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_learns_shared_morphemes(spark, morpheme_corpus):
    tok = unigram_train(morpheme_corpus, vocab_size=40, max_piece_len=6)
    pieces = {p for p, _ in tok.pieces}
    assert len(tok.pieces) <= 40
    assert "un" in pieces  # the shared prefix must survive pruning
    # every training word round-trips losslessly (chars are protected)
    for w in ["unhappy", "kindly", "tested"]:
        ids = unigram_encode(w, tok)
        assert UNK_ID not in ids
        assert unigram_decode(ids, tok) == w


def test_train_deterministic_refit(spark, morpheme_corpus):
    a = unigram_train(morpheme_corpus, vocab_size=40, max_piece_len=6)
    b = unigram_train(morpheme_corpus, vocab_size=40, max_piece_len=6)
    assert a.pieces == b.pieces  # bit-identical


def test_tokenizer_roundtrip_serialization(spark, morpheme_corpus):
    tok = unigram_train(morpheme_corpus, vocab_size=40)
    tok2 = UnigramTokenizer.from_dict(tok.to_dict())
    assert tok.pieces == tok2.pieces
    assert unigram_encode("unhappy tests", tok) == unigram_encode("unhappy tests", tok2)


def test_unknown_characters_map_to_unk(spark, morpheme_corpus):
    tok = unigram_train(morpheme_corpus, vocab_size=40)
    ids = unigram_encode("unhappy Ω", tok)
    assert ids.count(UNK_ID) == 1


# ------------------------------------------------------- frame encoding ----
def test_encode_frame_matches_reference_and_partition_invariant(spark, morpheme_corpus):
    tok = unigram_train(morpheme_corpus, vocab_size=40)
    docs = morpheme_corpus
    got = {r.doc_id: (list(r.ids), r.n_pieces, r.n_oov)
           for r in unigram_encode_frame(docs, tok).collect()}
    for r in docs.collect():
        want = unigram_encode(r.text, tok)
        assert got[r.doc_id] == (want, len(want), want.count(UNK_ID)), r.doc_id
    got2 = {r.doc_id: list(r.ids)
            for r in unigram_encode_frame(docs.repartition(5), tok).collect()}
    assert {k: v[0] for k, v in got.items()} == got2


def test_encode_frame_plan_is_narrow_arrow(spark, morpheme_corpus):
    tok = unigram_train(morpheme_corpus, vocab_size=40)
    plan = (
        unigram_encode_frame(morpheme_corpus, tok)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "ArrowEvalPython" in plan, plan


def test_train_on_real_documents(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(120)
    tok = unigram_train(docs, vocab_size=400, max_words=2000, max_piece_len=6)
    assert 50 < len(tok.pieces) <= 400
    out = unigram_encode_frame(docs, tok).collect()
    assert all(r.n_oov == 0 for r in out)  # training corpus has no OOV chars
    # pieces longer than one char actually get used (compression happens)
    n_chars = sum(len(t.text.replace(" ", "")) for t in docs.select("text").collect())
    n_pieces = sum(r.n_pieces for r in out)
    assert n_pieces < 0.8 * n_chars


# -- gpt2 pre-tokenization + byte fallback ----------------------------------


def test_unigram_gpt2_cjk_compresses_and_roundtrips(spark):
    from xdump_spark.operators.unigram import (
        UNK_ID,
        UnigramTokenizer,
        unigram_decode,
        unigram_encode,
        unigram_encode_frame,
        unigram_train,
    )

    sents = [
        "今天天气很好", "今天我们去公园", "天气预报说今天下雨",
        "我们今天去学校", "公园里天气很好", "学校今天放假",
    ]
    corpus = spark.createDataFrame(
        [(i, "。".join(sents) + "。") for i in range(20)],
        "doc_id long, text string",
    )
    tok = unigram_train(
        corpus, vocab_size=200, pretok="gpt2", byte_fallback=True,
        max_piece_len=4,
    )
    # multi-char CJK pieces learned
    assert any(len(p) > 1 and all("一" <= c <= "鿿" for c in p)
               for p, _ in tok.pieces)
    held_out = "今天天气很好。我们去公园。"
    ids = unigram_encode(held_out, tok)
    assert len(ids) < len(held_out) and UNK_ID not in ids
    assert unigram_decode(ids, tok) == held_out
    # unseen chars fall back to bytes, round-trip exact, case preserved
    weird = "新字🦜 Mixed Latin"
    ids2 = unigram_encode(weird, tok)
    assert UNK_ID not in ids2 and any(1 <= i <= 256 for i in ids2)
    assert unigram_decode(ids2, tok) == weird
    # frame encode agrees with the reference; JSON carries mode fields
    df = spark.createDataFrame(
        [(1, held_out), (2, weird), (3, None)], "doc_id long, text string"
    ).repartition(3)
    got = {r["doc_id"]: list(r["ids"])
           for r in unigram_encode_frame(df, tok).collect()}
    assert got[1] == ids and got[2] == ids2 and got[3] == []
    t2 = UnigramTokenizer.from_dict(tok.to_dict())
    assert t2 == tok and t2.pretok == "gpt2" and t2.byte_fallback


def test_unigram_mode_validation(spark):
    import pytest as _pytest

    from xdump_spark.operators.unigram import unigram_train

    corpus = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="byte_fallback"):
        unigram_train(corpus, pretok="whitespace", byte_fallback=True)
