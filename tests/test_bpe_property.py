"""Property tests for the BPE tokenizer: random corpora checked against
the pure-Python reference encode and a from-scratch decode invariant
(same strategy as the other *_property suites)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from xdump_spark.operators.bpe import (
    UNK_ID,
    bpe_decode,
    bpe_encode,
    bpe_encode_frame,
    bpe_train,
)

WORDS = ["ab", "abc", "aab", "ba", "cab", "abab", "x", "xyz"]

corpus_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=1, max_size=10),
    min_size=1,
    max_size=8,
)

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(corpus_strategy, st.integers(min_value=8, max_value=40))
@settings(**SETTINGS)
def test_bpe_roundtrip_and_frame_parity(spark, docs, vocab_size):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    tok = bpe_train(df, vocab_size=vocab_size)
    # frame encode == pure-Python reference, doc by doc
    got = {r.doc_id: list(r.ids) for r in bpe_encode_frame(df, tok).collect()}
    for i, toks in enumerate(docs):
        text = " ".join(toks)
        ref = bpe_encode(text, tok)
        assert got[i] == ref
        # decode inverts encode whenever nothing fell to <unk> (base
        # symbols all come from the training corpus here, so never)
        assert UNK_ID not in ref
        assert bpe_decode(ref, tok) == text
    # refit determinism on the same frame
    assert bpe_train(df, vocab_size=vocab_size) == tok
