"""Property tests for the post-training render/span/encode arithmetic
under ARBITRARY unicode content (multi-byte chars, C0/C1 controls,
surrogpairs-adjacent planes, whitespace zoo): the char-offset spans must
slice the rendered string back to exactly the original contents, the
DPO response spans to exactly the responses, and the token-level mask
must select exactly the assistant content ids — on inputs far uglier
than the crafted fixtures."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from xdump_spark.operators import preference as P
from xdump_spark.operators import sft

CONV_SCHEMA = (
    "conv_id long, messages array<struct<role:string,content:string>>"
)
PAIR_SCHEMA = (
    "pair_id long, prompt array<struct<role:string,content:string>>, "
    "chosen string, rejected string"
)

# Arbitrary non-empty text, surrogates excluded (not representable in
# UTF-8 transport), otherwise the full unicode zoo including emoji,
# CJK, combining marks, newlines, and tabs.
content = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),
    min_size=1,
    max_size=24,
)
role = st.sampled_from(["system", "user", "assistant"])
turns = st.lists(st.tuples(role, content), min_size=1, max_size=6)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ts=turns, template=st.sampled_from(["chatml", "plain"]))
def test_spans_slice_exact_contents_any_unicode(spark, ts, template):
    df = spark.createDataFrame(
        [(1, [{"role": r, "content": c} for r, c in ts])], CONV_SCHEMA
    )
    out = sft.assistant_spans(
        sft.render_chat(df, template=template), template=template
    ).collect()[0]
    got = [out["text"][s["start"]: s["end"]] for s in out["spans"]]
    want = [c for r, c in ts if r == "assistant"]
    assert got == want


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ts=turns, chosen=content, rejected=content)
def test_dpo_response_spans_any_unicode(spark, ts, chosen, rejected):
    df = spark.createDataFrame(
        [(1, [{"role": r, "content": c} for r, c in ts], chosen, rejected)],
        PAIR_SCHEMA,
    )
    r = P.render_dpo(df).collect()[0]
    sc, sr = r["span_chosen"], r["span_rejected"]
    assert r["text_chosen"][sc["start"]: sc["end"]] == chosen
    assert r["text_rejected"][sr["start"]: sr["end"]] == rejected


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ts=turns)
def test_encode_mask_selects_assistant_ids_any_unicode(spark, ts):
    """ids[mask] == the per-turn encoding of assistant contents plus one
    end token per assistant turn, for arbitrary unicode contents and an
    arbitrary (here: derived) vocabulary."""
    from xdump_spark.operators.curation import build_vocab

    corpus = spark.createDataFrame(
        [(i, c) for i, (_r, c) in enumerate(ts)], "doc_id long, text string"
    )
    vocab = build_vocab(corpus)
    vmap = {r["tok"]: r["token_id"] for r in vocab.collect()}
    sp = sft.special_token_ids(vocab)
    df = spark.createDataFrame(
        [(1, [{"role": r, "content": c} for r, c in ts])], CONV_SCHEMA
    )
    row = sft.encode_conversations(df, vocab).collect()[0]
    got = [i for i, m in zip(row["input_ids"], row["loss_mask"]) if m]
    want = []
    for r, c in ts:
        if r == "assistant":
            want.extend(vmap.get(w, 0) for w in c.strip().lower().split())
            want.append(sp["im_end"])
    assert got == want
    assert len(row["input_ids"]) == len(row["loss_mask"])

def test_spans_astral_plane_pinned(spark):
    """Explicit astral-plane pin (hypothesis may not draw one): emoji
    count 1 code point in Python slicing and 2 UTF-16 units in Java —
    the spans must follow Spark's length() code-point semantics, which
    match Python's."""
    ts = [("user", "hi \U0001F600\U0001F680"), ("assistant", "\U0001F389 ok \U0001F9EA")]
    df = spark.createDataFrame(
        [(1, [{"role": r, "content": c} for r, c in ts])], CONV_SCHEMA
    )
    out = sft.assistant_spans(sft.render_chat(df)).collect()[0]
    s = out["spans"][0]
    assert out["text"][s["start"]: s["end"]] == "\U0001F389 ok \U0001F9EA"
