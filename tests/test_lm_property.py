"""Property test: lm_score agrees with an independent pure-Python
Stupid-Backoff implementation on arbitrary small corpora, and scoring is
partition-invariant."""

import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from xdump_spark.operators import lm as LM

WORDS = ["a", "b", "c", "d", "e"]

corpus_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=10),
    min_size=1,
    max_size=8,
)

SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_backoff(train_docs, score_docs, alpha=0.4):
    """Independent reference: plain-Python counts + backoff chain."""
    uni = Counter()
    bi = Counter()
    tri = Counter()
    for toks in train_docs:
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
        tri.update(zip(toks, toks[1:], toks[2:]))
    n_tokens = sum(uni.values())
    vocab = len(uni)
    out = {}
    for i, toks in enumerate(score_docs):
        if not toks:
            continue
        surps = []
        for j, w in enumerate(toks):
            s1 = (uni.get(w, 0) + 1) / (n_tokens + vocab)
            if j >= 2:
                u, v = toks[j - 2], toks[j - 1]
                if tri.get((u, v, w)):
                    s = tri[(u, v, w)] / bi[(u, v)]
                elif bi.get((v, w)):
                    s = alpha * bi[(v, w)] / uni[v]
                else:
                    s = alpha * alpha * s1
            elif j == 1:
                v = toks[j - 1]
                s = bi[(v, w)] / uni[v] if bi.get((v, w)) else alpha * s1
            else:
                s = s1
            surps.append(-math.log(s))
        out[i] = (len(toks), round(sum(surps) / len(surps), 6))
    return out


@given(corpus_strategy, corpus_strategy)
@settings(**SETTINGS)
def test_matches_python_reference(spark, train_docs, score_docs):
    train = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(train_docs)],
        "doc_id long, text string",
    )
    score = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(score_docs)],
        "doc_id long, text string",
    )
    # a train corpus of only-empty docs has no model to fit — skip
    if not any(train_docs):
        return
    model = LM.train_ngram_lm(train)
    got = {
        r["doc_id"]: (r["n_tokens"], r["mean_surprisal"])
        for r in LM.lm_score(score, model).collect()
    }
    assert got == _py_backoff(train_docs, score_docs)
    # every surprisal is finite and positive (S is always in (0, 1))
    assert all(s >= 0 and math.isfinite(s) for _, s in got.values())


@given(corpus_strategy, st.integers(min_value=1, max_value=7))
@settings(**SETTINGS)
def test_partition_invariance(spark, docs, nparts):
    if not any(docs):
        return
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(docs)],
        "doc_id long, text string",
    )
    model = LM.train_ngram_lm(df)
    base = {
        r["doc_id"]: (r["n_tokens"], r["mean_surprisal"], r["ppl"])
        for r in LM.lm_score(df, model).collect()
    }
    repart = {
        r["doc_id"]: (r["n_tokens"], r["mean_surprisal"], r["ppl"])
        for r in LM.lm_score(df.repartition(nparts), model).collect()
    }
    assert base == repart
