"""Property tests for curation operators: random inputs checked against
independent pure-Python references (same strategy as
test_closure_property / test_temporal_property)."""

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from xdump_spark.operators.curation import (
    pack_sequences,
    repetition_frame,
    stratified_sample,
)

WORDS = ["a", "b", "c", "dd", "eee"]

doc_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=1, max_size=12),
    min_size=1,
    max_size=12,
)

SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_repetition(toks: list[str]):
    n = len(toks)
    dist = len(set(toks))
    top = max(toks.count(w) for w in set(toks))
    bgs = [f"{toks[i]} {toks[i+1]}" for i in range(n - 1)]
    dup = (1 - len(set(bgs)) / len(bgs)) if bgs else 0.0
    return (n, dist, round(dist / n, 6), round(top / n, 6), round(dup, 6))


@given(doc_strategy)
@settings(**SETTINGS)
def test_repetition_matches_python_reference(spark, docs):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_distinct, r.ttr, r.top_token_frac, r.dup_bigram_frac)
        for r in repetition_frame(df).collect()
    }
    for i, toks in enumerate(docs):
        want = _py_repetition(toks)
        assert got[i] == pytest.approx(want, abs=1e-6), (i, toks)


@given(doc_strategy, st.integers(min_value=2, max_value=30))
@settings(**SETTINGS)
def test_pack_sequences_invariants(spark, docs, budget):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(df, budget=budget, partitions=4).collect()
    packed = sorted(d for r in out for d in r.doc_ids)
    assert packed == list(range(len(docs)))  # exactly-once coverage
    for r in out:
        assert r.n_docs == len(r.doc_ids)
        assert r.total_tokens == sum(len(docs[d]) for d in r.doc_ids)
        # budget respected unless a single doc exceeds it on its own
        assert r.total_tokens <= budget or r.n_docs == 1


@given(st.integers(min_value=1, max_value=500), st.sampled_from([0.0, 0.25, 0.5, 1.0]))
@settings(**SETTINGS)
def test_stratified_sample_matches_python_md5(spark, n, rate):
    df = spark.range(n).select(F.col("id").alias("doc_id"), F.lit("en").alias("lang"))
    got = {r.doc_id for r in stratified_sample(df, {"en": rate}).collect()}
    cut = format(min(65536, int(round(rate * 65536))), "05x")[-4:] if rate < 1.0 else "gggg"
    want = {
        i for i in range(n) if hashlib.md5(str(i).encode()).hexdigest()[:4] < cut
    }
    assert got == want
