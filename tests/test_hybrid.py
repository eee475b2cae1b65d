"""Hybrid retrieval: reciprocal-rank fusion hand values, an
independent pure-Python recompute of the full BM25 ⊕ cosine pipeline,
and the three vector-side dispatch paths (exact corpus / IVFIndex /
VectorStore) agreeing when the ANN side is exact."""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pytest
from pyspark.sql import functions as F

from xdump_spark.operators.retrieval import (
    build_text_index,
    hybrid_topk,
    rrf_fuse,
)

# ids shared between the text and vector sides (the curation layout:
# documents.doc_id IS embeddings.vec_id)
DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick quick fox"),
    (3, "lazy dogs sleep all day, lazy and slow"),
    (4, "brown bears eat honey; the bears are brown"),
    (5, "a fox and a dog walk into a bar"),
    (6, "Fox! fox? FOX... fox"),
    (7, "slow loris hangs from the brown branch"),
    (8, "dogs and foxes are distant cousins"),
]
RNG = np.random.RandomState(7)
EMB = {i: RNG.randn(8).tolist() for i, _ in DOCS}


def _q6(x: float) -> float:
    """DECIMAL(20,6) quantization, HALF_UP like Spark's decimal cast."""
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def _py_tokens(s):
    import re

    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


def _py_bm25_ranking(docs, query, depth, k1=1.2, b=0.75):
    """(doc_id, rank) pairs, written from the Robertson definition."""
    toks = {i: _py_tokens(t) for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    qts = _py_tokens(query)
    scores = {}
    for term in set(qts):
        if term not in df:
            continue
        qtf = qts.count(term)
        idf = math.log(1 + (n - df[term] + 0.5) / (df[term] + 0.5))
        for i, ts in toks.items():
            tf = ts.count(term)
            if not tf:
                continue
            dl = len(ts)
            part = qtf * idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * dl / avgdl)
            )
            scores[i] = scores.get(i, 0.0) + _q6(part)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:depth]
    return [(d, r + 1) for r, (d, _) in enumerate(ranked)]


def _py_cosine_ranking(emb, qid, qv, depth):
    qv = np.asarray(qv)
    scored = []
    for i, v in emb.items():
        if i == qid:
            continue
        v = np.asarray(v)
        c = round(float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v))), 6)
        scored.append((i, c))
    scored.sort(key=lambda kv: (-kv[1], kv[0]))
    return [(d, r + 1) for r, (d, _) in enumerate(scored[:depth])]


def _py_rrf(rankings, k, k_rrf=60, weights=None):
    weights = weights or [1.0] * len(rankings)
    acc = {}
    for ranking, w in zip(rankings, weights):
        for d, r in ranking:
            acc[d] = acc.get(d, Decimal(0)) + Decimal(
                repr(w / (k_rrf + r))
            ).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(d, float(s), r + 1) for r, (d, s) in enumerate(ranked)]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.fixture(scope="module")
def emb_df(spark):
    return spark.createDataFrame(
        [(i, v) for i, v in EMB.items()],
        "vec_id long, embedding array<double>",
    )


@pytest.fixture(scope="module")
def queries_df(spark):
    rows = [
        (1, "quick brown fox", EMB[1]),
        (3, "lazy slow dogs", EMB[3]),
    ]
    return spark.createDataFrame(
        rows, "query_id long, query string, embedding array<double>"
    )


def _fused_rows(df):
    return [
        (r.query_id, r.doc_id, r.rrf_score, r.rnk)
        for r in df.orderBy("query_id", "rnk").collect()
    ]


# ---------------------------------------------------------------- rrf_fuse


def test_rrf_hand_values(spark):
    """Two tiny rankings, fusion checked against hand math."""
    a = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)],
        "query_id int, doc_id int, rnk int",
    )
    b = spark.createDataFrame(
        [(0, 11, 1), (0, 13, 2)], "query_id int, doc_id int, rn int"
    )
    out = _fused_rows(rrf_fuse([a, b], k=10))
    exp = _py_rrf(
        [[(10, 1), (11, 2), (12, 3)], [(11, 1), (13, 2)]], k=10
    )
    # doc 11 appears in both lists: 1/62 + 1/61; others single-list
    assert out == [(0, d, s, r) for d, s, r in exp]
    assert out[0][1] == 11
    assert out[0][2] == pytest.approx(_q6(1 / 62) + _q6(1 / 61))


def test_rrf_weights_flip_the_winner(spark):
    a = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2)], "query_id int, doc_id int, rnk int"
    )
    b = spark.createDataFrame(
        [(0, 11, 1), (0, 10, 2)], "query_id int, doc_id int, rnk int"
    )
    even = _fused_rows(rrf_fuse([a, b], k=1))
    # symmetric lists → tie → doc_id asc tie-break
    assert even[0][1] == 10
    weighted = _fused_rows(rrf_fuse([a, b], k=1, weights=[1.0, 5.0]))
    assert weighted[0][1] == 11


def test_rrf_absent_doc_contributes_zero(spark):
    a = spark.createDataFrame(
        [(0, 10, 1)], "query_id int, doc_id int, rnk int"
    )
    b = spark.createDataFrame(
        [(1, 20, 1)], "query_id int, doc_id int, rnk int"
    )
    out = _fused_rows(rrf_fuse([a, b], k=5))
    # disjoint query ids: each fuses alone, no cross-query bleed
    assert out == [
        (0, 10, _q6(1 / 61), 1),
        (1, 20, _q6(1 / 61), 1),
    ]


def test_rrf_partition_invariance(spark):
    a = spark.createDataFrame(
        [(q, d, r) for q in range(4) for r, d in enumerate(
            [30 + q, 40 + q, 50 + q], start=1
        )],
        "query_id int, doc_id int, rnk int",
    )
    b = spark.createDataFrame(
        [(q, 40 + q, 1) for q in range(4)],
        "query_id int, doc_id int, rnk int",
    )
    one = _fused_rows(rrf_fuse([a, b], k=3))
    many = _fused_rows(rrf_fuse([a.repartition(13), b.repartition(7)], k=3))
    assert one == many


def test_rrf_validation(spark):
    a = spark.createDataFrame(
        [(0, 10, 1)], "query_id int, doc_id int, rnk int"
    )
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
    with pytest.raises(ValueError, match="weights"):
        rrf_fuse([a, a], weights=[1.0])
    with pytest.raises(ValueError, match="rank_cols"):
        rrf_fuse([a, a], rank_cols=["rnk"])
    no_rank = a.select("query_id", "doc_id")
    with pytest.raises(ValueError, match="no rnk/rn/rank"):
        rrf_fuse([no_rank])
    no_id = a.select("query_id", "rnk")
    with pytest.raises(ValueError, match="doc_id"):
        rrf_fuse([no_id])


# ------------------------------------------------------------- hybrid_topk


def test_hybrid_matches_pure_python(spark, docs_df, emb_df, queries_df):
    """Full pipeline vs an independent recompute: BM25 depth-ranking ⊕
    exact cosine depth-ranking → RRF, per query."""
    idx = build_text_index(docs_df)
    out = _fused_rows(
        hybrid_topk(idx, emb_df, queries_df, k=4, depth=6)
    )
    exp = []
    for qid, qtext in ((1, "quick brown fox"), (3, "lazy slow dogs")):
        bm = _py_bm25_ranking(DOCS, qtext, depth=6)
        vs = _py_cosine_ranking(EMB, qid, EMB[qid], depth=6)
        exp.extend((qid, d, s, r) for d, s, r in _py_rrf([bm, vs], k=4))
    assert out == sorted(exp, key=lambda t: (t[0], t[3]))


def test_hybrid_weights_passthrough(spark, docs_df, emb_df, queries_df):
    idx = build_text_index(docs_df)
    out = _fused_rows(
        hybrid_topk(idx, emb_df, queries_df, k=4, depth=6, weights=(0.25, 2.0))
    )
    exp = []
    for qid, qtext in ((1, "quick brown fox"), (3, "lazy slow dogs")):
        bm = _py_bm25_ranking(DOCS, qtext, depth=6)
        vs = _py_cosine_ranking(EMB, qid, EMB[qid], depth=6)
        exp.extend(
            (qid, d, s, r)
            for d, s, r in _py_rrf([bm, vs], k=4, weights=[0.25, 2.0])
        )
    assert out == sorted(exp, key=lambda t: (t[0], t[3]))


def test_hybrid_ivf_index_full_probe_equals_exact(
    spark, docs_df, emb_df, queries_df
):
    """IVFIndex at n_probe == n_cells is exact, so the hybrid result
    must equal the exact-corpus dispatch bit-for-bit."""
    from xdump_spark.operators.similarity import ivf_build

    idx = build_text_index(docs_df)
    ivf = ivf_build(emb_df, n_cells=2)
    exact = _fused_rows(hybrid_topk(idx, emb_df, queries_df, k=4, depth=6))
    via_ivf = _fused_rows(
        hybrid_topk(idx, ivf, queries_df, k=4, depth=6, n_probe=2)
    )
    assert via_ivf == exact


def test_hybrid_vector_store_full_probe_equals_exact(
    spark, docs_df, emb_df, queries_df, tmp_path
):
    """A VectorStore holding the whole corpus (high threshold → all
    accepted), searched at full probe, is the exact vector side."""
    from xdump_spark.operators.incremental import (
        VectorStore,
        incremental_semantic_dedup,
    )

    store = VectorStore(spark, str(tmp_path / "vs"))
    r = incremental_semantic_dedup(
        emb_df, store, threshold=0.9999, n_cells=2
    )
    assert r.accepted.count() == len(DOCS)
    idx = build_text_index(docs_df)
    exact = _fused_rows(hybrid_topk(idx, emb_df, queries_df, k=4, depth=6))
    via_store = _fused_rows(
        hybrid_topk(idx, store, queries_df, k=4, depth=6, n_probe=2)
    )
    assert via_store == exact


# -------------------------------------------------------------- mmr_rerank


def _py_mmr(cands, k, lam):
    """Independent greedy MMR written from the Carbonell/Goldstein
    definition. cands: {doc_id: (rel, vec)}."""
    ids = sorted(cands)
    V = {i: np.asarray(cands[i][1], dtype=np.float64) for i in ids}
    for i in ids:
        n = np.linalg.norm(V[i])
        V[i] = V[i] / (n if n else 1.0)
    max_sim = {i: 0.0 for i in ids}
    out, remaining = [], set(ids)
    for _ in range(min(k, len(ids))):
        best, best_v = None, None
        for i in ids:  # ascending id = deterministic tie-break
            if i not in remaining:
                continue
            v = lam * cands[i][0] - (1 - lam) * max_sim[i]
            if best is None or v > best_v:
                best, best_v = i, v
        out.append((best, best_v))
        remaining.discard(best)
        for i in ids:
            max_sim[i] = max(max_sim[i], float(V[i] @ V[best]))
    return [(d, s, r + 1) for r, (d, s) in enumerate(out)]


def test_mmr_matches_pure_python(spark, emb_df):
    from xdump_spark.operators.retrieval import mmr_rerank

    hits = spark.createDataFrame(
        [(0, d, 1.0 - 0.05 * d) for d in range(1, 9)]
        + [(1, d, 0.9 - 0.03 * d) for d in range(2, 7)],
        "query_id long, doc_id long, rrf_score double",
    )
    got = [
        (r.query_id, r.doc_id, r.mmr_score, r.rnk)
        for r in mmr_rerank(hits, emb_df, k=4, lam=0.7)
        .orderBy("query_id", "rnk").collect()
    ]
    exp = []
    for q, lo, hi, base, slope in ((0, 1, 9, 1.0, 0.05), (1, 2, 7, 0.9, 0.03)):
        cands = {d: (base - slope * d, EMB[d]) for d in range(lo, hi)}
        exp.extend((q, d, s, r) for d, s, r in _py_mmr(cands, k=4, lam=0.7))
    assert len(got) == len(exp)
    for (gq, gd, gs, gr), (eq, ed, es, er) in zip(got, exp):
        assert (gq, gd, gr) == (eq, ed, er)
        assert gs == pytest.approx(es, abs=1e-12)


def test_mmr_lam_one_reproduces_relevance_ranking(spark, emb_df):
    from xdump_spark.operators.retrieval import mmr_rerank

    hits = spark.createDataFrame(
        [(0, d, 10.0 - d) for d in range(1, 9)],
        "query_id long, doc_id long, rrf_score double",
    )
    out = mmr_rerank(hits, emb_df, k=5, lam=1.0).orderBy("rnk").collect()
    assert [r.doc_id for r in out] == [1, 2, 3, 4, 5]
    assert [r.mmr_score for r in out] == [9.0, 8.0, 7.0, 6.0, 5.0]


def test_mmr_diversifies_near_duplicates(spark):
    """Two near-identical top docs: MMR at λ=0.5 keeps one and promotes
    the orthogonal doc over the paraphrase."""
    from xdump_spark.operators.retrieval import mmr_rerank

    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.999, 0.01]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    hits = spark.createDataFrame(
        [(0, 1, 1.0), (0, 2, 0.99), (0, 3, 0.5)],
        "query_id long, doc_id long, rrf_score double",
    )
    out = mmr_rerank(hits, vecs, k=2, lam=0.5).orderBy("rnk").collect()
    assert [r.doc_id for r in out] == [1, 3]


def test_mmr_partition_invariance_and_validation(spark, emb_df):
    from xdump_spark.operators.retrieval import mmr_rerank

    hits = spark.createDataFrame(
        [(q, d, 1.0 / (q + d + 1)) for q in range(3) for d in range(1, 8)],
        "query_id long, doc_id long, rrf_score double",
    )
    one = [
        tuple(r) for r in mmr_rerank(hits, emb_df, k=3)
        .orderBy("query_id", "rnk").collect()
    ]
    many = [
        tuple(r) for r in mmr_rerank(
            hits.repartition(7), emb_df.repartition(5), k=3
        ).orderBy("query_id", "rnk").collect()
    ]
    assert one == many
    with pytest.raises(ValueError, match="lam"):
        mmr_rerank(hits, emb_df, lam=1.5)
    # candidates without vectors drop out (cannot join the diversity term)
    missing = spark.createDataFrame(
        [(0, 999, 5.0), (0, 1, 1.0)],
        "query_id long, doc_id long, rrf_score double",
    )
    out = mmr_rerank(missing, emb_df, k=2).collect()
    assert [r.doc_id for r in out] == [1]


def test_mmr_composes_with_hybrid(spark, docs_df, emb_df, queries_df):
    from xdump_spark.operators.retrieval import (
        build_text_index,
        hybrid_topk,
        mmr_rerank,
    )

    idx = build_text_index(docs_df)
    hits = hybrid_topk(idx, emb_df, queries_df, k=6, depth=8)
    out = mmr_rerank(hits, emb_df, k=3, lam=0.8)
    rows = out.orderBy("query_id", "rnk").collect()
    assert out.columns == ["query_id", "doc_id", "mmr_score", "rnk"]
    assert {r.query_id for r in rows} == {1, 3}
    for q in (1, 3):
        assert [r.rnk for r in rows if r.query_id == q] == [1, 2, 3]


def test_hybrid_depth_defaults_and_clamps(spark, docs_df, emb_df, queries_df):
    idx = build_text_index(docs_df)
    # depth < k clamps to k; default depth = max(2k, 10)
    a = _fused_rows(hybrid_topk(idx, emb_df, queries_df, k=4, depth=2))
    b = _fused_rows(hybrid_topk(idx, emb_df, queries_df, k=4, depth=4))
    assert a == b
    out = hybrid_topk(idx, emb_df, queries_df, k=3)
    assert out.columns == ["query_id", "doc_id", "rrf_score", "rnk"]
    assert out.groupBy("query_id").count().agg(F.max("count")).first()[0] <= 3
