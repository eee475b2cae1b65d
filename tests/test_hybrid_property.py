"""Property tests for reciprocal-rank fusion: random rankings checked
against an independent pure-Python reference (the house strategy of
test_curation_property / test_closure_property), plus the structural
invariances RRF must satisfy."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from xdump_spark.operators.retrieval import rrf_fuse

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# a "ranking" = per query, an ordered list of distinct doc ids
ranking_strategy = st.lists(  # list of rankings (one per retriever)
    st.dictionaries(  # query_id -> ranked doc ids
        st.integers(min_value=0, max_value=3),
        st.lists(
            st.integers(min_value=0, max_value=30),
            min_size=1, max_size=10, unique=True,
        ),
        min_size=1, max_size=3,
    ),
    min_size=1, max_size=3,
)


def _q6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def _py_rrf(rankings, k, k_rrf=60, weights=None):
    weights = weights or [1.0] * len(rankings)
    queries = {q for r in rankings for q in r}
    out = []
    for q in sorted(queries):
        acc: dict[int, Decimal] = {}
        for ranking, w in zip(rankings, weights):
            for rank, d in enumerate(ranking.get(q, []), start=1):
                acc[d] = acc.get(d, Decimal(0)) + Decimal(
                    repr(w / (k_rrf + rank))
                ).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out.extend(
            (q, d, float(s), r + 1) for r, (d, s) in enumerate(ranked)
        )
    return out


def _to_frames(spark, rankings):
    frames = []
    for ranking in rankings:
        rows = [
            (q, d, rank)
            for q, docs in ranking.items()
            for rank, d in enumerate(docs, start=1)
        ]
        frames.append(
            spark.createDataFrame(rows, "query_id int, doc_id int, rnk int")
        )
    return frames


def _collect(df):
    return [
        (r.query_id, r.doc_id, r.rrf_score, r.rnk)
        for r in df.orderBy("query_id", "rnk").collect()
    ]


@given(ranking_strategy, st.integers(min_value=1, max_value=8))
@settings(**SETTINGS)
def test_rrf_matches_reference(spark, rankings, k):
    got = _collect(rrf_fuse(_to_frames(spark, rankings), k=k))
    assert got == _py_rrf(rankings, k=k)


@given(ranking_strategy)
@settings(**SETTINGS)
def test_rrf_list_permutation_invariant(spark, rankings):
    """Fusing [A, B, C] equals fusing [C, A, B] under equal weights —
    RRF is a sum over lists."""
    a = _collect(rrf_fuse(_to_frames(spark, rankings), k=5))
    rotated = rankings[1:] + rankings[:1]
    b = _collect(rrf_fuse(_to_frames(spark, rotated), k=5))
    assert a == b
