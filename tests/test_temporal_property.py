"""Property tests for the temporal operators against independent pure-
Python references (the same style as test_closure_property.py): random
inputs, exact expected output computed by a trivially-correct loop."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from xdump_spark.operators.temporal import asof_join, point_in_interval_join

events = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=0, max_size=25
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lrows=events, rrows=events)
def test_asof_join_matches_python_reference(spark, lrows, rrows):
    # right rows get distinct (group, time) pairs — tie survival among
    # identical keys is documented as unspecified
    rrows = list({(u, t): (u, t) for u, t in rrows}.values())
    left = [(i, u, t) for i, (u, t) in enumerate(lrows)]
    right = [(u, t, float(t * 10 + u)) for u, t in rrows]

    expect = {}
    for i, u, t in left:
        best = None
        for ru, rt, rv in right:
            if ru == u and rt <= t and (best is None or rt > best[0]):
                best = (rt, rv)
        expect[i] = best or (None, None)

    if not left:
        return
    ldf = spark.createDataFrame(left, "event_id long, user_id long, t long")
    rdf = (
        spark.createDataFrame(right, "user_id long, t long, value double")
        if right
        else spark.createDataFrame([], "user_id long, t long, value double")
    )
    got = {
        r.event_id: (r.r_t, r.r_value)
        for r in asof_join(ldf, rdf, on="t", by=["user_id"]).collect()
    }
    assert got == expect


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pts=st.lists(st.integers(-20, 120), min_size=0, max_size=20),
    ivs=st.lists(
        st.tuples(st.integers(-20, 120), st.integers(0, 40)), min_size=0, max_size=10
    ),
    bin_width=st.sampled_from([1, 3, 7, 100]),
)
def test_range_join_matches_python_reference(spark, pts, ivs, bin_width):
    intervals = [(i, s, s + span) for i, (s, span) in enumerate(ivs)]
    expect = sorted(
        (p, iid) for p in pts for iid, s, e in intervals if s <= p <= e
    )
    if not pts or not intervals:
        return
    pdf = spark.createDataFrame([(p,) for p in pts], "p long")
    idf = spark.createDataFrame(intervals, "iid long, s long, e long")
    got = sorted(
        (r.p, r.iid)
        for r in point_in_interval_join(pdf, idf, "p", "s", "e", bin_width).collect()
    )
    assert got == expect


def test_asof_join_null_by_key_never_matches(spark):
    """NULL group keys never match (DuckDB ASOF equality semantics): a
    NULL-keyed left row must NOT receive a NULL-keyed right row's payload
    — but it stays in the output (left join)."""
    ldf = spark.createDataFrame(
        [(1, None, 10), (2, 7, 10)], "event_id long, user_id long, t long"
    )
    rdf = spark.createDataFrame(
        [(None, 5, 1.0), (7, 5, 2.0)], "user_id long, t long, value double"
    )
    got = {r.event_id: r.r_value for r in asof_join(ldf, rdf, on="t", by=["user_id"]).collect()}
    assert got == {1: None, 2: 2.0}


def test_range_join_exact_bins_beyond_2_53(spark):
    """Nanosecond-magnitude epochs (> 2^53): bin ids must use exact
    integer arithmetic — double division would misalign bins. The pair
    set must equal the trivially-correct loop."""
    base = 1 << 54
    pts = [(i, base + v) for i, v in enumerate([1, 3, 5, 6, 7, 1001, 1002])]
    ivs = [(j, base + s, base + e) for j, (s, e) in enumerate([(3, 6), (0, 1), (1000, 1002)])]
    expect = {
        (i, j) for i, p in pts for j, s, e in ivs if s <= p <= e
    }
    pdf = spark.createDataFrame(pts, "pid long, t long")
    idf = spark.createDataFrame(ivs, "iid long, s long, e long")
    out = point_in_interval_join(pdf, idf, "t", "s", "e", bin_width=4)
    got = {(r.pid, r.iid) for r in out.collect()}
    assert got == expect
    # bin column must be exact: 2^54 div 4 is representable, (2^54+2)/4.0 is not
    assert len(got) == len(out.collect())
