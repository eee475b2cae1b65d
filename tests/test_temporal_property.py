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
