"""Property-based closure semantics: compute_closure on random FK graphs
must match an independent pure-Python reachability implementation.

The graph family deliberately contains everything that can go wrong:
a self-FK (recursion), parallel edges to one parent (multi-edge), a
cross-table cycle a→b→c→a (termination), NULL FKs (no phantom keys),
full-table skip, and overlapping multi-seed closures (dedup).
"""

import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings
from pyspark.sql import types as T

from xdump_spark.catalog import Catalog, ForeignKey
from xdump_spark.planner.closure import compute_closure

from .conftest import ids

COLS = {"a": ["parent_id", "b_id", "b2_id"], "b": ["c_id"], "c": ["a_id"]}
EDGES = {
    "a": [("parent_id", "a"), ("b_id", "b"), ("b2_id", "b")],
    "b": [("c_id", "c")],
    "c": [("a_id", "a")],
}
FKS = [
    ForeignKey(t, col, ft, "id")
    for t, es in EDGES.items()
    for col, ft in es
]


@st.composite
def scenario(draw):
    n = {t: draw(st.integers(2, 6)) for t in "abc"}

    def fk(parent_n):
        return draw(st.one_of(st.none(), st.integers(1, parent_n)))

    rows = {
        "a": [(i, fk(n["a"]), fk(n["b"]), fk(n["b"])) for i in range(1, n["a"] + 1)],
        "b": [(i, fk(n["c"])) for i in range(1, n["b"] + 1)],
        "c": [(i, fk(n["a"])) for i in range(1, n["c"] + 1)],
    }
    full = draw(st.sampled_from([(), ("b",), ("c",), ("b", "c")]))
    seeds = {}
    for t in "abc":
        if t in full:
            continue
        s = draw(st.sets(st.integers(1, n[t]), max_size=2))
        if s:
            seeds[t] = sorted(s)
    return rows, seeds, full


def py_closure(rows, seeds, full):
    """Independent reference: plain BFS over materialized rows."""
    byid = {t: {r[0]: dict(zip(COLS[t], r[1:])) for r in rows[t]} for t in "abc"}
    selected = {t: set() for t in "abc"}
    work = []

    def add(t, i):
        if i not in selected[t]:
            selected[t].add(i)
            work.append((t, i))

    for t in full:
        for r in rows[t]:
            add(t, r[0])
    for t, seed_ids in seeds.items():
        for i in seed_ids:
            add(t, i)
    while work:
        t, i = work.pop()
        for col, ft in EDGES[t]:
            v = byid[t][i][col]
            if v is not None and ft not in full:
                add(ft, v)
    return {t: s for t, s in selected.items() if s}


def _schema(table):
    return T.StructType(
        [T.StructField("id", T.IntegerType(), False)]
        + [T.StructField(c, T.IntegerType(), True) for c in COLS[table]]
    )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(scenario())
def test_closure_matches_python_reference(spark, sc):
    rows, seeds, full = sc
    if not seeds and not full:
        return
    tables = {t: spark.createDataFrame(rows[t], _schema(t)) for t in "abc"}
    cat = Catalog(tables, FKS)
    seed_dfs = {
        t: tables[t].filter(tables[t]["id"].isin(seed_ids))
        for t, seed_ids in seeds.items()
    }
    got = compute_closure(cat, full, seed_dfs)
    want = py_closure(rows, seeds, full)
    got_ids = {t: ids(df) for t, df in got.items()}
    assert got_ids == want, f"seeds={seeds} full={full} rows={rows}"


# ---------------------------------------------------------------------------
# pointer-doubling ancestors vs python reachability on random functional
# graphs (each node has at most one parent; cycles allowed)
# ---------------------------------------------------------------------------
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(st.data())
def test_doubling_matches_python_reference(spark, data):
    from xdump_spark.planner.closure import recursive_ancestors_doubling

    n = data.draw(st.integers(2, 16))
    # parent pointer per node: None or any node (self-loops and cycles ok)
    parent = {
        i: data.draw(
            st.one_of(st.none(), st.integers(0, n - 1)), label=f"parent[{i}]"
        )
        for i in range(n)
    }
    seeds = data.draw(
        st.sets(st.integers(0, n - 1), min_size=1, max_size=3), label="seeds"
    )

    want = set(seeds)
    frontier = set(seeds)
    while frontier:
        nxt = {parent[x] for x in frontier if parent[x] is not None} - want
        want |= nxt
        frontier = nxt

    df = spark.createDataFrame(
        [(i, parent[i]) for i in range(n)],
        T.StructType(
            [
                T.StructField("node", T.IntegerType(), False),
                T.StructField("par", T.IntegerType(), True),
            ]
        ),
    )
    cat = Catalog({"g": df}, [ForeignKey("g", "par", "g", "node")])
    got = recursive_ancestors_doubling(
        cat, "g", df.filter(df["node"].isin(list(seeds)))
    )
    assert ids(got, "node") == want, f"parent={parent} seeds={seeds}"
