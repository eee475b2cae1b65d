"""Property test: duplicated_spans against a trivially-correct pure-Python
reference on random small corpora (same style as test_closure_property /
test_temporal_property). A tiny vocabulary forces dense gram collisions,
boundary-kissing overlaps, and whole-doc coverage — the regimes where the
island merge and the min!=max dup detection could silently diverge."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from xdump_spark.operators.spans import duplicated_spans

K = 3

docs_strategy = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=14),
    min_size=0,
    max_size=6,
)


def _reference_spans(token_docs: list[list[str]], k: int) -> set[tuple]:
    """(doc_id, start, end, span_tokens, n_windows) by direct enumeration."""
    grams: dict[tuple, set[int]] = {}
    for doc_id, toks in enumerate(token_docs):
        for p in range(len(toks) - k + 1):
            grams.setdefault(tuple(toks[p : p + k]), set()).add(doc_id)
    dup = {g for g, ds in grams.items() if len(ds) >= 2}
    out = set()
    for doc_id, toks in enumerate(token_docs):
        cover = [
            (p, p + k)
            for p in range(len(toks) - k + 1)
            if tuple(toks[p : p + k]) in dup
        ]
        cur = None
        for p, e in cover:  # positions ascend; merge islands
            if cur is None or p > cur[1]:
                if cur is not None:
                    out.add((doc_id, cur[0], cur[1], cur[1] - cur[0], cur[2]))
                cur = (p, e, 1)
            else:
                cur = (cur[0], max(cur[1], e), cur[2] + 1)
        if cur is not None:
            out.add((doc_id, cur[0], cur[1], cur[1] - cur[0], cur[2]))
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(token_docs=docs_strategy)
def test_duplicated_spans_matches_python_reference(spark, token_docs):
    want = _reference_spans(token_docs, K)
    rows = [(i, " ".join(toks)) for i, toks in enumerate(token_docs) if toks]
    if not rows:
        return
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens, r.n_windows)
        for r in duplicated_spans(df, k=K).collect()
    }
    assert got == want


def _reference_strip(token_docs: list[list[str]], k: int) -> dict[int, tuple[str, int]]:
    """doc_id -> (rebuilt_text, n_removed) by direct enumeration of the
    owner policy: globally-min (doc_id, pos) occurrence of each cross-doc
    duplicated gram is kept; every token covered by any other occurrence
    is removed."""
    occs: dict[tuple, list[tuple[int, int]]] = {}
    for doc_id, toks in enumerate(token_docs):
        for p in range(len(toks) - k + 1):
            occs.setdefault(tuple(toks[p : p + k]), []).append((doc_id, p))
    out = {}
    removable: dict[int, set[int]] = {}
    for g, lst in occs.items():
        if len({d for d, _ in lst}) < 2:
            continue
        owner = min(lst)
        for d, p in lst:
            if (d, p) != owner:
                removable.setdefault(d, set()).update(range(p, p + k))
    for doc_id, toks in enumerate(token_docs):
        cut = removable.get(doc_id, set())
        kept = [t for i, t in enumerate(toks) if i not in cut]
        out[doc_id] = (" ".join(kept) if cut else " ".join(toks), len(cut))
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(token_docs=docs_strategy)
def test_strip_matches_python_reference(spark, token_docs):
    from xdump_spark.operators.spans import strip_duplicated_spans

    rows = [(i, " ".join(toks)) for i, toks in enumerate(token_docs) if toks]
    if not rows:
        return
    want = _reference_strip(token_docs, K)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.text, r.n_removed_tokens)
        for r in strip_duplicated_spans(df, k=K).collect()
    }
    assert got == {i: want[i] for i in got}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(token_docs=docs_strategy, split=st.integers(0, 6))
def test_incremental_equals_oneshot_restriction(spark, token_docs, split, tmp_path_factory):
    """For ANY corpus and ANY 2-batch split: incremental flags over batch
    2 == one-shot duplicated_spans over the union restricted to batch-2
    docs, and batch-1 flags == one-shot spans over batch 1 alone."""
    from xdump_spark.operators.spans import (
        WindowHashStore,
        duplicated_spans,
        incremental_span_flags,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(token_docs) if toks]
    b1_rows = [r for r in rows if r[0] < split]
    b2_rows = [r for r in rows if r[0] >= split]
    if not b1_rows or not b2_rows:
        return
    df = spark.createDataFrame(rows, "doc_id long, text string")
    b1 = spark.createDataFrame(b1_rows, "doc_id long, text string")
    b2 = spark.createDataFrame(b2_rows, "doc_id long, text string")
    store = WindowHashStore(spark, str(tmp_path_factory.mktemp("ws") / "s"))

    f1 = {(r.doc_id, r.span_start, r.span_end)
          for r in incremental_span_flags(b1, store, k=K).collect()}
    f2 = {(r.doc_id, r.span_start, r.span_end)
          for r in incremental_span_flags(b2, store, k=K).collect()}
    want1 = {(r.doc_id, r.span_start, r.span_end)
             for r in duplicated_spans(b1, k=K).collect()}
    want2 = {(r.doc_id, r.span_start, r.span_end)
             for r in duplicated_spans(df, k=K).collect() if r.doc_id >= split}
    assert f1 == want1 and f2 == want2


line_docs_strategy = st.lists(
    st.lists(  # doc = list of lines
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=3).map(
            lambda ws: " ".join(ws)
        ),
        min_size=0,
        max_size=5,
    ),
    min_size=0,
    max_size=5,
)


def _reference_line_dedup(line_docs):
    """doc_id -> (text, n_removed); global keep-first on trimmed nonblank
    lines, docs with no remaining nonblank text drop."""
    owner = {}
    for did, lines in enumerate(line_docs):
        for idx, l in enumerate(lines):
            t = l.strip()
            if t and t not in owner:
                owner[t] = (did, idx)
    out = {}
    for did, lines in enumerate(line_docs):
        keep, removed = [], 0
        for idx, l in enumerate(lines):
            t = l.strip()
            if t and owner[t] != (did, idx):
                removed += 1
            else:
                keep.append(l)
        text = "\n".join(keep)
        if text.strip():
            out[did] = (text, removed)
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(line_docs=line_docs_strategy)
def test_dedup_lines_matches_python_reference(spark, line_docs):
    from xdump_spark.operators.cleaning import dedup_lines

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(line_docs) if lines]
    if not rows:
        return
    present = {i for i, _ in rows}
    want = {d: v for d, v in _reference_line_dedup(line_docs).items() if d in present}
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.text, r.n_lines_removed) for r in dedup_lines(df).collect()}
    assert got == want
