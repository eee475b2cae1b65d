"""Corpus snapshot diff: status semantics, null handling, and the
no-text-shuffle plan contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xdump_spark.operators.diff import corpus_diff, diff_summary

OLD = [
    (1, "alpha", "en"),
    (2, "beta", "en"),
    (3, "gamma", "de"),
    (4, None, "en"),
    (5, "epsilon", None),
]
NEW = [
    (1, "alpha", "en"),        # unchanged -> excluded
    (2, "beta v2", "en"),      # text changed
    (4, "delta", "en"),        # None -> value is a change
    (5, "epsilon", "fr"),      # second column changed
    (6, "zeta", "en"),         # added
]  # 3 removed


@pytest.fixture(scope="module")
def frames(spark):
    old = spark.createDataFrame(OLD, "doc_id int, text string, lang string")
    new = spark.createDataFrame(NEW, "doc_id int, text string, lang string")
    return old, new


def test_statuses(spark, frames):
    old, new = frames
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {2: "changed", 3: "removed", 4: "changed", 5: "changed", 6: "added"}


def test_compare_cols_subset(spark, frames):
    old, new = frames
    got = {
        r["doc_id"]: r["status"]
        for r in corpus_diff(old, new, compare_cols=["text"]).collect()
    }
    # lang-only change (5) disappears when only text is compared
    assert got == {2: "changed", 3: "removed", 4: "changed", 6: "added"}


def test_null_not_aliased_across_columns(spark):
    """(NULL, 'a') vs ('a', NULL) must be 'changed' — the reason the
    fingerprint seeds per column instead of hashing columns jointly."""
    old = spark.createDataFrame([(1, None, "a")], "doc_id int, a string, b string")
    new = spark.createDataFrame([(1, "a", None)], "doc_id int, a string, b string")
    assert corpus_diff(old, new).collect()[0]["status"] == "changed"


def test_identical_snapshots_empty(spark, frames):
    old, _ = frames
    assert corpus_diff(old, old).count() == 0


def test_summary_counts(spark, frames):
    old, new = frames
    got = {r["status"]: r["n"] for r in diff_summary(old, new).collect()}
    assert got == {"changed": 3, "removed": 1, "added": 1}


def test_text_never_shuffles(spark, frames):
    """The join input is (id, h1, h2) only — the plan's exchanges must
    not carry the text column."""
    old, new = frames
    plan = corpus_diff(old, new)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # the only occurrences of 'text' should be below the project, inside
    # the hash computation; the exchange output schema carries _h1/_h2
    assert "_h1" in plan and "_h2" in plan


def test_duckdb_crosscheck(spark, frames):
    """Independent DuckDB recomputation by direct value comparison."""
    import duckdb

    old, new = frames
    con = duckdb.connect()
    con.register("o", old.toPandas())
    con.register("n", new.toPandas())
    want = {
        (r[0], r[1])
        for r in con.sql(
            """
            SELECT coalesce(o.doc_id, n.doc_id) AS id,
                   CASE WHEN n.doc_id IS NULL THEN 'removed'
                        WHEN o.doc_id IS NULL THEN 'added'
                        ELSE 'changed' END AS status
            FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
            WHERE n.doc_id IS NULL OR o.doc_id IS NULL
               OR (o.text IS DISTINCT FROM n.text)
               OR (o.lang IS DISTINCT FROM n.lang)
            """
        ).fetchall()
    }
    got = {(r["doc_id"], r["status"]) for r in corpus_diff(old, new).collect()}
    assert got == want
