"""Chunking: exact fixed-stride values (DuckDB cross-checked), sentence
soft-budget semantics, coverage/overlap invariants, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xdump_spark.operators.chunking import (
    chunk_sentences,
    chunk_tokens,
    split_sentences,
)

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r.doc_id, r.chunk_idx, r.chunk_text, r.n_tokens) for r in df.collect()
    )


def test_chunk_tokens_exact_small(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x y"), (3, "   ")],
        "doc_id long, text string",
    )
    got = _rows(chunk_tokens(df, max_tokens=3, overlap=1))
    assert got == [
        (1, 0, "a b c", 3),
        (1, 1, "c d e", 3),
        (1, 2, "e f g", 3),
        (2, 0, "x y", 2),
        # doc 3 is empty -> no rows
    ]
    # overlap=0: disjoint cover
    got0 = _rows(chunk_tokens(df, max_tokens=3, overlap=0))
    assert got0 == [
        (1, 0, "a b c", 3),
        (1, 1, "d e f", 3),
        (1, 2, "g", 1),
        (2, 0, "x y", 2),
    ]
    with pytest.raises(ValueError, match="overlap"):
        chunk_tokens(df, max_tokens=3, overlap=3)


def test_chunk_tokens_invariants_real_docs(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(80)
    mt, ov = 32, 8
    chunks = chunk_tokens(docs, max_tokens=mt, overlap=ov).collect()
    by_doc: dict = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    toks = {
        r.doc_id: r.text.split()
        for r in docs.select("doc_id", "text").collect()
        if r.text.strip()
    }
    assert set(by_doc) == set(toks)
    for d, rs in by_doc.items():
        rs.sort(key=lambda r: r.chunk_idx)
        ref = toks[d]
        for i, r in enumerate(rs):
            start = i * (mt - ov)
            assert r.chunk_text.split() == ref[start : start + mt], (d, i)
        # coverage: last chunk reaches the final token
        assert (len(rs) - 1) * (mt - ov) + len(rs[-1].chunk_text.split()) >= len(ref)


def test_chunk_tokens_matches_duckdb(spark):
    """Independent recomputation of the fixed-stride chunker in DuckDB
    over the same parquet (the repo's oracle style)."""
    import duckdb

    mt, ov, stride = 16, 4, 12
    got = _rows(
        chunk_tokens(
            spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50),
            max_tokens=mt, overlap=ov,
        )
    )
    con = duckdb.connect()
    want = con.execute(f"""
        WITH d AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
          FROM (SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')
                ORDER BY doc_id LIMIT 50)
          WHERE length(trim(text)) > 0
        ), c AS (
          SELECT doc_id, t,
                 unnest(generate_series(0,
                   CASE WHEN len(t) <= {mt} THEN 0
                        ELSE CAST(ceil((len(t) - {mt}) / {stride}.0) AS INT)
                   END)) AS chunk_idx
          FROM d
        ), s AS (
          SELECT doc_id, chunk_idx,
                 list_slice(t, chunk_idx*{stride} + 1, chunk_idx*{stride} + {mt}) AS ts
          FROM c
        )
        SELECT doc_id, chunk_idx, array_to_string(ts, ' '), len(ts)
        FROM s ORDER BY doc_id, chunk_idx
    """).fetchall()
    assert got == sorted((a, b, c, d) for a, b, c, d in want)


def test_split_sentences_and_soft_budget(spark):
    text = (
        "First sentence here. Second one follows! Third asks a question? "
        "Fourth (quoted.) Ends now.\nNewline starts the fifth."
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    sents = df.select(split_sentences(F.col("text")).alias("s")).collect()[0].s
    assert sents == [
        "First sentence here.", "Second one follows!",
        "Third asks a question?", "Fourth (quoted.)", "Ends now.",
        "Newline starts the fifth.",
    ]

    out = sorted(
        (r.chunk_idx, r.chunk_text, r.n_tokens)
        for r in chunk_sentences(df, max_tokens=6).collect()
    )
    # sentences never split; chunks fill to >= budget then roll over
    joined = " ".join(c for _, c, _ in out)
    assert joined.split() == text.split()
    assert [i for i, _, _ in out] == list(range(len(out)))
    for _, c, n in out:
        assert n == len(c.split())
    # soft budget: every chunk except the last STARTED under budget
    for i in range(len(out) - 1):
        sent_counts = out[i][2]
        assert sent_counts < 6 + max(len(s.split()) for s in sents)


def test_chunk_sentences_mega_sentence_and_invariance(spark):
    mega = "word " * 50  # one 50-token "sentence", no boundaries
    df = spark.createDataFrame(
        [(1, mega), (2, "Tiny one. Tiny two. Tiny three.")],
        "doc_id long, text string",
    )
    out = chunk_sentences(df, max_tokens=8)
    rows = _rows(out)
    assert [r for r in rows if r[0] == 1] == [(1, 0, mega.strip(), 50)]
    # partition invariance: same rows under a different layout
    assert rows == _rows(chunk_sentences(df.repartition(7), max_tokens=8))


def test_chunk_tokens_plan_no_exchange(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = (
        chunk_tokens(docs, max_tokens=64, overlap=16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
