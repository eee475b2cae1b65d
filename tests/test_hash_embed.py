"""hash_embed_frame: the no-model hashing-trick text embedder — JVM
hash parity, pure-Python reference lockstep, geometry sanity, and the
integration that motivates it (semantic dedup without an encoder)."""

import numpy as np
import pytest

from xdump_spark.operators.text import hash_embed_frame, hash_embed_reference
from xdump_spark.operators.xxh import xxhash64_py

SF = "/root/testdata/sf0.001"


def test_xxhash64_py_published_vectors():
    def u(x):
        return x & ((1 << 64) - 1)

    assert u(xxhash64_py(b"", 0)) == 0xEF46DB3751D8E999
    assert u(xxhash64_py(b"a", 0)) == 0xD24EC4F1A98C6E5B
    assert u(xxhash64_py(b"abc", 0)) == 0x44BC2CF5AD770999


def test_xxhash64_py_matches_spark(spark):
    """The Python twin IS Spark's xxhash64 (seed 42, utf-8 bytes) —
    incl. >=32-byte stripes and unicode."""
    from pyspark.sql import functions as F

    samples = [
        "", "a", "abc", "hello world", "x" * 31, "x" * 32, "x" * 100,
        "naïve café é中文", "the quick brown fox " * 5,
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in samples:
        assert got[s] == xxhash64_py(s.encode("utf-8")), repr(s)


def test_frame_matches_reference_on_real_docs(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(25)
    out = {
        r["doc_id"]: r["embedding"]
        for r in hash_embed_frame(docs, dim=64, k=3).collect()
    }
    for row in docs.select("doc_id", "text").collect():
        ref = hash_embed_reference(row["text"], dim=64, k=3)
        assert np.allclose(out[row["doc_id"]], ref, atol=1e-12), row["doc_id"]


def test_embed_properties(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),   # exact dup
            (3, "the quick brown fox leaps over the lazy dog"),   # near dup
            (4, "completely different subject matter entirely here"),
            (5, "tiny"),                                          # < k words
            (6, "   "),                                           # empty
        ],
        "doc_id long, text string",
    )
    vecs = {
        r["doc_id"]: np.array(r["embedding"])
        for r in hash_embed_frame(docs, dim=128, k=3).collect()
    }
    for i in (1, 2, 3, 4, 5):
        assert abs(np.linalg.norm(vecs[i]) - 1.0) < 1e-9, i
    assert np.linalg.norm(vecs[6]) == 0.0
    cos = lambda a, b: float(vecs[a] @ vecs[b])  # noqa: E731
    assert cos(1, 2) == pytest.approx(1.0)       # exact dup: identical vector
    # one word changed in a 9-word doc keeps 4 of 7 grams: cosine = 4/7
    assert cos(1, 3) == pytest.approx(4 / 7)
    assert cos(1, 3) > 0.5 > abs(cos(1, 4))      # near dup >> unrelated
    # partition invariance + determinism
    again = {
        r["doc_id"]: np.array(r["embedding"])
        for r in hash_embed_frame(docs.repartition(5), dim=128, k=3).collect()
    }
    for i, v in vecs.items():
        assert np.array_equal(v, again[i])
    with pytest.raises(ValueError, match="dim"):
        hash_embed_frame(docs, dim=1)


def test_semantic_dedup_without_external_encoder(spark):
    """The motivating integration: SemDeDup over hash embeddings — no
    model anywhere — drops the lexical near-dup and keeps the rest."""
    from pyspark.sql import functions as F

    from xdump_spark.operators.similarity import semantic_dedup

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox leaps over the lazy dog again and again"),
            (3, "distributed query engines shuffle data between executor stages"),
        ],
        "doc_id long, text string",
    )
    emb = hash_embed_frame(docs, dim=256, k=3)
    flagged = semantic_dedup(
        docs.join(emb, "doc_id"), threshold=0.6, id_col="doc_id",
        n_cells=1, keep="min_id",
    )
    surv = {r["doc_id"] for r in flagged.filter("is_survivor").collect()}
    assert surv == {1, 3}


def test_embed_plan_is_one_arrow_pass(spark):
    """Zero exchanges, one ArrowEvalPython: strings never reach Python."""
    import contextlib
    import io

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        hash_embed_frame(docs).explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan
    # once in the tree, once in the node-detail section
    assert plan.count("+- ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan


def test_curate_hash_embed_cli(spark, tmp_path):
    """r8: curate --doc-dedup semantic --hash-embed DIM — the whole
    semantic-dedup path with zero external inputs."""
    from xdump_spark import cli

    docs = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox leaps over the lazy dog again and again"),
            (3, "distributed query engines shuffle data between executor stages"),
        ],
        "doc_id long, text string",
    ).write.parquet(docs)
    out = str(tmp_path / "out")
    args = cli.build_parser().parse_args([
        "curate", "-i", docs, "-o", out, "--span-k", "0",
        "--min-tokens", "1", "--doc-dedup", "semantic",
        "--semantic-threshold", "0.6", "--semantic-cells", "2",
        "--hash-embed", "256",
    ])
    assert cli.run(args, spark) == 0
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert len(got & {1, 2}) == 1 and 3 in got and len(got) == 2

    with pytest.raises(SystemExit):
        cli.run(cli.build_parser().parse_args([
            "curate", "-i", docs, "-o", out, "--doc-dedup", "semantic",
            "--hash-embed", "256", "--embeddings", docs,
        ]), spark)


def test_pipeline_hash_embed_param(spark, tmp_path):
    """prepare_training_corpus(hash_embed=dim): the vector is computed
    INSIDE the dedup stage on the cleaned text (capitalization noise
    must not change the geometry), and the config int form agrees."""
    import json

    from xdump_spark.config import curate_from_config
    from xdump_spark.pipeline import prepare_training_corpus

    docs = spark.createDataFrame(
        [
            (1, "The   Quick Brown Fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog AGAIN and again"),
            (3, "distributed query engines shuffle data between executor stages"),
        ],
        "doc_id long, text string",
    )
    r = prepare_training_corpus(
        docs, span_k=None, min_tokens=1, doc_dedup="semantic",
        semantic_threshold=0.95, hash_embed=256,
        semantic_kwargs={"n_cells": 2, "keep": "min_id"}, audit=False,
    )
    # after normalization docs 1 and 2 are the same gram multiset
    assert {x.doc_id for x in r.corpus.collect()} == {1, 3}

    src = str(tmp_path / "d.parquet")
    docs.write.parquet(src)
    cfg = tmp_path / "c.json"
    cfg.write_text(json.dumps({
        "input": src, "output": str(tmp_path / "o"),
        "span_k": None, "min_tokens": 1, "doc_dedup": "semantic",
        "semantic_threshold": 0.95, "hash_embed": 256,
        "semantic_kwargs": {"n_cells": 2, "keep": "min_id"},
    }))
    r2 = curate_from_config(spark, str(cfg))
    assert {x.doc_id for x in r2.corpus.collect()} == {1, 3}

    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({
        "input": src, "output": "x", "hash_embed": {"dim": 4},
    }))
    with pytest.raises(ValueError, match="hash_embed"):
        curate_from_config(spark, str(bad))


def test_reference_matches_frame_on_exotic_whitespace(spark):
    """The lockstep contract under the Java-vs-Python whitespace trap:
    NBSP is NOT Java \\s (stays inside a token), \\n is NOT trimmed by
    F.trim — the reference must mirror both."""
    texts = [
        "a b c d",      # NBSP inside what Java sees as one token
        "\nalpha beta\n",    # newlines F.trim keeps, Java \s splits
        " ",            # NBSP-only: a single 1-char token
        " ",                 # space-only: trims to empty -> zero vector
        "x\t y\fz",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["embedding"]
        for r in hash_embed_frame(docs, dim=64, k=2).collect()
    }
    for i, t in enumerate(texts):
        assert np.allclose(
            out[i], hash_embed_reference(t, dim=64, k=2), atol=1e-12
        ), repr(t)
