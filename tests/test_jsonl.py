"""JSONL corpus source tests (sources/jsonl.py): dirty-data quarantine,
round-trips with the real documents table, and compression."""

import gzip
import json
import os

import pytest

from xdump_spark.sources.jsonl import (
    DOCUMENTS_SCHEMA,
    read_jsonl_corpus,
    write_jsonl_corpus,
)


def test_read_quarantines_malformed_lines(spark, tmp_path):
    p = str(tmp_path / "docs.jsonl")
    lines = [
        json.dumps({"doc_id": 1, "text": "hello world", "lang": "en",
                    "source": "web", "n_chars": 11}),
        "this is not json at all {{{",
        json.dumps({"doc_id": 2, "text": "zweite zeile", "lang": "de",
                    "source": "web", "n_chars": 12}),
        json.dumps({"completely": "wrong-shape"}),   # valid JSON, no schema cols
    ]
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    clean, corrupt = read_jsonl_corpus(spark, p)
    got = {r.doc_id: r.text for r in clean.collect()}
    assert got == {1: "hello world", 2: "zweite zeile"}
    assert clean.columns == [f.name for f in DOCUMENTS_SCHEMA]
    bad = [r.line for r in corrupt.collect()]
    assert len(bad) == 2
    # the quarantine carries the ORIGINAL lines verbatim — both the
    # unparsable one and the valid-JSON wrong-shape one
    assert "this is not json at all {{{" in bad
    assert json.dumps({"completely": "wrong-shape"}) in bad


def test_roundtrip_real_documents(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "corpus_jsonl")
    write_jsonl_corpus(docs, out)
    clean, corrupt = read_jsonl_corpus(spark, out)
    assert corrupt.count() == 0
    assert clean.count() == docs.count()
    # value-level round-trip on a sample doc
    a = {r.doc_id: r.text for r in docs.filter("doc_id < 20").collect()}
    b = {r.doc_id: r.text for r in clean.filter("doc_id < 20").collect()}
    assert a == b


def test_write_partitioned_and_compressed(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "by_lang")
    write_jsonl_corpus(docs, out, partition_by=("lang",), compression="gzip")
    subdirs = [d for d in os.listdir(out) if d.startswith("lang=")]
    assert len(subdirs) >= 2
    # files are actually gzip
    part = next(
        os.path.join(out, subdirs[0], f)
        for f in os.listdir(os.path.join(out, subdirs[0]))
        if f.endswith(".gz")
    )
    with gzip.open(part, "rt") as fh:
        row = json.loads(fh.readline())
    assert "text" in row and "lang" not in row  # partition col not in payload
    clean, _ = read_jsonl_corpus(spark, out)
    # partition column comes back from the directory layout
    assert clean.count() == docs.count()


def test_read_requires_no_inference_pass(spark, tmp_path):
    """The reader must use the EXPLICIT schema — a file whose first lines
    are corrupt would poison inference; with the fixed schema they land
    in quarantine instead."""
    p = str(tmp_path / "poison.jsonl")
    with open(p, "w") as f:
        f.write("garbage{\n" * 5)
        f.write(json.dumps({"doc_id": 7, "text": "ok", "lang": "en",
                            "source": "s", "n_chars": 2}) + "\n")
    clean, corrupt = read_jsonl_corpus(spark, p)
    assert [r.doc_id for r in clean.collect()] == [7]
    assert corrupt.count() == 5


def test_partitioned_write_respects_file_budget(spark, tmp_path):
    """The row-identity bucket: a partitioned write with a small file
    target must produce MULTIPLE data files inside a big partition dir,
    not one giant file per partition value."""
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    out = str(tmp_path / "bucketed")
    write_jsonl_corpus(docs, out, partition_by=("lang",), target_file_mb=0.2)
    import collections

    per_dir = collections.Counter()
    for d in os.listdir(out):
        if d.startswith("lang="):
            per_dir[d] = len(
                [f for f in os.listdir(os.path.join(out, d)) if f.startswith("part-")]
            )
    assert max(per_dir.values()) > 1, per_dir
