"""Corpus sink tests: partition layout, file sizing, and roundtrip."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from xdump_spark.sources.corpus_sink import write_corpus

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def test_partitioned_write_roundtrip(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path / "corpus")
    write_corpus(docs, out, partition_by=("lang",))
    # hive layout: one directory per language
    dirs = {os.path.basename(p) for p in glob.glob(f"{out}/lang=*")}
    assert dirs == {f"lang={r.lang}" for r in docs.select("lang").distinct().collect()}
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # full content roundtrip (lang comes back as a partition column)
    want = {tuple(r) for r in docs.select("doc_id", "text", "lang").collect()}
    got = {tuple(r) for r in back.select("doc_id", "text", "lang").collect()}
    assert got == want


def test_unpartitioned_write_controls_file_count(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path / "flat")
    # tiny input, default 128MB target → ONE data file, not one per core
    write_corpus(docs, out)
    files = glob.glob(f"{out}/part-*.parquet")
    assert len(files) == 1
    assert spark.read.parquet(out).count() == docs.count()


def test_small_target_splits_files(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path / "split")
    # force a sub-file-size target: file budget must exceed 1
    write_corpus(docs, out, target_file_mb=1)
    n_bytes = sum(os.path.getsize(p) for p in glob.glob(f"{SF_DIR}/documents.parquet"))
    files = glob.glob(f"{out}/part-*.parquet")
    assert len(files) >= 1
    if n_bytes > 1024 * 1024:
        assert len(files) > 1


def test_mode_is_honored(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(5)
    out = str(tmp_path / "m")
    write_corpus(docs, out)
    with pytest.raises(Exception):
        write_corpus(docs, out)  # errorifexists default
    write_corpus(docs, out, mode="overwrite")
    assert spark.read.parquet(out).count() == 5
