"""README examples stay runnable (r10 verdict #7): the surface grew
large enough that doc rot is a real failure mode. Two gates:

* every ``python`` block in README.md EXECUTES, in order, in one shared
  namespace against the real driver testdata — placeholder paths
  (``/data/...``, ``subset.zip``) are rewritten to a tmp dir and the
  handful of free variables the later blocks assume (``eval_docs``,
  ``store``, ``queries``, ...) are bound by a prelude to small real
  frames/stores, so the statements themselves run verbatim;
* every ``xdump-spark`` command in the ``bash`` blocks PARSES against
  the real argparse parser (flag renames/removals are the common doc
  rot; inputs are placeholders, so execution is out of scope here —
  the CLI e2e tests own that).
"""

from __future__ import annotations

import re
import shlex
from pathlib import Path

import pytest

README = Path(__file__).resolve().parent.parent / "README.md"


def _blocks(lang: str) -> list[str]:
    text = README.read_text()
    return re.findall(rf"```{lang}\n(.*?)```", text, flags=re.DOTALL)


def test_readme_python_blocks_execute(spark, tmp_path):
    blocks = _blocks("python")
    assert len(blocks) >= 4, "README lost its python examples?"

    # the later blocks reference names introduced conversationally in
    # the prose; bind them to small REAL objects so the example
    # statements run unmodified
    from pyspark.sql import functions as F

    from xdump_spark.operators.incremental import (
        ExactHashStore,
        SignatureStore,
        VectorStore,
        content_hashes,
        incremental_semantic_dedup,
    )
    from xdump_spark.operators.retrieval import (
        build_text_index,
        save_text_index,
    )
    from xdump_spark.operators.text import hash_embed_frame

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb_frame = hash_embed_frame(docs.limit(60), dim=32).select(
        F.col("doc_id").alias("vec_id"), F.col("embedding")
    )
    vstore = VectorStore(spark, str(tmp_path / "vs"))
    incremental_semantic_dedup(
        emb_frame, vstore, threshold=0.95, n_cells=4
    )
    save_text_index(build_text_index(docs.limit(60)), str(tmp_path / "tidx"))
    sstore = SignatureStore(spark, str(tmp_path / "sig"))
    import uuid

    hstore = ExactHashStore(
        spark, f"readme_docs_hashes_{uuid.uuid4().hex[:8]}",
        path=str(tmp_path / "hashes"),
    )
    hstore.append(content_hashes(docs.limit(20)).select("h1", "h2"))

    ns = {
        "spark": spark,
        "eval_docs": docs.limit(5),
        "emb": emb_frame,
        "store": vstore,
        "queries": emb_frame.limit(2)
        .withColumnRenamed("vec_id", "query_id")
        .withColumn("query", F.lit("merge batch value")),
        "sig_store": sstore,
        "hash_store": hstore,
        "docs": docs.limit(10),
        "forgotten_ids": [0, 3],
    }

    subs = {
        "/root/testdata/sf0.001": "/root/testdata/sf0.001",
        "subset.zip": str(tmp_path / "subset.zip"),
        "/tmp/restored": str(tmp_path / "restored"),
        "/data/corpus": str(tmp_path / "corpus"),
        "/data/tidx": str(tmp_path / "tidx"),
    }
    for i, block in enumerate(blocks):
        src = block
        for old, new in subs.items():
            src = src.replace(f'"{old}"', f'"{new}"')
        try:
            exec(compile(src, f"README.md#python[{i}]", "exec"), ns)
        except Exception as e:  # pragma: no cover - diagnostic
            pytest.fail(f"README python block {i} failed: {e}\n---\n{block}")
    # the quickstart + engine blocks actually produced their artifacts
    assert (tmp_path / "subset.zip").exists()
    assert "res" in ns and ns["res"].audit["input"] > 0


def test_readme_cli_commands_parse():
    from xdump_spark.cli import build_parser

    parser = build_parser()
    cmds: list[list[str]] = []
    for block in _blocks("bash"):
        joined = re.sub(r"\\\n\s*", " ", block)  # fold line continuations
        for line in joined.splitlines():
            line = line.strip()
            if not line.startswith("xdump-spark"):
                continue
            toks = shlex.split(line, comments=True)[1:]
            cmds.append(toks)
    assert len(cmds) >= 12, f"README lost its CLI examples? found {cmds}"
    for toks in cmds:
        try:
            parser.parse_args(toks)
        except SystemExit:
            pytest.fail(f"README CLI example no longer parses: {toks}")
