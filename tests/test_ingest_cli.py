"""CLI/config front door for the four streaming drop-directory ingests
(r8 verdict #2): one e2e per kind through ``cli ingest`` including a
redelivered drop, config-file parity, and argument validation. The
twins' own semantics are covered in test_warc/test_sft/test_preference/
test_incremental; here we prove the FRONT DOOR wires them correctly."""

import json
import uuid

import pytest

from xdump_spark import cli


def _run_cli(spark, argv):
    return cli.run(cli.build_parser().parse_args(argv), spark)


def test_ingest_cli_wet_two_drops_and_redelivery(spark, tmp_path):
    from xdump_spark.sources.warc import write_wet

    docs = [
        {"url": "http://a.example.com/1", "date": "2026-01-02T03:04:05Z",
         "text": "first extracted document text"},
        {"url": "http://b.example.org/2", "date": "2026-01-02T03:04:06Z",
         "text": "second text entirely different"},
    ]
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    out = str(tmp_path / "corpus")
    name = f"ingest_wet_{uuid.uuid4().hex[:8]}"
    base = [
        "ingest", "--kind", "wet", "-i", str(inbox), "-o", out,
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--store-table", name, "--store-path", str(tmp_path / name),
        "--store-buckets", "4",
        "--corrupt-out", str(tmp_path / "corrupt"),
    ]
    try:
        write_wet(docs, str(inbox / "crawl-0.wet.gz"))
        assert _run_cli(spark, base) == 0
        assert spark.read.parquet(out).count() == 2

        # drop 2: one re-crawl (same text, new file) + one new doc
        write_wet(
            [docs[0], {"url": "http://c.example.net/3",
                       "date": "2026-01-02T03:04:07Z",
                       "text": "third novel content"}],
            str(inbox / "crawl-1.wet.gz"),
        )
        assert _run_cli(spark, base) == 0
        assert spark.read.parquet(out).count() == 3

        # redelivered drop: same records again under a new name — the
        # store rejects everything, output unchanged
        write_wet(docs, str(inbox / "crawl-0-redelivered.wet.gz"))
        assert _run_cli(spark, base) == 0
        assert spark.read.parquet(out).count() == 3
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_ingest_cli_sft_with_rejects(spark, tmp_path):
    inp = tmp_path / "drops"
    inp.mkdir()
    out = str(tmp_path / "out")
    name = f"ingest_sft_{uuid.uuid4().hex[:8]}"

    def conv(cid, msgs):
        return {"conv_id": cid, "source": "lab",
                "messages": [{"role": r, "content": t} for r, t in msgs]}

    with open(inp / "day1.jsonl", "w") as fh:
        fh.write(json.dumps(conv(1, [("user", "hello"), ("assistant", "hi")])) + "\n")
        fh.write(json.dumps(conv(2, [("user", "x"), ("tool", "y")])) + "\n")
        fh.write("{broken\n")
    base = [
        "ingest", "--kind", "sft", "-i", str(inp), "-o", out,
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--store-table", name, "--store-path", str(tmp_path / name),
        "--store-buckets", "4",
        "--corrupt-out", str(tmp_path / "corrupt"),
        "--rejects-out", str(tmp_path / "rejects"),
    ]
    try:
        assert _run_cli(spark, base) == 0
        assert {r["conv_id"] for r in spark.read.parquet(out).collect()} == {1}
        assert spark.read.parquet(str(tmp_path / "corrupt")).count() == 1
        rej = {r["conv_id"]: r["reason"]
               for r in spark.read.parquet(str(tmp_path / "rejects")).collect()}
        assert rej == {2: "unknown_role"}

        # redelivered content (new file): store dup, nothing appended
        with open(inp / "day1_redelivered.jsonl", "w") as fh:
            fh.write(json.dumps(conv(9, [("user", "hello"), ("assistant", "hi")])) + "\n")
        assert _run_cli(spark, base) == 0
        assert spark.read.parquet(out).count() == 1
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_ingest_cli_pairs_contradictions_and_config_parity(spark, tmp_path):
    """pairs through the CLI, then the SAME run shape through
    ingest_from_config on a fresh store — identical survivors."""
    from xdump_spark.config import ingest_from_config

    inp = tmp_path / "drops"
    inp.mkdir()

    def pr(pid, q, ch, rj):
        return {"pair_id": pid, "prompt": [{"role": "user", "content": q}],
                "chosen": ch, "rejected": rj, "source": "lab"}

    rows = [
        pr(1, "pick", "alpha", "beta"),
        pr(12, "flip", "x", "y"),     # within-drop contradiction
        pr(13, "flip", "y", "x"),
    ]
    with open(inp / "day1.jsonl", "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")

    name = f"ingest_pairs_{uuid.uuid4().hex[:8]}"
    out = str(tmp_path / "out_cli")
    try:
        assert _run_cli(spark, [
            "ingest", "--kind", "pairs", "-i", str(inp), "-o", out,
            "--checkpoint-dir", str(tmp_path / "ckpt_cli"),
            "--store-table", name, "--store-path", str(tmp_path / name),
            "--store-buckets", "4",
        ]) == 0
        cli_ids = {r["pair_id"] for r in spark.read.parquet(out).collect()}
        assert cli_ids == {1}
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")

    # config parity: the same wiring as one reviewable JSON artifact
    name2 = f"ingest_pairs_{uuid.uuid4().hex[:8]}"
    out2 = str(tmp_path / "out_cfg")
    cfg = {
        "kind": "pairs", "input_dir": str(inp), "output": out2,
        "checkpoint_dir": str(tmp_path / "ckpt_cfg"),
        "store": {"table": name2, "path": str(tmp_path / name2),
                  "n_buckets": 4},
    }
    p = tmp_path / "ingest.json"
    p.write_text(json.dumps(cfg))
    try:
        ingest_from_config(spark, str(p))
        cfg_ids = {r["pair_id"] for r in spark.read.parquet(out2).collect()}
        assert cfg_ids == cli_ids
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name2}")


def test_ingest_cli_semantic_hash_embed_float32(spark, tmp_path):
    """semantic kind end-to-end with hashing-trick embeddings and the
    r9 float32 store option — cross-drop dedup via the VectorStore."""
    inp = tmp_path / "drops"
    inp.mkdir()
    out = str(tmp_path / "out")
    store_path = str(tmp_path / "vs")

    base_text = "the quick brown fox jumps over the lazy dog again today"
    other = "distributed query engines shuffle data between executor stages"

    def drop(name, rows):
        spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
            str(inp / name)
        )

    argv = [
        "ingest", "--kind", "semantic", "-i", str(inp) + "/*", "-o", out,
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--store-path", store_path, "--vector-dtype", "float32",
        "--hash-embed", "256", "--semantic-threshold", "0.6",
        "--semantic-cells", "2",
        "--rejects-out", str(tmp_path / "rejects"),
    ]
    drop("day1", [(1, base_text), (2, other)])
    assert _run_cli(spark, argv) == 0
    assert spark.read.parquet(out).count() == 2

    # drop 2 re-sends day1's base text under a new id: store dup
    drop("day2", [(10, base_text.replace("jumps", "leaps")),
                  (11, "completely new content about parquet row groups")])
    assert _run_cli(spark, argv) == 0
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert 11 in got and 10 not in got and len(got) == 3
    rej = spark.read.parquet(str(tmp_path / "rejects")).collect()
    assert len(rej) == 1 and rej[0]["est"] >= 0.6
    # the store was created float32 (the CLI flag reached the ctor)
    raw = spark.read.parquet(store_path + "/assigned")
    assert dict(raw.dtypes)["cv"] == "array<float>"


def test_ingest_cli_semantic_pq_store(spark, tmp_path):
    """--vector-dtype pq through the ingest front door: the store is
    created as product-quantized codes and cross-drop dedup still
    works (re-sent text rejects against the reconstructed history)."""
    inp = tmp_path / "drops"
    inp.mkdir()
    out = str(tmp_path / "out")
    store_path = str(tmp_path / "vs")

    base_text = "the quick brown fox jumps over the lazy dog again today"
    other = "distributed query engines shuffle data between executor stages"

    def drop(name, rows):
        spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
            str(inp / name)
        )

    argv = [
        "ingest", "--kind", "semantic", "-i", str(inp) + "/*", "-o", out,
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--store-path", store_path, "--vector-dtype", "pq",
        "--hash-embed", "256", "--semantic-threshold", "0.6",
        "--semantic-cells", "2",
    ]
    drop("day1", [(1, base_text), (2, other)])
    assert _run_cli(spark, argv) == 0
    assert spark.read.parquet(out).count() == 2

    drop("day2", [(10, base_text), (11, "novel content about row groups")])
    assert _run_cli(spark, argv) == 0
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got == {1, 2, 11}
    # the store holds codes, not vectors
    raw = spark.read.parquet(store_path + "/assigned")
    assert dict(raw.dtypes)["codes"] == "array<smallint>"
    assert "cv" not in dict(raw.dtypes)


def test_ingest_validation_errors(spark, tmp_path):
    from xdump_spark.config import load_ingest_config
    from xdump_spark.streaming.ingest import run_ingest

    with pytest.raises(ValueError, match="store_table"):
        run_ingest(spark, "wet", str(tmp_path), str(tmp_path / "o"),
                   str(tmp_path / "c"))
    with pytest.raises(ValueError, match="store_path"):
        run_ingest(spark, "semantic", str(tmp_path), str(tmp_path / "o"),
                   str(tmp_path / "c"))
    with pytest.raises(ValueError, match="not store_table"):
        run_ingest(spark, "semantic", str(tmp_path), str(tmp_path / "o"),
                   str(tmp_path / "c"), store_table="t", store_path="p")
    with pytest.raises(ValueError, match="kind"):
        run_ingest(spark, "nope", str(tmp_path), str(tmp_path / "o"),
                   str(tmp_path / "c"))

    p = tmp_path / "bad.json"
    p.write_text(json.dumps({"kind": "wet"}))
    with pytest.raises(ValueError, match="missing required"):
        load_ingest_config(str(p))
    p.write_text(json.dumps({
        "kind": "wet", "input_dir": "a", "output": "b",
        "checkpoint_dir": "c", "frobnicate": 1,
    }))
    with pytest.raises(ValueError, match="unknown ingest config"):
        load_ingest_config(str(p))
    p.write_text(json.dumps({
        "kind": "wet", "input_dir": "a", "output": "b",
        "checkpoint_dir": "c", "store": {"bogus": 1},
    }))
    with pytest.raises(ValueError, match="unknown ingest store"):
        load_ingest_config(str(p))


def test_ingest_cli_always_on_bounded_run(spark, tmp_path):
    """--processing-time + --await-seconds: the always-on mode consumes
    the drop within the bounded window and the CLI stops the query
    cleanly (the scheduler-owned daemon path, bounded for tests)."""
    inp = tmp_path / "drops"
    inp.mkdir()
    name = f"ingest_sft_{uuid.uuid4().hex[:8]}"
    out = str(tmp_path / "out")
    with open(inp / "day1.jsonl", "w") as fh:
        fh.write(json.dumps({
            "conv_id": 1, "source": "lab",
            "messages": [{"role": "user", "content": "hello"},
                         {"role": "assistant", "content": "hi"}],
        }) + "\n")
    try:
        assert _run_cli(spark, [
            "ingest", "--kind", "sft", "-i", str(inp), "-o", out,
            "--checkpoint-dir", str(tmp_path / "ckpt"),
            "--store-table", name, "--store-path", str(tmp_path / name),
            "--store-buckets", "4",
            "--processing-time", "1 second", "--await-seconds", "20",
        ]) == 0
        # no active query leaked into the shared session
        assert not spark.streams.active
        assert spark.read.parquet(out).count() == 1
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_ingest_cli_docs_exact_two_drops(spark, tmp_path):
    """docs kind (the plain parquet-drop pattern): exact content dedup
    across drops via the ExactHashStore, survivors land as full rows."""
    inp = tmp_path / "drops"
    inp.mkdir()
    out = str(tmp_path / "out")
    name = f"ingest_docs_{uuid.uuid4().hex[:8]}"

    def drop(dname, rows):
        spark.createDataFrame(rows, "doc_id long, text string, source string") \
            .write.parquet(str(inp / dname))

    argv = [
        "ingest", "--kind", "docs", "-i", str(inp) + "/*", "-o", out,
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--store-table", name, "--store-path", str(tmp_path / name),
        "--store-buckets", "4",
    ]
    try:
        drop("day1", [(1, "alpha beta gamma", "a"), (2, "delta epsilon", "a")])
        assert _run_cli(spark, argv) == 0
        got = {r["doc_id"]: r["source"]
               for r in spark.read.parquet(out).collect()}
        assert set(got) == {1, 2} and got[1] == "a"  # full rows, not ids

        # day2: a re-send (same normalized text, new id) + one new doc
        drop("day2", [(10, "  ALPHA   beta gamma ", "b"), (11, "zeta eta", "b")])
        assert _run_cli(spark, argv) == 0
        ids = {r["doc_id"] for r in spark.read.parquet(out).collect()}
        assert ids == {1, 2, 11}
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_ingest_cli_docs_fuzzy_neardup(spark, tmp_path):
    """docs kind with MinHash near-dup semantics: a re-worded re-send
    rejects against the SignatureStore with (dup_id, kept_id, est)
    evidence from the greedy driver path."""
    inp = tmp_path / "drops"
    inp.mkdir()
    out = str(tmp_path / "out")

    base = ("the quick brown fox jumps over the lazy dog while the "
            "cat watches from the warm windowsill today")
    near = base.replace("lazy", "sleepy")
    other = "distributed query engines shuffle data between executor stages"

    def drop(dname, rows):
        spark.createDataFrame(rows, "doc_id long, text string") \
            .write.parquet(str(inp / dname))

    argv = [
        "ingest", "--kind", "docs", "--doc-dedup", "fuzzy",
        "-i", str(inp) + "/*", "-o", out,
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--store-path", str(tmp_path / "sig"),
        "--fuzzy-threshold", "0.5",
        "--rejects-out", str(tmp_path / "rejects"),
    ]
    drop("day1", [(1, base), (2, other)])
    assert _run_cli(spark, argv) == 0
    assert spark.read.parquet(out).count() == 2

    drop("day2", [(10, near), (11, "novel words that match nothing else here")])
    assert _run_cli(spark, argv) == 0
    ids = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert ids == {1, 2, 11}
    rej = [r for r in spark.read.parquet(str(tmp_path / "rejects")).collect()]
    assert [(r.dup_id, r.kept_id) for r in rej] == [(10, 1)]
    assert rej[0].est >= 0.5

    # redelivered day1 content under fresh ids: everything rejects
    drop("day1_redelivered", [(20, base), (21, other)])
    assert _run_cli(spark, argv) == 0
    assert spark.read.parquet(out).count() == 3


def test_ingest_empty_drop_dir_needs_schema(spark, tmp_path):
    """r9 verdict #2 / ADVICE: a parquet-kind ingest on an EMPTY drop
    directory must fail with deploy guidance (pass --schema), not an
    AnalysisException from schema inference at stream start."""
    from xdump_spark.streaming.ingest import run_ingest

    inp = tmp_path / "drops"
    inp.mkdir()
    with pytest.raises(ValueError, match="--schema"):
        run_ingest(spark, "docs", str(inp), str(tmp_path / "o"),
                   str(tmp_path / "c"), store_table="t_unused")
    with pytest.raises(ValueError, match="--schema"):
        run_ingest(spark, "semantic", str(inp), str(tmp_path / "o"),
                   str(tmp_path / "c"), store_path=str(tmp_path / "vs"))


def test_ingest_always_on_starts_on_empty_dir_with_schema(spark, tmp_path):
    """The deployment-shaped edge the r9 verdict flagged: a scheduler
    starts the always-on daemon BEFORE the first drop lands. With
    --schema the daemon starts on the empty directory and consumes the
    first drop when it arrives."""
    import time

    from xdump_spark.streaming.ingest import run_ingest

    inp = tmp_path / "drops"
    inp.mkdir()
    out = str(tmp_path / "out")
    name = f"ingest_docs_{uuid.uuid4().hex[:8]}"
    try:
        q = run_ingest(
            spark, "docs", str(inp) + "/*", out, str(tmp_path / "ckpt"),
            store_table=name, store_path=str(tmp_path / name),
            store_buckets=4, schema="doc_id long, text string",
            processing_time="1 second",
        )
        try:
            assert q.isActive  # started with nothing to infer from
            spark.createDataFrame(
                [(1, "first drop after daemon start")],
                "doc_id long, text string",
            ).write.parquet(str(inp / "day1"))
            deadline = time.time() + 60
            n = 0
            while time.time() < deadline:
                try:
                    n = spark.read.parquet(out).count()
                except Exception:
                    n = 0
                if n:
                    break
                time.sleep(0.5)
            assert n == 1
        finally:
            q.stop()
            q.awaitTermination()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_ingest_docs_fuzzy_string_ids_greedy(spark, tmp_path):
    """ADVICE r9: greedy resolution must build the rejects frame with
    the id column's REAL type — string doc ids crashed every
    micro-batch that found a duplicate."""
    from xdump_spark.streaming.ingest import run_ingest

    inp = tmp_path / "drops"
    inp.mkdir()
    out = str(tmp_path / "out")
    base = ("the quick brown fox jumps over the lazy dog while the "
            "cat watches from the warm windowsill today")
    spark.createDataFrame(
        [("doc-a", base), ("doc-b", base.replace("lazy", "sleepy"))],
        "doc_id string, text string",
    ).write.parquet(str(inp / "day1"))
    run_ingest(
        spark, "docs", str(inp) + "/*", out, str(tmp_path / "ckpt"),
        store_path=str(tmp_path / "sig"), doc_dedup="fuzzy",
        fuzzy_threshold=0.5, rejects_out=str(tmp_path / "rej"),
    )
    assert {r["doc_id"] for r in spark.read.parquet(out).collect()} == {"doc-a"}
    rej = spark.read.parquet(str(tmp_path / "rej")).collect()
    assert [(r.dup_id, r.kept_id) for r in rej] == [("doc-b", "doc-a")]


def test_ingest_docs_validation(spark, tmp_path):
    from xdump_spark.streaming.ingest import run_ingest

    with pytest.raises(ValueError, match="store_table"):
        run_ingest(spark, "docs", str(tmp_path), str(tmp_path / "o"),
                   str(tmp_path / "c"))
    with pytest.raises(ValueError, match="store_path"):
        run_ingest(spark, "docs", str(tmp_path), str(tmp_path / "o"),
                   str(tmp_path / "c"), doc_dedup="fuzzy")
    with pytest.raises(ValueError, match="doc_dedup"):
        run_ingest(spark, "docs", str(tmp_path), str(tmp_path / "o"),
                   str(tmp_path / "c"), store_table="t", doc_dedup="nope")


def test_ingest_semantic_max_cell_reaches_kernel(spark, tmp_path):
    """r10: --semantic-max-cell is the drift tripwire an always-on
    daemon needs tunable without code — an absurd bound of 1 must make
    the increment raise with retrain guidance through the stream."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from xdump_spark.streaming.ingest import run_ingest

    inp = tmp_path / "drops"
    inp.mkdir()
    spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta"),
         (3, "eta theta iota")],
        "doc_id long, text string",
    ).write.parquet(str(inp / "day1"))
    with pytest.raises(StreamingQueryException, match="max_cell"):
        run_ingest(
            spark, "semantic", str(inp) + "/*", str(tmp_path / "out"),
            str(tmp_path / "ckpt"), store_path=str(tmp_path / "vs"),
            hash_embed=32, semantic_cells=2, semantic_max_cell=1,
        )


def test_ingest_cli_semantic_pq_exact_guard(spark, tmp_path):
    """r11 --exact-guard through the ingest front door: the flag
    reaches the ctor (meta records it), cross-drop re-sends reject,
    and after a CLI retrain a byte-identical re-send STILL rejects —
    the cross-retrain immunity the flag buys (the deterministic
    0-slip-vs-3-slip evidence lives in tests/test_incremental.py; this
    pins the CLI plumbing end to end)."""
    import json
    from pathlib import Path

    from xdump_spark.operators.incremental import VectorStore

    inp = tmp_path / "drops"
    inp.mkdir()
    out = str(tmp_path / "out")
    store_path = str(tmp_path / "vs")

    texts = [
        "the quick brown fox jumps over the lazy dog again today",
        "distributed query engines shuffle data between executor stages",
        "parquet row groups bound the scan parallelism of a single file",
        "watermarks let late events join their original session window",
    ]

    def drop(name, rows):
        spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
            str(inp / name)
        )

    argv = [
        "ingest", "--kind", "semantic", "-i", str(inp) + "/*", "-o", out,
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--store-path", store_path, "--vector-dtype", "pq",
        "--exact-guard", "--hash-embed", "64",
        "--semantic-threshold", "0.6", "--semantic-cells", "2",
    ]
    drop("day1", list(enumerate(texts)))
    assert _run_cli(spark, argv) == 0
    store = VectorStore(spark, store_path)
    assert store.guard_enabled() is True
    assert store.stats()["exact_guard"] is True

    # retrain between drops (the window the guard exists for)
    assert _run_cli(spark, [
        "maintain", "--kind", "vector", "--store-path", store_path,
        "--action", "retrain", "--n-cells", "3",
    ]) == 0

    # day2: byte-identical re-sends under fresh ids + one novel doc
    drop("day2", [(100 + i, t) for i, t in enumerate(texts[:2])]
         + [(200, "completely novel content about broadcast joins")])
    assert _run_cli(spark, argv) == 0
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got == {0, 1, 2, 3, 200}  # re-sends rejected across the retrain

    # meta records the guard (reopen without the flag keeps it)
    meta = json.loads((Path(store_path) / "meta.json").read_text())
    assert meta["exact_guard"] is True


def test_ingest_cli_index_kind(spark, tmp_path):
    """r11 --kind index: drops stream into a saved BM25 index through
    the CLI; the loaded index equals a fresh build over the union and
    hybrid/bm25 search can use it immediately. Store args are rejected
    (the output IS the index)."""
    from xdump_spark.operators.retrieval import (
        bm25_topk,
        build_text_index,
        load_text_index,
    )

    inp = tmp_path / "drops"
    inp.mkdir()
    idx = str(tmp_path / "tidx")

    rows1 = [(1, "the quick brown fox jumps over the lazy dog"),
             (2, "lazy dogs sleep all day")]
    rows2 = [(3, "brown bears eat honey"), (4, "quick quick fox")]

    def drop(name, rows):
        spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
            str(inp / name)
        )

    argv = ["ingest", "--kind", "index", "-i", str(inp) + "/*",
            "-o", idx, "--checkpoint-dir", str(tmp_path / "ckpt")]
    drop("day1", rows1)
    assert _run_cli(spark, argv) == 0
    drop("day2", rows2)
    assert _run_cli(spark, argv) == 0

    all_docs = spark.createDataFrame(rows1 + rows2, "doc_id long, text string")
    queries = spark.createDataFrame([(0, "quick fox")],
                                    "query_id int, query string")
    want = sorted(
        (r.query_id, r.doc_id, r.score, r.rnk)
        for r in bm25_topk(build_text_index(all_docs), queries, k=4).collect()
    )
    got = sorted(
        (r.query_id, r.doc_id, r.score, r.rnk)
        for r in bm25_topk(load_text_index(spark, idx), queries, k=4).collect()
    )
    assert got == want

    with pytest.raises(ValueError, match="no store arguments"):
        from xdump_spark.streaming.ingest import run_ingest

        run_ingest(spark, "index", str(inp) + "/*", idx,
                   str(tmp_path / "c2"), store_table="t")


def test_ingest_cli_rag_kind_and_config_parity(spark, tmp_path):
    """r12 --kind rag: the one-daemon RAG chain through the CLI — a
    drop is chunked, embedded, deduped against the VectorStore, its
    surviving chunks written AND indexed; a re-sent drop adds nothing.
    Config-file invocation produces the identical artifacts; validation
    rejects a missing --index-dir."""
    import xdump_spark.operators.retrieval as R
    from xdump_spark.operators.retrieval import load_text_index

    inp = tmp_path / "drops"
    inp.mkdir()
    out = str(tmp_path / "chunks")
    idx = str(tmp_path / "tidx")
    body1 = " ".join(f"alpha{i} beta{i}" for i in range(40))
    body2 = " ".join(f"delta{i} epsilon{i}" for i in range(40))
    spark.createDataFrame(
        [(1, body1), (2, body2)], "doc_id long, text string"
    ).write.parquet(str(inp / "day1"))

    argv = ["ingest", "--kind", "rag", "-i", str(inp) + "/*", "-o", out,
            "--checkpoint-dir", str(tmp_path / "ckpt"),
            "--store-path", str(tmp_path / "vs"),
            "--index-dir", idx,
            "--chunk-tokens", "32", "--chunk-overlap", "8",
            "--hash-embed", "64", "--semantic-cells", "2"]
    assert _run_cli(spark, argv) == 0
    n = load_text_index(spark, idx).n_docs
    assert n > 2
    assert spark.read.parquet(out).count() == n

    # re-send day under new doc ids: zero new chunks, zero new segments
    spark.createDataFrame(
        [(10, body1), (20, body2)], "doc_id long, text string"
    ).write.parquet(str(inp / "day2"))
    segs = len(R._read_manifest(spark, idx)["segments"])
    assert _run_cli(spark, argv) == 0
    assert load_text_index(spark, idx).n_docs == n
    assert len(R._read_manifest(spark, idx)["segments"]) == segs

    # config parity: same drop through ingest_from_config builds the
    # hash-identical index
    from xdump_spark.config import ingest_from_config

    cfg = {
        "kind": "rag", "input_dir": str(inp) + "/*",
        "output": str(tmp_path / "chunks2"),
        "checkpoint_dir": str(tmp_path / "ckpt2"),
        "store": {"path": str(tmp_path / "vs2")},
        "index_dir": str(tmp_path / "tidx2"),
        "chunk_tokens": 32, "chunk_overlap": 8,
        "hash_embed": 64, "semantic_cells": 2,
    }
    cfg_path = tmp_path / "rag.json"
    cfg_path.write_text(json.dumps(cfg))
    ingest_from_config(spark, str(cfg_path))
    assert load_text_index(spark, str(tmp_path / "tidx2")).n_docs == n

    with pytest.raises(ValueError, match="index_dir"):
        from xdump_spark.streaming.ingest import run_ingest

        run_ingest(spark, "rag", str(inp) + "/*", out,
                   str(tmp_path / "c3"), store_path=str(tmp_path / "vs3"))


def test_ingest_cli_rag_replace_flag(spark, tmp_path):
    """r14 --replace: the corrected-document inbox — each drop
    REPLACES its doc ids across the chain's three artifacts, so a
    re-dropped doc with corrected text lands (instead of the plain
    path's dedup-to-zero) and the stale content is gone from corpus
    and index alike."""
    from xdump_spark.operators.retrieval import load_text_index

    inp = tmp_path / "drops"
    inp.mkdir()
    out = str(tmp_path / "chunks")
    idx = str(tmp_path / "tidx")
    body = " ".join(f"alpha{i} beta{i}" for i in range(40))
    fixed = " ".join(f"sigma{i} tau{i}" for i in range(40))
    other = " ".join(f"delta{i} epsilon{i}" for i in range(40))
    spark.createDataFrame(
        [(1, body), (2, other)], "doc_id long, text string"
    ).write.parquet(str(inp / "day1"))

    argv = ["ingest", "--kind", "rag", "-i", str(inp) + "/*", "-o", out,
            "--checkpoint-dir", str(tmp_path / "ckpt"),
            "--store-path", str(tmp_path / "vs"),
            "--index-dir", idx, "--replace",
            "--chunk-tokens", "32", "--chunk-overlap", "8",
            "--hash-embed", "64", "--semantic-cells", "2"]
    assert _run_cli(spark, argv) == 0
    n = load_text_index(spark, idx).n_docs
    assert n > 2

    # the corrected doc 1 re-dropped: same chunk grid, new words
    spark.createDataFrame(
        [(1, fixed)], "doc_id long, text string"
    ).write.parquet(str(inp / "day2"))
    assert _run_cli(spark, argv) == 0
    assert load_text_index(spark, idx).n_docs == n  # replaced, not added
    texts = " ".join(
        r.text
        for r in spark.read.parquet(out)
        .filter("doc_id = 1").select("text").collect()
    )
    assert "sigma0" in texts and "alpha0" not in texts
