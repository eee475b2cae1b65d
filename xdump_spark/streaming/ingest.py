"""One front door for the four restart-safe drop-directory ingests.

The streaming twins — WET crawl files, SFT conversation JSONL,
preference-pair JSONL, semantic document parquet — share one
operational shape: files LAND in a drop directory, each micro-batch
runs the matching incremental pipeline against a persistent dedup
store, survivors append to an output directory, and the file-stream
checkpoint makes the whole thing restart-safe (output written BEFORE
the store commit, so a crash can only duplicate, never lose — the
family contract documented on each twin). Until r9 they were API-only;
an operator scheduling the drop-directory pattern had to write Python.
:func:`run_ingest` is the shared dispatcher behind ``python -m
xdump_spark.cli ingest`` and :func:`xdump_spark.config.
ingest_from_config` — same validation, same store construction, same
trigger handling for all four kinds.

Scale notes: each kind's cost model is its twin's (see
sources/warc.py, operators/sft.py, operators/preference.py,
operators/incremental.py). The dispatcher adds nothing per-row — it
only builds the store handle and the trigger. Drain mode
(``availableNow``) is the scheduler-friendly default: consume
everything present, commit, exit 0; ``processing_time`` turns the same
query into an always-on daemon with identical semantics per
micro-batch.

The reference engine has no streaming surface (extension scope; the
batch CLI parity it does have is cited per subcommand in cli.py).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

INGEST_KINDS = ("wet", "sft", "pairs", "semantic", "docs", "index", "rag")


def run_ingest(
    spark: SparkSession,
    kind: str,
    input_dir: str,
    output: str,
    checkpoint_dir: str,
    store_table: str | None = None,
    store_path: str | None = None,
    store_buckets: int = 64,
    vector_dtype: str = "float64",
    corrupt_out: str | None = None,
    rejects_out: str | None = None,
    template: str = "chatml",
    keep_contradictions: bool = False,
    path_glob: str = "*",
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    semantic_threshold: float = 0.95,
    semantic_cells: int = 16,
    semantic_max_cell: int = 50_000,
    pq_m: int = 8,
    pq_k: int = 256,
    exact_guard: bool = False,
    hash_embed: int | None = None,
    doc_dedup: str = "exact",
    fuzzy_threshold: float = 0.5,
    schema: str | None = None,
    processing_time: str | None = None,
    await_seconds: float | None = None,
    index_dir: str | None = None,
    chunk_tokens: int = 256,
    chunk_overlap: int = 32,
    corpus_buckets: int = 64,
    replace: bool = False,
):
    """Start (and in drain mode, finish) one drop-directory ingest.

    ``kind`` picks the twin; the store argument matches it: ``wet`` /
    ``sft`` / ``pairs`` dedup against an ExactHashStore named by
    ``store_table`` (optional external ``store_path``), ``semantic``
    against a VectorStore at ``store_path`` (``vector_dtype`` applies
    at store creation; an existing store's recorded dtype wins), and
    ``docs`` — plain parquet document drops — against an ExactHashStore
    (``doc_dedup="exact"``, ``store_table``) or a MinHash
    SignatureStore (``doc_dedup="fuzzy"``, ``store_path``,
    ``fuzzy_threshold``). ``rag`` is the one-daemon retrieval chain
    (:func:`xdump_spark.pipeline.streaming_rag_ingest`): chunk →
    hash-embed → VectorStore increment (``store_path``) → surviving
    chunks appended to ``output`` → BM25 index append to ``index_dir``,
    chunked by ``chunk_tokens``/``chunk_overlap`` and embedded at
    ``hash_embed`` dims (default 256); ``replace=True`` makes each
    drop REPLACE its doc ids across the chain's three artifacts (the
    corrected-document inbox — see
    :func:`~xdump_spark.pipeline.streaming_rag_ingest`).

    ``schema`` (a DDL string, e.g. ``"doc_id long, text string"``)
    applies to the PARQUET kinds (``semantic``/``docs``/``index``/``rag``), whose file
    stream needs one up front: without it the twins infer from files
    already present, so an always-on daemon deployed BEFORE the first
    drop lands has nothing to infer from — that case fails here with
    deploy guidance instead of an AnalysisException at stream start.
    The text-stream kinds (wet/sft/pairs) never need one.

    Trigger: ``processing_time=None`` (default) drains — the query
    consumes every file currently in ``input_dir``, commits, and this
    function BLOCKS until it stops (bounded by ``await_seconds`` when
    given), then returns the stopped query; if the bound expires first
    the query is STOPPED before returning (a partially-drained drop is
    resumed by the next run's checkpoint) and ``q.xd_drained`` is
    False. A ``processing_time`` (e.g. ``"1 minute"``) starts an
    always-on query and returns it immediately (``await_seconds``
    still waits when given) — the caller owns ``stop()``.

    Redelivery contract (all kinds): re-running after a crash between
    the output write and the store commit re-delivers the last batch;
    duplicate output rows are dedupable by the kind's id column and
    re-committed store rows cannot change any later decision.
    """
    if kind not in INGEST_KINDS:
        raise ValueError(f"ingest kind must be one of {INGEST_KINDS}, got {kind!r}")
    trigger = (
        {"processingTime": processing_time}
        if processing_time
        else {"availableNow": True}
    )
    def _require_parquet_schema() -> None:
        # the parquet twins infer the stream schema from files already
        # present when schema is None; a daemon deployed before the
        # first drop lands must fail HERE with deploy guidance, not
        # with an AnalysisException at stream start (ADVICE r9)
        if schema is not None:
            return
        from xdump_spark import fsutil

        if not fsutil.list_data_files(spark, input_dir.rstrip("/*")):
            raise ValueError(
                f"ingest kind {kind!r}: {input_dir} holds no parquet "
                "files yet and no schema was given — a parquet file "
                "stream needs one up front. Pass schema= (CLI --schema) "
                "as a DDL string, e.g. 'doc_id long, text string', to "
                "start the daemon before the first drop lands."
            )

    if kind == "semantic":
        if not store_path:
            raise ValueError("ingest kind 'semantic' needs store_path "
                             "(the VectorStore directory)")
        if store_table:
            raise ValueError("ingest kind 'semantic' takes store_path, "
                             "not store_table")
        from xdump_spark.operators.incremental import (
            VectorStore,
            streaming_semantic_ingest,
        )

        _require_parquet_schema()
        store = VectorStore(
            spark, store_path, dtype=vector_dtype, pq_m=pq_m, pq_k=pq_k,
            exact_guard=exact_guard,
        )
        q = streaming_semantic_ingest(
            spark, input_dir, store, output, checkpoint_dir,
            threshold=semantic_threshold, n_cells=semantic_cells,
            hash_embed_dim=hash_embed, text_col=text_col, id_col=id_col,
            vec_col=vec_col, rejects_dir=rejects_out, schema=schema,
            trigger=trigger,
            semantic_kwargs={"max_cell": semantic_max_cell},
        )
    elif kind == "index":
        # continuous BM25 indexing of a drop directory: output IS the
        # index directory (store_path/store_table do not apply — the
        # index is the artifact, not a dedup side-store)
        if store_table or store_path:
            raise ValueError(
                "ingest kind 'index' takes no store arguments — the "
                "OUTPUT is the index directory; dedup upstream"
            )
        from xdump_spark.operators.retrieval import streaming_index_ingest

        _require_parquet_schema()
        q = streaming_index_ingest(
            spark, input_dir, output, checkpoint_dir,
            text_col=text_col, id_col=id_col, schema=schema,
            trigger=trigger,
        )
    elif kind == "rag":
        # the one-daemon RAG chain: chunk → embed → VectorStore
        # increment → survivors to OUTPUT → BM25 index append to
        # index_dir, all in one foreachBatch / one checkpoint
        if not store_path:
            raise ValueError("ingest kind 'rag' needs store_path "
                             "(the VectorStore directory)")
        if store_table:
            raise ValueError("ingest kind 'rag' takes store_path, "
                             "not store_table")
        if not index_dir:
            raise ValueError("ingest kind 'rag' needs index_dir "
                             "(the saved BM25 index directory; CLI "
                             "--index-dir)")
        from xdump_spark.operators.incremental import VectorStore
        from xdump_spark.pipeline import streaming_rag_ingest

        _require_parquet_schema()
        store = VectorStore(
            spark, store_path, dtype=vector_dtype, pq_m=pq_m, pq_k=pq_k,
            exact_guard=exact_guard,
        )
        q = streaming_rag_ingest(
            spark, input_dir, store, index_dir, checkpoint_dir,
            out_dir=output, text_col=text_col, id_col=id_col,
            max_tokens=chunk_tokens, overlap=chunk_overlap,
            hash_embed_dim=(hash_embed or 256), vec_col=vec_col,
            threshold=semantic_threshold, n_cells=semantic_cells,
            semantic_kwargs={"max_cell": semantic_max_cell},
            schema=schema, trigger=trigger,
            corpus_buckets=corpus_buckets, replace=replace,
        )
    elif kind == "docs":
        from xdump_spark.operators.incremental import (
            ExactHashStore,
            SignatureStore,
            streaming_doc_ingest,
        )

        if doc_dedup == "exact":
            if not store_table:
                raise ValueError(
                    "ingest kind 'docs' with doc_dedup='exact' needs "
                    "store_table (the ExactHashStore catalog table)"
                )
            store = ExactHashStore(
                spark, store_table, n_buckets=store_buckets, path=store_path
            )
            nd = None
        elif doc_dedup == "fuzzy":
            if not store_path or store_table:
                raise ValueError(
                    "ingest kind 'docs' with doc_dedup='fuzzy' needs "
                    "store_path (the SignatureStore directory), not "
                    "store_table"
                )
            store = SignatureStore(spark, store_path)
            nd = {"threshold": fuzzy_threshold}
        else:
            raise ValueError(
                f"doc_dedup must be 'exact' or 'fuzzy', got {doc_dedup!r}"
            )
        _require_parquet_schema()
        q = streaming_doc_ingest(
            spark, input_dir, store, output, checkpoint_dir,
            text_col=text_col, id_col=id_col, rejects_dir=rejects_out,
            schema=schema, trigger=trigger, neardup_kwargs=nd,
        )
    else:
        if not store_table:
            raise ValueError(
                f"ingest kind {kind!r} needs store_table (the ExactHashStore "
                "catalog table carrying the dedup history)"
            )
        from xdump_spark.operators.incremental import ExactHashStore

        store = ExactHashStore(
            spark, store_table, n_buckets=store_buckets, path=store_path
        )
        if kind == "wet":
            from xdump_spark.sources.warc import streaming_wet_ingest

            q = streaming_wet_ingest(
                spark, input_dir, store, output, checkpoint_dir,
                corrupt_dir=corrupt_out, path_glob=path_glob,
                text_col=text_col, trigger=trigger,
            )
        elif kind == "sft":
            from xdump_spark.operators.sft import streaming_sft_ingest

            q = streaming_sft_ingest(
                spark, input_dir, store, output, checkpoint_dir,
                corrupt_dir=corrupt_out, rejects_dir=rejects_out,
                template=template, trigger=trigger,
            )
        else:  # pairs
            from xdump_spark.operators.preference import (
                streaming_preference_ingest,
            )

            q = streaming_preference_ingest(
                spark, input_dir, store, output, checkpoint_dir,
                corrupt_dir=corrupt_out, rejects_dir=rejects_out,
                template=template, trigger=trigger,
                drop_contradictions=not keep_contradictions,
            )

    if processing_time is None:
        # drain-and-stop: availableNow terminates by itself. With a
        # bound, awaitTermination(timeout) returning False means the
        # query is STILL RUNNING — stop it before returning so the
        # caller never reads/counts the output concurrently with
        # in-flight appends (the checkpoint resumes the partial drain
        # next run); xd_drained records which case happened.
        if await_seconds is not None:
            drained = q.awaitTermination(await_seconds)
            if not drained:
                q.stop()
                q.awaitTermination()
            q.xd_drained = bool(drained)
        else:
            q.awaitTermination()
            q.xd_drained = True
    elif await_seconds is not None:
        q.awaitTermination(await_seconds)
    return q
