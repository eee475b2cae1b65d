"""Config-file-driven dump/load — the analog of the reference's Django
integration, where table sets live in settings (``XDUMP = {FULL_TABLES,
PARTIAL_TABLES, BACKEND}``, reference: extra/django/xdump/management/
core.py:7-74) and a management command runs the dump without CLI flags.

Config is JSON (no extra dependencies):

    {
      "db": "/path/to/parquet_db",
      "output": "dump.zip",
      "full_tables": ["groups"],
      "partial_tables": {"employees": "SELECT * FROM employees WHERE id = 1"},
      "compression": "deflated",
      "dump_schema": true,
      "dump_data": true
    }
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession


def load_config(path: str) -> dict:
    with open(path) as f:
        cfg = json.load(f)
    for key in ("db", "output"):
        if key not in cfg:
            raise ValueError(f"config missing required key {key!r}")
    unknown = set(cfg) - {
        "db", "output", "full_tables", "partial_tables",
        "compression", "dump_schema", "dump_data", "since",
    }
    if unknown:
        raise ValueError(f"unknown config keys: {sorted(unknown)}")
    return cfg


def dump_from_config(spark: SparkSession, path: str) -> dict[str, int]:
    """Run a dump as described by a JSON config file; returns per-table
    row counts (same as ``SparkDumpEngine.dump``)."""
    from xdump_spark.engine import SparkDumpEngine
    from xdump_spark.sources.parquet_db import ParquetDatabase

    cfg = load_config(path)
    engine = SparkDumpEngine(spark, ParquetDatabase(spark, cfg["db"]).catalog())
    kwargs = dict(
        full_tables=cfg.get("full_tables", []),
        partial_tables=cfg.get("partial_tables", {}),
        dump_schema=cfg.get("dump_schema", True),
        dump_data=cfg.get("dump_data", True),
        compression=cfg.get("compression", "deflated"),
    )
    if cfg.get("since"):
        # incremental: export only rows newer than the prior archive
        return engine.dump_incremental(cfg["output"], since=cfg["since"], **kwargs)
    return engine.dump(cfg["output"], **kwargs)


_CURATE_KEYS = {
    "input", "output", "text_col", "id_col", "markup", "line_filter",
    "line_dedup", "span_k", "min_tokens", "gopher", "sample_rates",
    "strata_col", "benchmark", "shuffle_seed", "pack_budget", "tokenize",
    "vocab_size", "partition_by", "overwrite", "shards_out", "shards_format",
    "blocklist", "blocklist_mode", "quality_model", "quality_score_min",
    "ppl_model", "max_ppl",
    "target_mixture", "mixture_col", "contamination_policy",
    "dsir_target", "dsir_n", "dsir_temperature", "dsir_buckets", "dsir_seed",
    "doc_dedup", "fuzzy_threshold", "fuzzy_kwargs", "compression_min",
    "embedding_col", "semantic_threshold", "semantic_kwargs", "embeddings",
    "hash_embed",
    "audio_gate", "dedup_store", "url_col", "dedup_urls", "domain_cap",
    "input_format", "audit", "checkpoint_dir", "checkpoint_stages",
    "resume", "chunk_budget", "chunk_overlap", "chunk_by", "chunks_out",
}


def load_curate_config(path: str) -> dict:
    with open(path) as f:
        cfg = json.load(f)
    for key in ("input", "output"):
        if key not in cfg:
            raise ValueError(f"curate config missing required key {key!r}")
    unknown = set(cfg) - _CURATE_KEYS
    if unknown:
        raise ValueError(f"unknown curate config keys: {sorted(unknown)}")
    return cfg


_INGEST_KEYS = {
    "kind", "input_dir", "output", "checkpoint_dir", "store",
    "corrupt_out", "rejects_out", "template", "keep_contradictions",
    "path_glob", "text_col", "id_col", "vec_col", "semantic_threshold",
    "semantic_cells", "semantic_max_cell", "hash_embed", "doc_dedup",
    "fuzzy_threshold", "schema", "processing_time", "await_seconds",
    "index_dir", "chunk_tokens", "chunk_overlap", "corpus_buckets",
    "replace",
}


def load_ingest_config(path: str) -> dict:
    with open(path) as f:
        cfg = json.load(f)
    for key in ("kind", "input_dir", "output", "checkpoint_dir"):
        if key not in cfg:
            raise ValueError(f"ingest config missing required key {key!r}")
    unknown = set(cfg) - _INGEST_KEYS
    if unknown:
        raise ValueError(f"unknown ingest config keys: {sorted(unknown)}")
    store = cfg.get("store", {})
    if not isinstance(store, dict):
        raise ValueError("ingest config 'store' must be an object")
    unknown = set(store) - {"table", "path", "n_buckets", "dtype",
                            "pq_m", "pq_k", "exact_guard"}
    if unknown:
        raise ValueError(f"unknown ingest store keys: {sorted(unknown)}")
    return cfg


def ingest_from_config(spark: SparkSession, path: str):
    """Run one drop-directory streaming ingest as described by a JSON
    config file — the scheduled-pipeline invocation mode of ``cli
    ingest`` (same shape as ``curate_from_config``): the full drop/
    store/output wiring lives in one reviewable artifact.

        {
          "kind": "sft", "input_dir": "/drops/sft",
          "output": "/data/sft_corpus", "checkpoint_dir": "/ckpt/sft",
          "store": {"table": "sft_hashes", "n_buckets": 64},
          "rejects_out": "/data/sft_rejects", "template": "chatml"
        }

    The ``store`` object is the kind-matched dedup store: ``table`` (+
    optional ``path``, ``n_buckets``) for wet/sft/pairs, ``path`` (+
    optional ``dtype``) for semantic and rag. ``kind: "rag"`` also
    takes ``index_dir`` (required), ``chunk_tokens``, ``chunk_overlap``,
    ``corpus_buckets``, and ``replace`` (each drop replaces its doc
    ids across the chain — the corrected-document inbox).
    Returns the (stopped, in drain mode) StreamingQuery from
    :func:`xdump_spark.streaming.ingest.run_ingest`."""
    from xdump_spark.streaming.ingest import run_ingest

    cfg = load_ingest_config(path)
    store = cfg.get("store", {})
    return run_ingest(
        spark,
        kind=cfg["kind"],
        input_dir=cfg["input_dir"],
        output=cfg["output"],
        checkpoint_dir=cfg["checkpoint_dir"],
        store_table=store.get("table"),
        store_path=store.get("path"),
        store_buckets=store.get("n_buckets", 64),
        vector_dtype=store.get("dtype", "float64"),
        pq_m=store.get("pq_m", 8),
        pq_k=store.get("pq_k", 256),
        exact_guard=store.get("exact_guard", False),
        corrupt_out=cfg.get("corrupt_out"),
        rejects_out=cfg.get("rejects_out"),
        template=cfg.get("template", "chatml"),
        keep_contradictions=cfg.get("keep_contradictions", False),
        path_glob=cfg.get("path_glob", "*"),
        text_col=cfg.get("text_col", "text"),
        id_col=cfg.get("id_col", "doc_id"),
        vec_col=cfg.get("vec_col", "embedding"),
        semantic_threshold=cfg.get("semantic_threshold", 0.95),
        semantic_cells=cfg.get("semantic_cells", 16),
        semantic_max_cell=cfg.get("semantic_max_cell", 50_000),
        hash_embed=cfg.get("hash_embed"),
        doc_dedup=cfg.get("doc_dedup", "exact"),
        fuzzy_threshold=cfg.get("fuzzy_threshold", 0.5),
        schema=cfg.get("schema"),
        processing_time=cfg.get("processing_time"),
        await_seconds=cfg.get("await_seconds"),
        index_dir=cfg.get("index_dir"),
        chunk_tokens=cfg.get("chunk_tokens", 256),
        chunk_overlap=cfg.get("chunk_overlap", 32),
        corpus_buckets=cfg.get("corpus_buckets", 64),
        replace=cfg.get("replace", False),
    )


def _load_quality_model(path: str):
    """A LinearModel JSON file (classifier.LinearModel.to_dict) → model."""
    from xdump_spark.operators.classifier import LinearModel

    with open(path) as fh:
        return LinearModel.from_dict(json.load(fh))


def curate_from_config(spark: SparkSession, path: str):
    """Run corpus preparation as described by a JSON config file — the
    settings-driven invocation mode (same shape as ``dump_from_config``),
    so a scheduled pipeline run carries its full stage configuration in
    one reviewable artifact instead of a flag soup:

        {
          "input": "raw_docs.parquet", "output": "/data/corpus",
          "markup": true, "line_dedup": true, "span_k": 8,
          "sample_rates": {"en": 0.5}, "pack_budget": 4096,
          "tokenize": true, "shards_out": "/data/shards"
        }

    Returns the :class:`~xdump_spark.pipeline.CorpusResult`.
    """
    from xdump_spark.pipeline import prepare_training_corpus

    cfg = load_curate_config(path)
    mode = "overwrite" if cfg.get("overwrite") else "errorifexists"
    dedup_store = None
    if cfg.get("dedup_store"):
        sc = dict(cfg["dedup_store"])
        if cfg.get("doc_dedup") == "fuzzy":
            # {"path": str} — the persistent near-dup SignatureStore
            # this run increments against (r7).
            from xdump_spark.operators.incremental import SignatureStore

            unknown = set(sc) - {"path"}
            if unknown or "path" not in sc:
                raise ValueError(
                    "dedup_store config with doc_dedup='fuzzy' needs "
                    f"'path' only; got keys {sorted(cfg['dedup_store'])}"
                )
            dedup_store = SignatureStore(spark, sc["path"])
        elif cfg.get("doc_dedup") == "semantic":
            # {"path": str, "dtype": "float64"|"float32" (optional)} —
            # the persistent embedding VectorStore this run increments
            # against (r8); dtype applies at store creation only (r9).
            from xdump_spark.operators.incremental import VectorStore

            unknown = set(sc) - {"path", "dtype", "pq_m", "pq_k",
                                 "exact_guard"}
            if unknown or "path" not in sc:
                raise ValueError(
                    "dedup_store config with doc_dedup='semantic' needs "
                    "'path' (+ optional 'dtype', 'pq_m', 'pq_k', "
                    f"'exact_guard'); got keys {sorted(cfg['dedup_store'])}"
                )
            dedup_store = VectorStore(
                spark, sc["path"], dtype=sc.get("dtype", "float64"),
                pq_m=sc.get("pq_m", 8), pq_k=sc.get("pq_k", 256),
                exact_guard=sc.get("exact_guard", False),
            )  # "pq" is a valid dtype here — codes on disk, meta wins
        else:
            # {"table": str, "path": str (optional), "n_buckets": int
            # (optional)} — the persistent exact-dedup hash store this
            # run increments against (requires doc_dedup == "exact").
            from xdump_spark.operators.incremental import ExactHashStore

            unknown = set(sc) - {"table", "path", "n_buckets"}
            if unknown or "table" not in sc:
                raise ValueError(
                    "dedup_store config needs 'table' (+ optional 'path', "
                    f"'n_buckets'); got keys {sorted(cfg['dedup_store'])}"
                )
            dedup_store = ExactHashStore(
                spark, sc["table"], n_buckets=sc.get("n_buckets", 64),
                path=sc.get("path"),
            )
    if cfg.get("input_format", "parquet") == "wet":
        from xdump_spark.sources.warc import read_wet

        input_docs, wet_corrupt = read_wet(spark, cfg["input"])
        # the quarantine contract is only useful if someone SEES it —
        # one collect (one row per corrupt file, bounded)
        corrupt_rows = wet_corrupt.collect()
        if corrupt_rows:
            print(f"quarantined {len(corrupt_rows)} corrupt WET file(s):")
            for r in corrupt_rows:
                print(f"  {r.path} @byte {r.byte_offset}: {r.reason}")
        # one parse, not one per downstream action (see cli.py curate)
        input_docs = input_docs.localCheckpoint(eager=True)
    elif cfg.get("input_format", "parquet") == "parquet":
        input_docs = spark.read.parquet(cfg["input"])
    else:
        raise ValueError(
            f"input_format must be 'parquet' or 'wet', got {cfg['input_format']!r}"
        )
    if cfg.get("embeddings") and cfg.get("hash_embed"):
        raise ValueError(
            "embeddings and hash_embed are mutually exclusive "
            "(one embedding source)"
        )
    hash_embed = cfg.get("hash_embed")
    if hash_embed is not None and not isinstance(hash_embed, int):
        raise ValueError(
            f"hash_embed config must be an int dim; got {hash_embed!r}"
        )
    if (cfg.get("embeddings") or hash_embed) and cfg.get("doc_dedup") != "semantic":
        raise ValueError(
            "embeddings/hash_embed require doc_dedup='semantic' (the "
            "embeddings inner join would silently drop vector-less docs "
            "from a run that never uses the vectors)"
        )
    if cfg.get("embeddings"):
        # {"path": str, "id_col": str (default vec_id)} — attach the
        # embedding table by id for doc_dedup='semantic' (INNER join:
        # a doc without a vector cannot be semantically deduped)
        from pyspark.sql import functions as F

        ec = dict(cfg["embeddings"])
        unknown = set(ec) - {"path", "id_col"}
        if unknown or "path" not in ec:
            raise ValueError(
                "embeddings config needs 'path' (+ optional 'id_col'); "
                f"got keys {sorted(cfg['embeddings'])}"
            )
        id_col = cfg.get("id_col", "doc_id")
        emb = spark.read.parquet(ec["path"]).select(
            F.col(ec.get("id_col", "vec_id")).alias(id_col),
            F.col(cfg.get("embedding_col", "embedding")),
        )
        input_docs = input_docs.join(emb, id_col, "inner")
    res = prepare_training_corpus(
        input_docs,
        text_col=cfg.get("text_col", "text"),
        id_col=cfg.get("id_col", "doc_id"),
        url_col=cfg.get("url_col", "url"),
        dedup_urls=cfg.get("dedup_urls", False),
        domain_cap=cfg.get("domain_cap"),
        markup=cfg.get("markup", False),
        line_filter=cfg.get("line_filter", False),
        line_dedup=cfg.get("line_dedup", False),
        span_k=cfg.get("span_k", 8) or None,
        doc_dedup=cfg.get("doc_dedup"),
        dedup_store=dedup_store,
        embedding_col=cfg.get("embedding_col", "embedding"),
        semantic_threshold=cfg.get("semantic_threshold", 0.95),
        semantic_kwargs=cfg.get("semantic_kwargs"),
        hash_embed=hash_embed,
        fuzzy_threshold=cfg.get("fuzzy_threshold", 0.8),
        fuzzy_kwargs=cfg.get("fuzzy_kwargs"),
        min_tokens=cfg.get("min_tokens", 5),
        blocklist=cfg.get("blocklist"),
        blocklist_mode=cfg.get("blocklist_mode", "token"),
        gopher=cfg.get("gopher", False),
        compression_min=cfg.get("compression_min"),
        audio_gate=cfg.get("audio_gate"),
        quality_model=(
            _load_quality_model(cfg["quality_model"])
            if cfg.get("quality_model")
            else None
        ),
        quality_score_min=cfg.get("quality_score_min", 0.5),
        ppl_model=cfg.get("ppl_model"),
        max_ppl=cfg.get("max_ppl"),
        dsir_target=(
            spark.read.parquet(cfg["dsir_target"]) if cfg.get("dsir_target") else None
        ),
        dsir_n=cfg.get("dsir_n"),
        dsir_temperature=cfg.get("dsir_temperature", 1.0),
        dsir_buckets=cfg.get("dsir_buckets", 65_536),
        dsir_seed=cfg.get("dsir_seed", 0),
        sample_rates=cfg.get("sample_rates"),
        strata_col=cfg.get("strata_col", "lang"),
        target_mixture=cfg.get("target_mixture"),
        mixture_col=cfg.get("mixture_col", "source"),
        benchmark=(
            spark.read.parquet(cfg["benchmark"]) if cfg.get("benchmark") else None
        ),
        contamination_policy=cfg.get("contamination_policy", "drop"),
        shuffle_seed=cfg.get("shuffle_seed", 0),
        splits=cfg.get("splits"),
        split_seed=cfg.get("split_seed", 0),
        pack_budget=cfg.get("pack_budget"),
        chunk_budget=cfg.get("chunk_budget"),
        chunk_overlap=cfg.get("chunk_overlap", 0),
        chunk_by=cfg.get("chunk_by", "tokens"),
        tokenize=cfg.get("tokenize", False),
        vocab_size=cfg.get("vocab_size", 65_536),
        out_dir=cfg["output"],
        partition_by=tuple(cfg.get("partition_by", ())),
        out_mode=mode,
        audit=cfg.get("audit", True),
        checkpoint_dir=cfg.get("checkpoint_dir"),
        checkpoint_stages=(
            set(cfg["checkpoint_stages"]) if cfg.get("checkpoint_stages") else None
        ),
        resume=cfg.get("resume", True),
    )
    if res.sequences is not None and cfg.get("shards_out"):
        if cfg.get("shards_format", "parquet") == "binary":
            if not cfg.get("tokenize"):
                raise ValueError(
                    "shards_format 'binary' requires tokenize: true"
                )
            from xdump_spark.sources.token_shards import write_binary_shards

            write_binary_shards(res.sequences, cfg["shards_out"])
        else:
            res.sequences.write.mode(mode).parquet(cfg["shards_out"])
    if res.chunks is not None and cfg.get("chunks_out"):
        res.chunks.write.mode(mode).parquet(cfg["chunks_out"])
    return res
