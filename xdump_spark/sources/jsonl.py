"""JSONL corpus source/sink: the de-facto interchange format for
pretraining document dumps (one JSON object per line — what web-crawl
distributions, The Pile-style corpora, and most curation tools ship).

Read contract, built for dirty data at scale:

* an EXPLICIT schema is required (or derived from the standard documents
  shape) — schema inference over 100 TB of JSONL is a full extra pass
  and is disabled here by design;
* malformed lines do not fail the job: PERMISSIVE mode routes them to a
  ``_corrupt_record`` column, and the reader returns (clean_frame,
  corrupt_frame) so the pipeline can quarantine instead of crash;
* compressed inputs (.gz/.zst per-file) are handled by Spark's codec
  discovery — no flag needed (note: gzip files are unsplittable, so at
  scale prefer many medium files over one giant one).

The sink writes one JSON object per line via Spark's json writer with
the same file-count discipline as corpus_sink (metadata-derived, no
sizing scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the standard documents-table shape (TESTDATA.md) as a JSONL schema
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL document corpus → (clean, corrupt).

    ``clean`` has exactly the schema's columns (no corrupt column);
    ``corrupt`` is (line string) for every row the parser rejected —
    count it, sample it, quarantine it, but never let it fail the read.
    A row is corrupt when the parser flags it OR when every schema
    column is null (PERMISSIVE's signature for structurally-valid JSON
    of the wrong shape)."""
    schema = schema or DOCUMENTS_SCHEMA
    with_corrupt = T.StructType(
        list(schema) + [T.StructField("_corrupt_record", T.StringType())]
    )
    raw = (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    cols = [f.name for f in schema]
    all_null = None
    for c in cols:
        cond = F.col(c).isNull()
        all_null = cond if all_null is None else (all_null & cond)
    is_corrupt = F.col("_corrupt_record").isNotNull() | all_null
    clean = raw.filter(~is_corrupt).select(*cols)
    corrupt = raw.filter(is_corrupt).select(
        F.coalesce(F.col("_corrupt_record"), F.to_json(F.struct(*cols))).alias("line")
    )
    return clean, corrupt


def write_jsonl_corpus(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    target_file_mb: int = 128,
    mode: str = "errorifexists",
    compression: str | None = None,
) -> None:
    """Write a corpus as JSONL with corpus_sink's file-count discipline:
    the file budget comes from input-file metadata (no sizing scan),
    rows are repartitioned to it, and ``compression`` ("gzip", "zstd",
    ...) applies per output file."""
    import math

    from xdump_spark.operators.sizing import input_bytes

    total = input_bytes(df) or 0
    # JSON is ~3× the parquet bytes; aim the partition count at that
    n_files = max(1, math.ceil(3 * total / (target_file_mb << 20)))
    out = df.repartition(n_files, *partition_by) if partition_by else df.repartition(n_files)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
