"""JSONL corpus source/sink: the de-facto interchange format for
pretraining document dumps (one JSON object per line — what web-crawl
distributions, The Pile-style corpora, and most curation tools ship).

Read contract, built for dirty data at scale:

* an EXPLICIT schema is required (or derived from the standard documents
  shape) — schema inference over 100 TB of JSONL is a full extra pass
  and is disabled here by design;
* malformed lines do not fail the job: each line parses through
  ``from_json``, and the reader returns (clean_frame, corrupt_frame)
  where ``corrupt`` carries the ORIGINAL line verbatim (a quarantine you
  can actually sample and debug, not a re-serialized null husk);
* hive-partitioned layouts work: directory-derived columns (e.g.
  ``lang=en/``) fill their schema fields via coalesce;
* compressed inputs (.gz/.zst per-file) are handled by Spark's codec
  discovery — no flag needed (note: gzip files are unsplittable, so at
  scale prefer many medium files over one giant one).

The sink writes one JSON object per line with corpus_sink's file-count
discipline — including the row-identity bucket column that keeps a
partitioned write from producing ONE file per partition value.
"""

from __future__ import annotations

import math

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

    ``clean`` has exactly the schema's columns; ``corrupt`` is
    (line string) holding the ORIGINAL text of every rejected line —
    count it, sample it, quarantine it, but never let it fail the read.

    Mechanics: lines are read as text (which preserves them verbatim and
    picks up hive partition columns from the directory layout), then
    parsed per-row with ``from_json``. A line is corrupt when it fails
    to parse OR parses to all-null schema fields (structurally-valid
    JSON of the wrong shape); partition-derived columns fill their
    schema fields via coalesce and do not count toward the all-null
    test (they are always present)."""
    schema = schema or DOCUMENTS_SCHEMA
    raw = spark.read.text(path)
    return parse_jsonl_lines(raw, schema)


def parse_jsonl_lines(
    raw: DataFrame, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """The (clean, corrupt) split over an already-read lines frame
    (column ``value`` + optional hive partition columns) — shared by the
    batch reader above and the streaming ingests (``readStream.text``
    produces the same shape, so one parser serves both arrival modes)."""
    part_cols = [c for c in raw.columns if c != "value"]
    parsed = raw.select(
        F.col("value"),
        F.from_json(F.col("value"), schema).alias("_d"),
        *part_cols,
    )
    # from_json: malformed input → null struct (its PERMISSIVE default).
    # Wrong-shape = struct non-null but every PAYLOAD field null
    # (partition-derived fields excluded — they are always present).
    payload = [f.name for f in schema if f.name not in part_cols]
    all_null = None
    for c in payload:
        cond = F.col(f"_d.{c}").isNull()
        all_null = cond if all_null is None else (all_null & cond)
    is_corrupt = F.col("_d").isNull() | (
        all_null if all_null is not None else F.lit(False)
    )
    cols = []
    for f in schema:
        if f.name in part_cols:
            cols.append(
                F.coalesce(F.col(f"_d.{f.name}"), F.col(f.name).cast(f.dataType)).alias(f.name)
            )
        else:
            cols.append(F.col(f"_d.{f.name}").alias(f.name))
    clean = parsed.filter(~is_corrupt).select(*cols)
    corrupt = parsed.filter(is_corrupt).select(F.col("value").alias("line"))
    return clean, corrupt


def write_jsonl_corpus(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    target_file_mb: float = 128,
    mode: str = "errorifexists",
    compression: str | None = None,
) -> None:
    """Write a corpus as JSONL with corpus_sink's file-count discipline:
    the file budget comes from input-file metadata (no sizing scan) and
    a partitioned write repartitions on the partition keys PLUS a
    row-identity bucket — without the bucket, repartition(partition_by)
    would hash rows on the partition columns alone and write ONE file
    per partition value regardless of size (one task writing a ~300 GB
    unsplittable gzip is exactly the failure mode)."""
    from xdump_spark.operators.sizing import input_bytes

    est = input_bytes(df)
    if est is None:
        # No file lineage (curated/shuffled in-memory output — the common
        # case for pipeline results): fall back to one file per core like
        # corpus_sink.write_corpus, never ONE giant unsplittable file.
        n_files = df.sparkSession.sparkContext.defaultParallelism
    else:
        # JSON is ~3× the parquet bytes; aim the partition count at that
        n_files = max(1, math.ceil(3 * est / (target_file_mb * (1 << 20))))
    if partition_by:
        bucket = F.pmod(F.monotonically_increasing_id(), F.lit(n_files))
        out = df.repartition(n_files, *partition_by, bucket.alias("_b"))
        writer = out.write.partitionBy(*partition_by)
    else:
        writer = df.repartition(n_files).write
    writer = writer.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
