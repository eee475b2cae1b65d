"""WARC / WET crawl-archive source (ISO 28500 — the Common Crawl
layout).

A web-scale corpus does not arrive as parquet: it arrives as ~100k
WARC ("response" records: HTTP headers + raw HTML) or WET ("conversion"
records: extracted text) files of ~1 GB each. This source reads them
straight into DataFrames so the curation pipeline starts at the crawl,
not at someone else's preprocessing.

Scale shape — the unit of parallelism is the FILE, which is exactly how
the format is built to be consumed: each crawl file is a sequence of
independently-gzipped members (one per record), so the file splits
nowhere but file boundaries. ``spark.read.format("binaryFile")`` gives
one row per file (path, content) with no driver-side listing cost, and
an Arrow-batched ``mapInPandas`` parses records member-by-member with
``zlib.decompressobj`` — only ONE record is ever inflated at a time, so
task memory is bounded by the largest single record plus the compressed
file, not the decompressed file. At Common Crawl scale (segments of
~45k WET files) the read is one narrow stage of 45k file-tasks; no
shuffle anywhere.

Malformed input follows the jsonl-source contract: a file that stops
parsing mid-way yields its good prefix of records plus ONE quarantine
row describing the failure (path + byte offset + reason) in the
``_corrupt`` output — a crawl read must never fail the job 3 hours in
because one member has a truncated gzip trailer.
"""

from __future__ import annotations

import io
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

WARC_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("record_idx", LongType(), False),
        StructField("warc_type", StringType(), True),
        StructField("record_id", StringType(), True),
        StructField("target_uri", StringType(), True),
        StructField("warc_date", StringType(), True),
        StructField("content_type", StringType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

CORRUPT_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("byte_offset", LongType(), False),
        StructField("n_good_records", LongType(), False),
        StructField("reason", StringType(), False),
    ]
)


def _iter_members(raw: bytes) -> Iterator[tuple[int, bytes]]:
    """Yield (byte_offset, decompressed_member) for multi-member gzip,
    or the whole buffer once if it isn't gzip (uncompressed .warc)."""
    if raw[:2] != b"\x1f\x8b":
        yield 0, raw
        return
    pos = 0
    n = len(raw)
    view = memoryview(raw)
    CHUNK = 1 << 20
    while pos < n:
        # feed the member in fixed-size slices: a ~1 GB crawl file holds
        # tens of thousands of members, and handing the whole remaining
        # tail to each decompressobj would copy O(members × file) bytes
        d = zlib.decompressobj(wbits=47)  # gzip wrapper
        out = []
        cur = pos
        while True:
            if cur >= n:
                raise ValueError(f"truncated gzip member at byte {pos}")
            piece = view[cur : cur + CHUNK]
            try:
                out.append(d.decompress(piece))
            except zlib.error as ex:
                # corrupt member body (bad method/CRC/stream) — surface
                # as the quarantine contract's ValueError, with offset
                raise ValueError(
                    f"bad gzip member at byte {pos}: {ex}"
                ) from ex
            cur += len(piece)
            if d.eof:
                cur -= len(d.unused_data)
                break
        if cur <= pos:  # defensive: empty member cannot progress
            raise ValueError(f"unprogressing gzip member at byte {pos}")
        yield pos, b"".join(out)
        pos = cur


_WANTED = {
    b"warc-type": "warc_type",
    b"warc-record-id": "record_id",
    b"warc-target-uri": "target_uri",
    b"warc-date": "warc_date",
    b"content-type": "content_type",
    b"content-length": "_len",
}


def _parse_records(buf: bytes, base_offset: int):
    """Parse consecutive WARC records from one decompressed buffer.
    Yields dicts; raises ValueError with a byte offset on malformed
    structure."""
    pos = 0
    n = len(buf)
    while True:
        # skip inter-record CRLFs
        while pos < n and buf[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        if not buf.startswith(b"WARC/", pos):
            raise ValueError(
                f"expected WARC/ version line at byte {base_offset + pos}"
            )
        head_end = buf.find(b"\r\n\r\n", pos)
        if head_end < 0:
            raise ValueError(
                f"unterminated record header at byte {base_offset + pos}"
            )
        fields: dict = {
            "warc_type": None, "record_id": None, "target_uri": None,
            "warc_date": None, "content_type": None, "_len": None,
        }
        for line in buf[pos:head_end].split(b"\r\n")[1:]:
            k, sep, v = line.partition(b":")
            if sep:
                name = _WANTED.get(k.strip().lower())
                if name:
                    fields[name] = v.strip().decode("utf-8", "replace")
        if fields["_len"] is None or not fields["_len"].isdigit():
            raise ValueError(
                f"missing Content-Length at byte {base_offset + pos}"
            )
        length = int(fields.pop("_len"))
        body_start = head_end + 4
        if body_start + length > n:
            raise ValueError(
                f"payload overruns buffer at byte {base_offset + body_start}"
            )
        fields["payload"] = bytes(buf[body_start : body_start + length])
        yield fields
        pos = body_start + length


def read_warc(
    spark: SparkSession,
    path: str,
    types: tuple[str, ...] | None = None,
    path_glob: str = "*",
    decode_text: bool = False,
    decode_http: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Read WARC/WET files under ``path`` → (records, corrupt).

    ``records`` has WARC_SCHEMA (one row per record, payload as raw
    bytes); ``types`` keeps only the named WARC-Types (e.g.
    ``("response",)`` for WARC, ``("conversion",)`` for WET) —
    filtering happens inside the parse task, before payload rows are
    ever handed to Spark. ``corrupt`` has CORRUPT_SCHEMA: one row per
    file whose parse stopped early (its good prefix is still in
    ``records``).

    ``decode_text=True`` adds a ``payload_text`` column decoded INSIDE
    the parse task with ``errors="replace"``. Spark's own ``decode()``
    RAISES on malformed bytes in Spark 4 — one bad byte in one record
    would kill the whole crawl read, the exact failure the quarantine
    contract forbids — so text decoding must happen here, where
    replacement is cheap and per-record.
    """
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", path_glob)
        .load(path)
        .select("path", "content")
    )
    return _split_parsed(files, types, decode_text, decode_http)


_CHARSET_RE = None  # compiled lazily inside the worker


def _http_body_text(payload: bytes) -> str:
    """application/http payload → decoded BODY text: cut the HTTP
    header block, honor its declared charset (falling back to UTF-8),
    always with replacement — a mis-declared page must not kill a
    crawl read. Runs inside the parse task (Python), never as a Spark
    expression."""
    import re

    global _CHARSET_RE
    if _CHARSET_RE is None:
        _CHARSET_RE = re.compile(rb"charset\s*=\s*\"?([A-Za-z0-9_.:-]+)", re.I)
    sep = payload.find(b"\r\n\r\n")
    head, body = (payload[:sep], payload[sep + 4 :]) if sep >= 0 else (b"", payload)
    m = _CHARSET_RE.search(head)
    enc = m.group(1).decode("ascii", "replace") if m else "utf-8"
    try:
        return body.decode(enc, "replace")
    except LookupError:  # unknown/garbage charset label
        return body.decode("utf-8", "replace")


def _split_parsed(
    files: DataFrame,
    types: tuple[str, ...] | None,
    decode_text: bool,
    decode_http: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """(path, content) frame → (records, corrupt); the shared parse
    core of the static readers and the streaming ingest (``files`` may
    be a foreachBatch micro-batch — everything here is stateless).
    ``decode_http`` makes ``payload_text`` the charset-aware HTTP BODY
    (for ``response`` records) instead of the raw utf-8 payload."""
    wanted = set(types) if types else None
    extra = (
        [StructField("payload_text", StringType(), True)] if decode_text else []
    )
    out_schema = StructType(
        WARC_SCHEMA.fields
        + extra
        + [StructField("_err_offset", LongType(), True),
           StructField("_err_reason", StringType(), True)]
    )

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            for path_, content in zip(pdf["path"], pdf["content"]):
                rows, err = [], None
                idx = 0
                try:
                    for off, member in _iter_members(bytes(content)):
                        for rec in _parse_records(member, off):
                            if wanted is None or rec["warc_type"] in wanted:
                                if decode_text:
                                    rec["payload_text"] = (
                                        _http_body_text(rec["payload"])
                                        if decode_http
                                        else rec["payload"].decode(
                                            "utf-8", "replace"
                                        )
                                    )
                                rows.append(
                                    {
                                        "path": path_,
                                        "record_idx": idx,
                                        **rec,
                                        "_err_offset": None,
                                        "_err_reason": None,
                                    }
                                )
                            idx += 1
                except ValueError as ex:
                    import re

                    m = re.search(r"byte (\d+)", str(ex))
                    err = {
                        "path": path_,
                        "record_idx": -1,
                        "warc_type": None, "record_id": None,
                        "target_uri": None, "warc_date": None,
                        "content_type": None, "payload": None,
                        "_err_offset": int(m.group(1)) if m else 0,
                        "_err_reason": str(ex),
                    }
                    if decode_text:
                        err["payload_text"] = None
                if err is not None:
                    rows.append(err)
                if rows:
                    yield pd.DataFrame(rows, columns=[f.name for f in out_schema])

    parsed = files.mapInPandas(parse, schema=out_schema)
    records = parsed.filter(F.col("record_idx") >= 0).drop(
        "_err_offset", "_err_reason"
    )
    good_counts = records.groupBy("path").agg(
        F.count("*").alias("n_good_records")
    )
    corrupt = (
        parsed.filter(F.col("record_idx") < 0)
        .select(
            "path",
            F.col("_err_offset").alias("byte_offset"),
            F.col("_err_reason").alias("reason"),
        )
        .join(good_counts, "path", "left")
        .select(
            "path", "byte_offset",
            F.coalesce("n_good_records", F.lit(0)).alias("n_good_records"),
            "reason",
        )
    )
    return records, corrupt


def read_wet(
    spark: SparkSession, path: str, path_glob: str = "*"
) -> tuple[DataFrame, DataFrame]:
    """WET convenience: conversion records as (doc_id, url, date, text)
    — ready for ``prepare_training_corpus`` (utf-8 with replacement; a
    text extract is not allowed to kill the read over one bad byte).
    ``doc_id`` is a deterministic 64-bit id hashed from (path,
    record_idx) — stable across re-reads and cluster layouts."""
    records, corrupt = read_warc(spark, path, types=("conversion",),
                                 path_glob=path_glob, decode_text=True)
    docs = records.select(
        F.xxhash64("path", "record_idx").alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.col("warc_date").alias("date"),
        F.col("payload_text").alias("text"),
    )
    return docs, corrupt


def read_warc_html(
    spark: SparkSession, path: str, path_glob: str = "*"
) -> tuple[DataFrame, DataFrame]:
    """Full-WARC convenience: ``response`` records as (doc_id, url,
    date, text) where text is the RAW HTML body — the HTTP header
    block is cut and the body decoded with its DECLARED charset
    (``Content-Type: ...; charset=...`` in the HTTP headers, falling
    back to utf-8), always with replacement: a web crawl is ~1/3
    non-UTF-8 and a mis-declared page must not kill the read. The raw
    bytes survive in ``read_warc`` for callers needing the original
    encoding. Feed the result to
    ``prepare_training_corpus(markup=True, ...)`` to strip tags."""
    records, corrupt = read_warc(spark, path, types=("response",),
                                 path_glob=path_glob, decode_text=True,
                                 decode_http=True)
    docs = records.select(
        F.xxhash64("path", "record_idx").alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.col("warc_date").alias("date"),
        F.col("payload_text").alias("text"),
    )
    return docs, corrupt


# binaryFile's fixed schema — streaming sources must state it explicitly
_BINARYFILE_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("modificationTime", TimestampType(), False),
        StructField("length", LongType(), False),
        StructField("content", BinaryType(), True),
    ]
)


def streaming_wet_ingest(
    spark: SparkSession,
    input_dir: str,
    store,
    out_dir: str,
    checkpoint_dir: str,
    corrupt_dir: str | None = None,
    path_glob: str = "*",
    text_col: str = "text",
    trigger: dict | None = None,
):
    """Continuous crawl ingestion: WET files LANDING in ``input_dir``
    (a crawler drop directory) stream through parse → exact dedup
    against the persistent ``store`` (ExactHashStore) → append to
    ``out_dir`` parquet; corrupt files quarantine to ``corrupt_dir``.

    This is the crawl front-door as one restart-safe query: the file
    stream's checkpoint remembers which crawl files were consumed, the
    bucketed hash store carries the dedup history, and the same ordered
    at-least-once discipline as ``streaming_exact_dedup`` applies —
    output parquet is written BEFORE the store commit, so a crash can
    duplicate (dedupable by doc_id) but never lose. ``trigger``
    defaults to ``{"availableNow": True}`` (drain-and-stop; pass
    ``{"processingTime": "1 minute"}`` for the always-on mode)."""
    from xdump_spark.operators.incremental import incremental_exact_dedup

    files = (
        spark.readStream.format("binaryFile")
        .option("pathGlobFilter", path_glob)
        .schema(_BINARYFILE_SCHEMA)
        .load(input_dir)
        .select("path", "content")
    )

    def _do_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        records, corrupt = _split_parsed(batch_df, ("conversion",), True)
        docs = records.select(
            F.xxhash64("path", "record_idx").alias("doc_id"),
            F.col("target_uri").alias("url"),
            F.col("warc_date").alias("date"),
            F.col("payload_text").alias(text_col),
        ).localCheckpoint(eager=True)
        if corrupt_dir is not None:
            corrupt.write.mode("append").parquet(corrupt_dir)
        accepted, commit = incremental_exact_dedup(
            docs, store, text_col=text_col, id_col="doc_id",
            defer_commit=True,
        )
        kept = docs.join(
            accepted.withColumnRenamed("id", "doc_id"), "doc_id", "left_semi"
        )
        kept.write.mode("append").parquet(out_dir)
        commit()

    writer = files.writeStream.foreachBatch(_do_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    return writer.trigger(**(trigger or {"availableNow": True})).start()


def write_wet(records, out_path: str) -> None:
    """Test/round-trip helper: write (url, date, text) rows as ONE
    multi-member-gzip WET file (driver-side — fixtures and golden
    files, not a production sink; the corpus sink family covers that)."""
    import gzip

    with open(out_path, "wb") as fh:
        for r in records:
            if "html" in r:
                # a WARC "response" record: HTTP header block + body,
                # optionally in a declared non-UTF-8 charset
                cs = r.get("charset", "utf-8")
                body = r["html"].encode(cs)
                payload = (
                    b"HTTP/1.1 200 OK\r\n"
                    + f"Content-Type: text/html; charset={cs}\r\n".encode()
                    + f"Content-Length: {len(body)}\r\n\r\n".encode()
                    + body
                )
                rec_type, ctype = b"response", b"application/http; msgtype=response"
            else:
                payload = r["text"].encode("utf-8")
                rec_type, ctype = b"conversion", b"text/plain"
            head = (
                b"WARC/1.0\r\n"
                b"WARC-Type: " + rec_type + b"\r\n"
                + f"WARC-Target-URI: {r['url']}\r\n".encode()
                + f"WARC-Date: {r.get('date', '2026-01-01T00:00:00Z')}\r\n".encode()
                + b"Content-Type: " + ctype + b"\r\n"
                + f"Content-Length: {len(payload)}\r\n".encode()
                + b"\r\n"
            )
            member = head + payload + b"\r\n\r\n"
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb") as gz:
                gz.write(member)
            fh.write(buf.getvalue())
