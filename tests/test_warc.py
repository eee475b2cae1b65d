"""WARC/WET crawl-archive source: record parsing, multi-member gzip,
quarantine contract, WET convenience reader, pipeline handoff."""

import gzip
import io

import pytest
from pyspark.sql import functions as F

from xdump_spark.sources.warc import read_warc, read_wet, write_wet

DOCS = [
    {"url": "http://a.example.com/1", "date": "2026-01-02T03:04:05Z",
     "text": "first extracted document text"},
    {"url": "http://b.example.org/2", "date": "2026-01-02T03:04:06Z",
     "text": "second text with unicode: café — ok"},
    {"url": "http://a.example.com/3", "date": "2026-01-02T03:04:07Z",
     "text": "third document\nwith two lines"},
]


@pytest.fixture()
def wet_dir(tmp_path):
    d = tmp_path / "wet"
    d.mkdir()
    write_wet(DOCS[:2], str(d / "part-0.warc.wet.gz"))
    write_wet(DOCS[2:], str(d / "part-1.warc.wet.gz"))
    return str(d)


def test_read_wet_values_and_ids(spark, wet_dir):
    docs, corrupt = read_wet(spark, wet_dir)
    rows = {r.url: r for r in docs.collect()}
    assert set(rows) == {d["url"] for d in DOCS}
    for d in DOCS:
        r = rows[d["url"]]
        assert r.text == d["text"]
        assert r.date == d["date"]
    assert corrupt.count() == 0
    # doc_id: 64-bit, deterministic across re-reads
    ids1 = sorted(r.doc_id for r in docs.collect())
    ids2 = sorted(r.doc_id for r in read_wet(spark, wet_dir)[0].collect())
    assert ids1 == ids2 and len(set(ids1)) == 3


def test_read_warc_full_schema_and_type_filter(spark, wet_dir, tmp_path):
    recs, _ = read_warc(spark, wet_dir)
    assert recs.count() == 3
    r = recs.filter(F.col("target_uri") == DOCS[0]["url"]).collect()[0]
    assert r.warc_type == "conversion"
    assert r.content_type == "text/plain"
    assert bytes(r.payload) == DOCS[0]["text"].encode()
    # type filter drops everything when no record matches
    none, _ = read_warc(spark, wet_dir, types=("response",))
    assert none.count() == 0


def test_uncompressed_warc_supported(spark, tmp_path):
    """A plain (non-gzip) .warc file parses identically."""
    gz = tmp_path / "a.wet.gz"
    write_wet(DOCS[:1], str(gz))
    raw = gzip.decompress(gz.read_bytes())
    plain_dir = tmp_path / "plain"
    plain_dir.mkdir()
    (plain_dir / "a.warc").write_bytes(raw)
    docs, corrupt = read_wet(spark, str(plain_dir))
    assert corrupt.count() == 0
    assert [r.text for r in docs.collect()] == [DOCS[0]["text"]]


def test_corrupt_file_quarantines_not_fails(spark, tmp_path):
    """A truncated member yields the good prefix + ONE corrupt row with
    offset and reason; clean sibling files are unaffected."""
    d = tmp_path / "wet"
    d.mkdir()
    write_wet(DOCS[:2], str(d / "good.wet.gz"))
    # bad file: one good member, then a truncated gzip member
    buf = io.BytesIO()
    write_wet(DOCS[2:], str(d / "tmp.gz"))
    good_member = (d / "tmp.gz").read_bytes()
    (d / "tmp.gz").unlink()
    (d / "bad.wet.gz").write_bytes(good_member + good_member[: len(good_member) // 2])

    docs, corrupt = read_wet(spark, str(d))
    assert docs.count() == 3  # 2 from good + the good prefix of bad
    bad = corrupt.collect()
    assert len(bad) == 1
    assert bad[0].path.endswith("bad.wet.gz")
    assert bad[0].n_good_records == 1
    assert "truncated" in bad[0].reason
    assert bad[0].byte_offset == len(good_member)


def test_garbage_header_quarantines(spark, tmp_path):
    d = tmp_path / "wet"
    d.mkdir()
    blob = io.BytesIO()
    with gzip.GzipFile(fileobj=blob, mode="wb") as gz:
        gz.write(b"HTTP/1.1 200 OK\r\n\r\nnot a warc at all")
    (d / "x.wet.gz").write_bytes(blob.getvalue())
    docs, corrupt = read_wet(spark, str(d))
    assert docs.count() == 0
    row = corrupt.collect()[0]
    assert "expected WARC/" in row.reason and row.n_good_records == 0


def test_wet_feeds_pipeline(spark, wet_dir):
    """The crawl → curate handoff: read_wet output goes straight into
    prepare_training_corpus with the URL stages on."""
    from xdump_spark.pipeline import prepare_training_corpus

    docs, _ = read_wet(spark, wet_dir)
    res = prepare_training_corpus(
        docs, span_k=None, min_tokens=1, dedup_urls=True, domain_cap=1
    )
    # 3 distinct URLs; domain cap 1 keeps one per registrable domain
    assert res.audit["url_deduped"] == 3
    assert res.audit["domain_capped"] == 2   # example.com + example.org
    assert res.corpus.count() == 2


def test_cli_curate_from_wet(spark, wet_dir, tmp_path, capsys):
    """One command from crawl files to curated corpus:
    curate --input-format wet with URL stages."""
    from xdump_spark import cli

    out = str(tmp_path / "corpus")
    args = cli.build_parser().parse_args(
        [
            "curate", "-i", wet_dir, "-o", out,
            "--input-format", "wet",
            "--span-k", "0", "--min-tokens", "1",
            "--dedup-urls",
        ]
    )
    assert cli.run(args, spark) == 0
    printed = capsys.readouterr().out
    assert "url_deduped: 3 docs" in printed
    got = spark.read.parquet(out)
    assert got.count() == 3
    assert {"doc_id", "url", "date", "text"} <= set(got.columns)


def test_config_curate_from_wet(spark, wet_dir, tmp_path):
    import json

    from xdump_spark.config import curate_from_config

    cfg = {
        "input": wet_dir, "input_format": "wet",
        "output": str(tmp_path / "out"),
        "span_k": None, "min_tokens": 1, "dedup_urls": True,
    }
    p = tmp_path / "c.json"
    p.write_text(json.dumps(cfg))
    res = curate_from_config(spark, str(p))
    assert res.audit["url_deduped"] == 3

    bad = dict(cfg, input_format="csvish")
    p2 = tmp_path / "c2.json"
    p2.write_text(json.dumps(bad))
    with pytest.raises(ValueError, match="input_format"):
        curate_from_config(spark, str(p2))


def test_read_warc_html_response_records(spark, tmp_path):
    """Full-WARC path: response records' HTTP header block is cut, the
    HTML body survives verbatim, and markup=True in the pipeline strips
    it to text."""
    from xdump_spark.pipeline import prepare_training_corpus
    from xdump_spark.sources.warc import read_warc_html

    d = tmp_path / "warc"
    d.mkdir()
    pages = [
        {"url": "http://w.example.com/a",
         "html": "<html><body><p>real page text one</p></body></html>"},
        {"url": "http://w.example.com/b",
         "html": "<html><body>second page &amp; entity</body></html>"},
    ]
    write_wet(pages, str(d / "crawl.warc.gz"))
    docs, corrupt = read_warc_html(spark, str(d))
    assert corrupt.count() == 0
    rows = {r.url: r.text for r in docs.collect()}
    assert rows["http://w.example.com/a"] == pages[0]["html"]
    # WET reader sees no conversion records in a response-only file
    assert read_wet(spark, str(d))[0].count() == 0

    res = prepare_training_corpus(docs, span_k=None, min_tokens=1, markup=True)
    texts = {r.text for r in res.corpus.collect()}
    assert "real page text one" in texts
    assert any("second page & entity" in t for t in texts)


def test_bad_utf8_replaces_not_fails(spark, tmp_path):
    """A malformed UTF-8 byte in one record must NOT kill the read
    (Spark's own decode() raises in Spark 4): the parse-task decode
    replaces and the record survives."""
    d = tmp_path / "wet"
    d.mkdir()
    body = b"good text then bad byte \xff then more"
    head = (
        b"WARC/1.0\r\nWARC-Type: conversion\r\n"
        b"WARC-Target-URI: http://x.example.com/bad\r\n"
        b"WARC-Date: 2026-01-01T00:00:00Z\r\nContent-Type: text/plain\r\n"
        + f"Content-Length: {len(body)}\r\n\r\n".encode()
    )
    blob = io.BytesIO()
    with gzip.GzipFile(fileobj=blob, mode="wb") as gz:
        gz.write(head + body + b"\r\n\r\n")
    (d / "bad-bytes.wet.gz").write_bytes(blob.getvalue())

    docs, corrupt = read_wet(spark, str(d))
    assert corrupt.count() == 0
    [r] = docs.collect()
    assert r.text == body.decode("utf-8", "replace")
    assert "�" in r.text


def test_many_members_chunked_inflate(spark, tmp_path):
    """1500 members in one file exercise the incremental (chunked)
    member walk — offsets and record order must survive."""
    d = tmp_path / "wet"
    d.mkdir()
    recs = [{"url": f"http://m.example.com/{i}", "text": f"doc {i} " + "x" * 50}
            for i in range(1500)]
    write_wet(recs, str(d / "many.wet.gz"))
    docs, corrupt = read_wet(spark, str(d))
    assert corrupt.count() == 0
    rows = sorted(
        (int(r.url.rsplit("/", 1)[1]), r.text) for r in docs.collect()
    )
    assert len(rows) == 1500
    assert rows[0] == (0, recs[0]["text"]) and rows[1499] == (1499, recs[1499]["text"])


def test_streaming_wet_ingest_e2e(spark, tmp_path):
    """Continuous crawl ingestion: files land, stream-parse, dedup
    against the persistent store, append to corpus parquet; a second
    drain picks up ONLY new files, drops re-crawled texts, and
    quarantines corrupt arrivals."""
    import uuid

    from xdump_spark.operators.incremental import ExactHashStore
    from xdump_spark.sources.warc import streaming_wet_ingest

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    out = str(tmp_path / "corpus")
    bad_out = str(tmp_path / "corrupt")
    ckpt = str(tmp_path / "ckpt")
    name = f"seen_{uuid.uuid4().hex[:8]}"
    store = ExactHashStore(spark, name, n_buckets=4,
                           path=str(tmp_path / name))
    try:
        write_wet(DOCS[:2], str(inbox / "crawl-0.wet.gz"))
        q = streaming_wet_ingest(
            spark, str(inbox), store, out, ckpt, corrupt_dir=bad_out
        )
        q.awaitTermination(120)
        first = spark.read.parquet(out)
        assert first.count() == 2
        assert store.read().count() == 2

        # second drop: one re-crawl of DOCS[0] (new file, same text),
        # one new doc, one corrupt file
        write_wet([DOCS[0], DOCS[2]], str(inbox / "crawl-1.wet.gz"))
        (inbox / "crawl-2.wet.gz").write_bytes(b"\x1f\x8b garbage")
        q2 = streaming_wet_ingest(
            spark, str(inbox), store, out, ckpt, corrupt_dir=bad_out
        )
        q2.awaitTermination(120)
        final = spark.read.parquet(out)
        assert final.count() == 3                       # only DOCS[2] added
        assert sorted(r.url for r in final.collect()) == sorted(
            d["url"] for d in DOCS
        )
        assert store.read().count() == 3
        bad = spark.read.parquet(bad_out).collect()
        assert len(bad) == 1 and bad[0].path.endswith("crawl-2.wet.gz")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_read_warc_html_honors_declared_charset(spark, tmp_path):
    """A latin-1 page with its charset declared in the HTTP headers
    decodes to the right characters; a garbage charset label falls back
    to utf-8-replace instead of failing."""
    from xdump_spark.sources.warc import read_warc_html

    d = tmp_path / "warc"
    d.mkdir()
    pages = [
        {"url": "http://l1.example.com/", "charset": "latin-1",
         "html": "<p>café and naïveté — ±</p>".replace("—", "-")},
        {"url": "http://u8.example.com/", "html": "<p>utf-8 café</p>"},
    ]
    write_wet(pages, str(d / "crawl.warc.gz"))
    docs, corrupt = read_warc_html(spark, str(d))
    assert corrupt.count() == 0
    rows = {r.url: r.text for r in docs.collect()}
    assert rows["http://l1.example.com/"] == pages[0]["html"]
    assert rows["http://u8.example.com/"] == pages[1]["html"]

    # garbage charset label: falls back, never raises
    raw = gzip.decompress((d / "crawl.warc.gz").read_bytes())
    # same LENGTH as "utf-8" so the WARC Content-Length stays valid
    patched = raw.replace(b"charset=utf-8", b"charset=zz-99")
    d2 = tmp_path / "warc2"
    d2.mkdir()
    blob = io.BytesIO()
    with gzip.GzipFile(fileobj=blob, mode="wb") as gz:
        gz.write(patched)
    (d2 / "x.warc.gz").write_bytes(blob.getvalue())
    docs2, corrupt2 = read_warc_html(spark, str(d2))
    assert corrupt2.count() == 0 and docs2.count() == 2
