"""Streaming corpus monitor: the stream twins must agree with their
batch anchors over the same documents (multi-micro-batch drain)."""

import glob
import shutil

import pytest

from xdump_spark.streaming.corpus import mixture_stream, quality_monitor_stream
from xdump_spark.streaming.events import run_to_memory

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_batch(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def docs_stream_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("docs_stream")
    out = str(d / "parts")
    spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(4).write.parquet(out)
    yield out
    shutil.rmtree(str(d), ignore_errors=True)


def _stream(spark, docs_stream_dir):
    schema = spark.read.parquet(docs_stream_dir).schema
    assert len(glob.glob(f"{docs_stream_dir}/part-*.parquet")) == 4
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # 4 true micro-batches
        .parquet(f"{docs_stream_dir}/part-*.parquet")
    )


def rows_set(df):
    return {tuple(r) for r in df.collect()}


def test_mixture_stream_matches_batch(spark, docs_batch, docs_stream_dir):
    stream = _stream(spark, docs_stream_dir)
    q = run_to_memory(mixture_stream(stream), "mix_stream", output_mode="complete")
    try:
        got = rows_set(spark.table("mix_stream"))
        want = rows_set(mixture_stream(docs_batch))
        assert got == want and len(got) > 1
    finally:
        q.stop()


def test_quality_monitor_stream_matches_batch(spark, docs_batch, docs_stream_dir):
    stream = _stream(spark, docs_stream_dir)
    q = run_to_memory(
        quality_monitor_stream(stream), "qual_stream", output_mode="complete"
    )
    try:
        got = {r.lang: r for r in spark.table("qual_stream").collect()}
        want = {r.lang: r for r in quality_monitor_stream(docs_batch).collect()}
        assert set(got) == set(want) and len(got) == 5  # the 5 languages
        for lang in want:
            assert got[lang].n_docs == want[lang].n_docs
            # means are summed in micro-batch order on the stream side —
            # compare with a float tolerance, not bitwise
            assert got[lang].mean_ttr == pytest.approx(want[lang].mean_ttr, abs=1e-5)
            assert got[lang].mean_top_frac == pytest.approx(
                want[lang].mean_top_frac, abs=1e-5
            )
    finally:
        q.stop()


def test_cleaning_stage_is_stream_compatible(spark, docs_batch, docs_stream_dir):
    """redact_pii + normalize_text are stateless projections, so the SAME
    operator code runs unchanged inside a stream and agrees with its
    batch run row-for-row (the ingest-time cleaning deployment mode)."""
    from xdump_spark.operators.cleaning import normalize_text, redact_pii

    stream = _stream(spark, docs_stream_dir)
    cleaned = normalize_text(redact_pii(stream))
    q = run_to_memory(cleaned, "clean_stream", output_mode="append")
    try:
        got = rows_set(spark.table("clean_stream"))
        want = rows_set(normalize_text(redact_pii(docs_batch)))
        assert got == want and len(got) == 500
    finally:
        q.stop()


def test_mixture_drift_stream_matches_batch(spark, docs_batch, docs_stream_dir):
    """Stream-vs-batch: after draining all micro-batches, the finished
    drift table equals the batch mixture_drift over the same frames."""
    from xdump_spark.operators.curation import mixture_drift, mixture_stats
    from xdump_spark.streaming.corpus import finish_drift, mixture_drift_stream

    baseline = docs_batch.filter("doc_id < 250")
    stream = _stream(spark, docs_stream_dir)
    q = run_to_memory(
        mixture_drift_stream(stream, baseline), "drift_stream", output_mode="complete"
    )
    try:
        got = {
            r.source: (r.n_docs_after, r.n_tokens_after, r.share_before,
                       r.share_after, r.share_delta)
            for r in finish_drift(spark.table("drift_stream")).collect()
        }
        want = {
            r.source: (r.n_docs_after, r.n_tokens_after, r.share_before,
                       r.share_after, r.share_delta)
            for r in mixture_drift(
                mixture_stats(baseline), mixture_stats(docs_batch)
            ).collect()
        }
        assert got == want and len(got) > 1
    finally:
        q.stop()


def test_stream_quality_scoring_matches_batch(spark, tmp_path):
    """with_quality_score is a pure projection, so it applies to a
    structured stream unchanged — live quality scoring of an ingest
    stream. Drained stream scores must equal the batch scores exactly
    (the pushdown barrier is value-identical under streaming too)."""
    from xdump_spark.operators.classifier import (
        QUALITY_FEATURES,
        LinearModel,
        with_quality_score,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    src, sink, ckpt = (str(tmp_path / d) for d in ("src", "sink", "ckpt"))
    docs.write.parquet(src)
    m = LinearModel(
        features=QUALITY_FEATURES,
        weights=tuple([0.5] * len(QUALITY_FEATURES)),
        bias=-0.2,
        mean=tuple([0.5] * len(QUALITY_FEATURES)),
        std=tuple([1.0] * len(QUALITY_FEATURES)),
    )
    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = (
        with_quality_score(stream, m)
        .select("doc_id", "quality_score")
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.doc_id: r.quality_score for r in spark.read.parquet(sink).collect()}
    want = {
        r.doc_id: r.quality_score
        for r in with_quality_score(docs, m).select("doc_id", "quality_score").collect()
    }
    assert got == want and len(got) == 50


def test_dsir_score_stream_matches_batch(spark, docs_batch, docs_stream_dir):
    """Stateless scoring: the streamed per-doc log-weights must equal the
    batch dsir_score values exactly (same broadcast model, append mode)."""
    from xdump_spark.operators.dsir import dsir_score, fit_dsir
    from xdump_spark.streaming.corpus import dsir_score_stream

    target = docs_batch.filter("doc_id % 9 = 0")
    model = fit_dsir(target, docs_batch, num_buckets=4096)
    stream = _stream(spark, docs_stream_dir)
    q = run_to_memory(
        dsir_score_stream(stream, model), "dsir_stream", output_mode="append"
    )
    try:
        got = rows_set(spark.table("dsir_stream"))
        want = rows_set(dsir_score(docs_batch, model))
        assert got == want and len(got) == docs_batch.count()
    finally:
        q.stop()
