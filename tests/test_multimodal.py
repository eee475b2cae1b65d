"""Multimodal operator tests: schema convention, Arrow/mapInPandas
plumbing, stubbed-codec determinism, frame explode shape."""

import hashlib

import pytest
from pyspark.sql import functions as F

from xdump_spark.operators import multimodal as M

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return M.attach_blobs(docs).cache()


def test_attach_blobs_schema(media):
    assert dict(media.dtypes)["blob"] == "binary"
    meta = media.schema["meta"].dataType
    assert [f.name for f in meta.fields] == ["format", "width", "height", "n_frames"]
    row = media.filter("doc_id = 1").first()
    assert bytes(row.blob).decode("utf-8")  # payload is the UTF-8 text


def test_blob_stats_matches_python(media):
    row = M.blob_stats(media).filter("doc_id = 1").first()
    src = media.filter("doc_id = 1").first()
    blob = bytes(src.blob)
    assert row.blob_len == len(blob)
    assert row.blob_md5 == hashlib.md5(blob).hexdigest()
    assert row.format == "jpeg"  # doc_id 1 % 3 == 1


def test_decode_stub_deterministic(spark, media):
    one = M.decode_blobs(media.filter("doc_id <= 10"), use_real_codec=False)
    a = {(r.doc_id, r.mean_luma) for r in one.collect()}
    b = {(r.doc_id, r.mean_luma) for r in one.collect()}
    assert a == b and len(a) > 0
    assert all(0.0 <= luma <= 1.0 for _, luma in a)


def test_decode_real_codec_nulls_synthetic_payloads(media):
    """r5: the real codec path is implemented (pure-numpy PNG/BMP,
    tests/test_imagecodec.py). attach_blobs payloads are text bytes, not
    decodable images — the real path must null those rows per the mixed-
    corpus degradation contract, not raise."""
    rows = M.decode_blobs(media, use_real_codec=True).collect()
    assert rows and all(r.mean_luma is None and r.width is None for r in rows)


def test_sample_frames_shape(media):
    frames = M.sample_frames(media)
    # total frames == sum of n_frames; per-doc count == meta.n_frames
    per_doc = frames.groupBy("doc_id").count()
    want = media.select("doc_id", F.col("meta.n_frames").cast("long").alias("count"))
    got = {(r.doc_id, r["count"]) for r in per_doc.collect()}
    assert got == {(r.doc_id, r["count"]) for r in want.collect()}
    # fingerprint is md5(blob || '#' || idx)
    f0 = frames.filter("doc_id = 1 AND frame_idx = 1").first()
    src = media.filter("doc_id = 1").first()
    assert f0.frame_md5 == hashlib.md5(bytes(src.blob) + b"#1").hexdigest()


def test_repartition_by_bytes(media):
    small = M.repartition_by_bytes(media, target_partition_bytes=10_000)
    total = media.select(F.sum(F.octet_length("blob"))).first()[0]
    assert small.rdd.getNumPartitions() == total // 10_000 + 1


def test_sniff_real_headers(spark):
    """Handcrafted REAL container headers: PNG (big-endian IHDR), GIF89a
    (little-endian logical screen), BMP (little-endian BITMAPINFOHEADER),
    and junk — parsed by pure JVM expressions."""
    import struct

    from pyspark.sql import types as T

    from xdump_spark.operators.multimodal import sniff_image_meta

    png = (
        bytes.fromhex("89504E470D0A1A0A")
        + struct.pack(">I", 13) + b"IHDR"
        + struct.pack(">II", 640, 480)
    )
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 4
    bmp = (
        b"BM" + struct.pack("<IHHI", 0, 0, 0, 54)
        + struct.pack("<I", 40) + struct.pack("<ii", 1024, 768)
    )
    rows = [(1, png), (2, gif), (3, bmp), (4, b"not an image at all")]
    st = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("blob", T.BinaryType())]
    )
    got = {r.doc_id: (r.format, r.width, r.height)
           for r in sniff_image_meta(spark.createDataFrame(rows, st)).collect()}
    assert got[1] == ("png", 640, 480)
    assert got[2] == ("gif", 320, 200)
    assert got[3] == ("bmp", 1024, 768)
    assert got[4] == ("unknown", None, None)


def test_sniff_is_pure_codegen(spark):
    from xdump_spark.operators.multimodal import sniff_image_meta, wrap_png

    docs = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    plan = sniff_image_meta(wrap_png(docs))._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_sniff_topdown_bmp_negative_height(spark):
    import struct

    from pyspark.sql import types as T

    from xdump_spark.operators.multimodal import sniff_image_meta

    bmp = (
        b"BM" + struct.pack("<IHHI", 0, 0, 0, 54)
        + struct.pack("<I", 40) + struct.pack("<ii", 1024, -768)
    )
    st = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("blob", T.BinaryType())]
    )
    r = sniff_image_meta(spark.createDataFrame([(1, bmp)], st)).collect()[0]
    assert (r.format, r.width, r.height) == ("bmp", 1024, 768)


def test_resize_blobs_stub_plumbing(spark):
    from xdump_spark.operators.multimodal import attach_blobs, resize_blobs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40)
    media = attach_blobs(docs)
    out = resize_blobs(media, 64, 48, use_real_codec=False)
    rows = out.collect()
    assert len(rows) == 40
    want_len = max(16, (64 * 48) // 64)
    assert all(r.width == 64 and r.height == 48 for r in rows)
    assert all(len(r.blob) == want_len for r in rows)
    # deterministic across partitionings
    rows2 = {r.doc_id: bytes(r.blob) for r in resize_blobs(media.repartition(5), 64, 48, use_real_codec=False).collect()}
    assert {r.doc_id: bytes(r.blob) for r in rows} == rows2


def test_resize_blobs_real_codec_rejects_nonimage_payloads(spark):
    """r5: resize is an explicit transform — undecodable payloads FAIL
    the job (unlike decode_blobs' per-row nulls), surfacing the
    UnsupportedImageError at action time."""
    from py4j.protocol import Py4JJavaError

    from xdump_spark.operators.multimodal import attach_blobs, resize_blobs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(2)
    out = resize_blobs(attach_blobs(docs), 8, 8, use_real_codec=True)
    with pytest.raises((Py4JJavaError, Exception), match="UnsupportedImageError|unknown image"):
        out.collect()


def test_extract_features_unit_norm_and_knn_integration(spark):
    from xdump_spark.operators.multimodal import attach_blobs, extract_features
    from xdump_spark.operators.similarity import cosine_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    feats = extract_features(attach_blobs(docs), dim=16, use_real_codec=False)
    rows = feats.collect()
    assert len(rows) == 60 and all(len(r.feature) == 16 for r in rows)
    import math

    for r in rows[:5]:
        assert math.isclose(sum(x * x for x in r.feature), 1.0, rel_tol=1e-3)
    # the extractor output feeds the similarity toolkit directly
    queries = feats.limit(3).selectExpr("doc_id AS vec_id", "feature AS embedding")
    corpus = feats.selectExpr("doc_id AS vec_id", "feature AS embedding")
    topk = cosine_topk(corpus, queries, k=3)
    got = topk.collect()
    assert len(got) == 9  # 3 queries x k=3 (self-pairs excluded by design)
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    assert len(by_q) == 3
    for q, hits in by_q.items():
        assert len(hits) == 3
        assert all(h.neighbor_id != q for h in hits)  # self excluded
        assert all(-1.0 <= h.cosine_sim <= 1.0 for h in hits)


def test_extract_features_through_ivf_index(spark):
    """Full multimodal ANN path: blobs -> stub features -> IVF index ->
    search; every query's neighbors come back with sane cosines."""
    from xdump_spark.operators.multimodal import attach_blobs, extract_features
    from xdump_spark.operators.similarity import ivf_build, ivf_search

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    feats = extract_features(attach_blobs(docs), dim=16, use_real_codec=False).selectExpr(
        "doc_id AS vec_id", "feature AS embedding"
    )
    idx = ivf_build(feats, n_cells=8)
    try:
        queries = feats.limit(5)
        got = ivf_search(idx, queries, k=3).collect()
        assert len(got) == 15
        by_q = {}
        for r in got:
            by_q.setdefault(r.query_id, []).append(r.cosine_sim)
        assert len(by_q) == 5
        assert all(all(-1.0 <= s <= 1.0 for s in sims) for sims in by_q.values())
    finally:
        idx.unpersist()
