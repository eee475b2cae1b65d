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
    one = M.decode_blobs(media.filter("doc_id <= 10"))
    a = {(r.doc_id, r.mean_luma) for r in one.collect()}
    b = {(r.doc_id, r.mean_luma) for r in one.collect()}
    assert a == b and len(a) > 0
    assert all(0.0 <= luma <= 1.0 for _, luma in a)


def test_decode_real_codec_raises(media):
    with pytest.raises(NotImplementedError):
        M.decode_blobs(media, use_real_codec=True)


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
