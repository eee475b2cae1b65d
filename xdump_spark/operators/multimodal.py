"""Multimodal (image/audio/video) column operators.

The reference engine is text/CSV-only (SURVEY.md §1.2 — no binary types
anywhere); this is the brief's scale extension: treat media as opaque
``binary`` columns with typed metadata, and run decode / feature-extract /
frame-sample as Arrow-batched ``mapInPandas`` stages.

The container has no image libraries, so the real-codec path
(``use_real_codec=True``, r5) is a pure-numpy implementation
(operators/imagecodec.py): full PNG decode (all five scanline filters,
the 8-bit color types) + encode, 24-bit BMP decode, nearest-neighbor
resize, and a luma-histogram feature extractor — actual pixels end to
end; r6 adds GIF87a/89a LZW decode (first frame) and makes the real
codec the DEFAULT for decode/resize/extract. Exotic encodings remain
out of scope and error clearly. The deterministic STUB path is
explicit opt-in (``use_real_codec=False``) for hermetic plumbing tests
and for synthetic text-payload corpora (attach_blobs) — it fabricates
md5-derived values, so it must never run silently on real data. Schema
convention, partition-size control, UDF signatures, 1→N frame explode,
and Arrow batch shapes are identical on both paths.

At 100 TB: blobs dominate partition size, so operators here repartition by
byte budget (not row count) before Python stages, keep each Arrow batch
bounded via ``spark.sql.execution.arrow.maxRecordsPerBatch``, and never
collect blobs to the driver.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Schema convention for a multimodal table: payload + typed metadata struct.
BLOB_META = StructType(
    [
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

_FORMATS = ["png", "jpeg", "webm"]


def attach_blobs(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic media table from ``documents``: the payload
    is the UTF-8 byte encoding of the text (so DuckDB can reproduce it with
    ``encode(text)`` for oracle checks) plus derived typed metadata.

    All JVM-side column expressions — this is the ingest-side plumbing a
    real pipeline would replace with a binary-file / parquet-blob reader.
    """
    blob = F.encode(F.col(text_col), "UTF-8")
    fmt = F.element_at(
        F.array(*[F.lit(f) for f in _FORMATS]),
        (F.col(id_col) % len(_FORMATS) + 1).cast("int"),
    )
    return docs.select(
        F.col(id_col),
        blob.alias("blob"),
        F.struct(
            fmt.alias("format"),
            (F.octet_length(blob) % 1920 + 1).cast("int").alias("width"),
            (F.octet_length(blob) % 1080 + 1).cast("int").alias("height"),
            (F.col(id_col) % 7 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def blob_stats(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Cheap JVM-side blob statistics (no Python): length, md5, format.
    The scan-side profile step of a media pipeline — runs at full codegen
    speed, prunes to (id, len, hash) before any expensive Python stage."""
    return media.select(
        F.col(id_col),
        F.octet_length("blob").cast("long").alias("blob_len"),
        F.md5("blob").alias("blob_md5"),
        F.col("meta.format").alias("format"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


# -- binary header parsing (REAL, pure JVM) ---------------------------------


def _be32(col):
    """Integer → 4-byte big-endian binary (JVM expressions only)."""
    return F.unhex(F.lpad(F.hex(col.cast("long")), 8, "0"))


def _read_be32(blob, pos: int):
    """Big-endian uint32 at 1-based byte offset ``pos``."""
    return F.conv(F.hex(F.substring(blob, pos, 4)), 16, 10).cast("long")


def _read_le16(blob, pos: int):
    """Little-endian uint16 at 1-based byte offset ``pos``."""
    return F.conv(
        F.concat(F.hex(F.substring(blob, pos + 1, 1)), F.hex(F.substring(blob, pos, 1))),
        16,
        10,
    ).cast("long")


def _read_le32(blob, pos: int):
    return F.conv(
        F.concat(
            *[F.hex(F.substring(blob, pos + i, 1)) for i in (3, 2, 1, 0)]
        ),
        16,
        10,
    ).cast("long")


def _read_le32_signed_abs(blob, pos: int):
    """|signed little-endian int32| — BITMAPINFOHEADER dims are SIGNED
    (negative height = top-down row order, occasionally negative width in
    the wild); the magnitude is the pixel dimension."""
    v = _read_le32(blob, pos)
    return F.abs(F.when(v >= F.lit(1 << 31), v - F.lit(1 << 32)).otherwise(v))


_PNG_MAGIC = "89504E470D0A1A0A"


def wrap_png(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build REAL PNG-container blobs around the text payload, entirely
    JVM-side: magic + IHDR length/tag + big-endian width/height derived
    from the id (so an oracle can predict them arithmetically) + payload.
    The ingest twin for exercising ``sniff_image_meta`` without image
    libraries — the bytes are a valid PNG signature + IHDR prefix."""
    wid = (F.col(id_col) % 1920 + 1).cast("long")
    hgt = (F.col(id_col) % 1080 + 1).cast("long")
    blob = F.concat(
        F.unhex(F.lit(_PNG_MAGIC)),
        F.unhex(F.lit("0000000D")),          # IHDR chunk length 13
        F.encode(F.lit("IHDR"), "UTF-8"),
        _be32(wid),
        _be32(hgt),
        F.encode(F.col(text_col), "UTF-8"),  # stand-in for the pixel stream
    )
    return docs.select(F.col(id_col), blob.alias("blob"))


def sniff_image_meta(media: DataFrame, blob_col: str = "blob", id_col: str = "doc_id") -> DataFrame:
    """Detect image container format and dimensions from the BINARY HEADER
    with pure whole-stage-codegen expressions — no Python, no codec
    library, no full-blob decode: only the first ~26 bytes of each blob
    are touched. Supports PNG (big-endian IHDR dims), GIF87a/89a
    (little-endian logical-screen dims), and BMP (little-endian
    BITMAPINFOHEADER dims); anything else → format 'unknown', null dims.

    This is the scan-side metadata pass a 100 TB media pipeline runs
    BEFORE any Python decode stage — at full codegen speed with column
    pruning (id + blob prefix only)."""
    b = F.col(blob_col)
    head8 = F.hex(F.substring(b, 1, 8))
    is_png = head8 == _PNG_MAGIC
    sig3 = F.substring(b, 1, 3)
    is_gif = sig3 == F.encode(F.lit("GIF"), "UTF-8")
    is_bmp = F.substring(b, 1, 2) == F.encode(F.lit("BM"), "UTF-8")
    fmt = (
        F.when(is_png, F.lit("png"))
        .when(is_gif, F.lit("gif"))
        .when(is_bmp, F.lit("bmp"))
        .otherwise(F.lit("unknown"))
    )
    width = (
        F.when(is_png, _read_be32(b, 17))
        .when(is_gif, _read_le16(b, 7))
        .when(is_bmp, _read_le32_signed_abs(b, 19))
    )
    height = (
        F.when(is_png, _read_be32(b, 21))
        .when(is_gif, _read_le16(b, 9))
        .when(is_bmp, _read_le32_signed_abs(b, 23))
    )
    return media.select(
        F.col(id_col),
        fmt.alias("format"),
        width.alias("width"),
        height.alias("height"),
    )


# -- decode (STUBBED codec) -------------------------------------------------

_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_luma", DoubleType()),
    ]
)


def _fake_luma(blob: bytes) -> float:
    # STUB: deterministic stand-in for per-pixel luma averaging. Real
    # decoders (Pillow/ffmpeg) are not in this container.
    h = hashlib.md5(blob).digest()
    return round((h[0] * 256 + h[1]) / 65535.0, 6)


def decode_blobs(media: DataFrame, use_real_codec: bool = True) -> DataFrame:
    """Decode each blob to (width, height, mean_luma) via ``mapInPandas``.

    The DEFAULT (r6) is the REAL pure-numpy codec
    (operators/imagecodec.py): PNG (all five scanline filters, the
    common 8-bit color types), 24-bit BMP, and GIF87a/89a (LZW, first
    frame) decode to actual pixel arrays, with width/height/mean_luma
    computed from those pixels — not from metadata. Blobs outside the
    codec's documented coverage (exotic encodings, synthetic stand-in
    payloads) yield NULL width/height/mean_luma rather than failing the
    batch, so a mixed corpus degrades per-row. ``use_real_codec=False``
    opts into the deterministic md5 STUB — hermetic plumbing tests and
    attach_blobs text-payload corpora only; it fabricates plausible
    numbers, so it must never be the silent default for real data.
    """
    if use_real_codec:
        from xdump_spark.operators.imagecodec import (
            UnsupportedImageError,
            decode_image,
            mean_luma,
        )

        import struct
        import zlib

        # Corrupt bytes at corpus scale must null the ROW, not kill the
        # job: every parse failure mode of the codec is enumerated here.
        _DECODE_ERRORS = (UnsupportedImageError, ValueError, zlib.error, struct.error, IndexError)

        def decode_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                ws, hs, ls = [], [], []
                for b in pdf["blob"]:
                    try:
                        img = decode_image(bytes(b))
                        hs.append(img.shape[0])
                        ws.append(img.shape[1])
                        ls.append(mean_luma(img))
                    except _DECODE_ERRORS:
                        ws.append(None)
                        hs.append(None)
                        ls.append(None)
                yield pd.DataFrame(
                    {"doc_id": pdf["doc_id"], "width": ws, "height": hs, "mean_luma": ls}
                )

        return media.select("doc_id", "blob").mapInPandas(
            decode_real, schema=_DECODE_SCHEMA
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "mean_luma": [_fake_luma(bytes(b)) for b in pdf["blob"]],
                }
            )

    flat = media.select(
        "doc_id", "blob", F.col("meta.width").alias("width"), F.col("meta.height").alias("height")
    )
    return flat.mapInPandas(decode, schema=_DECODE_SCHEMA)


# -- frame sampling (1→N explode in Python) ---------------------------------

_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_md5", StringType()),
    ]
)


def sample_frames(media: DataFrame) -> DataFrame:
    """Emit one row per sampled frame: ``meta.n_frames`` frames per blob,
    each fingerprinted as md5(blob || '#' || idx) — a deterministic
    stand-in for decode+hash of the idx-th frame, so the whole 1→N
    ``mapInPandas`` generator stage is oracle-checkable in SQL.

    Memory shape: yields one output DataFrame per (input batch, frame idx)
    instead of materializing len(batch)×n_frames rows at once.
    """

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            max_n = int(pdf["n_frames"].max()) if len(pdf) else 0
            for idx in range(max_n):
                sel = pdf[pdf["n_frames"] > idx]
                if not len(sel):
                    continue
                yield pd.DataFrame(
                    {
                        "doc_id": sel["doc_id"],
                        "frame_idx": idx,
                        "frame_md5": [
                            hashlib.md5(bytes(b) + b"#" + str(idx).encode()).hexdigest()
                            for b in sel["blob"]
                        ],
                    }
                )

    flat = media.select("doc_id", "blob", F.col("meta.n_frames").alias("n_frames"))
    return flat.mapInPandas(expand, schema=_FRAME_SCHEMA)


# -- resize + feature extraction (stubbed codec, real plumbing) ------------

_RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("blob", BinaryType()),
    ]
)


def resize_blobs(
    media: DataFrame, width: int, height: int, use_real_codec: bool = True
) -> DataFrame:
    """Resize every image blob to (width, height) via ``mapInPandas``.

    The DEFAULT (r6) decodes with the pure-numpy codec, resamples
    nearest-neighbor, and re-encodes PNG — real pixels in and out.
    ``use_real_codec=False`` opts into a stub that emits a deterministic stand-in blob
    (md5-of-source payload, length scaled to the target pixel count) so
    the Spark-side plumbing — binary column through Arrow batches, output
    schema, downstream writability — stays testable without real images.
    Batch memory is bounded either way: output blobs are built per Arrow
    batch, never collected.
    """
    if use_real_codec:
        from xdump_spark.operators.imagecodec import (
            decode_image,
            encode_png,
            resize_nearest,
        )

        def resize_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = []
                for b in pdf["blob"]:
                    # decode → nearest-neighbor resample (deterministic
                    # integer index math) → re-encode PNG. Undecodable
                    # blobs propagate their error: a resize stage is an
                    # explicit transform, unlike decode_blobs' per-row
                    # profiling, so silent nulls would corrupt the sink.
                    img = decode_image(bytes(b))
                    out.append(encode_png(resize_nearest(img, width, height)))
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "width": width,
                        "height": height,
                        "blob": out,
                    }
                )

        return media.select("doc_id", "blob").mapInPandas(
            resize_real, schema=_RESIZE_SCHEMA
        )

    target_len = max(16, (width * height) // 64)  # stand-in byte budget

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for b in pdf["blob"]:
                seed = hashlib.md5(bytes(b)).digest()
                reps = target_len // len(seed) + 1
                out.append((seed * reps)[:target_len])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "blob": out,
                }
            )

    return media.select("doc_id", "blob").mapInPandas(resize, schema=_RESIZE_SCHEMA)


def extract_features(
    media: DataFrame,
    dim: int = 16,
    use_real_codec: bool = True,
    on_undecodable: str = "raise",
) -> DataFrame:
    """Per-blob feature vector (doc_id, feature array<float>, unit-norm) —
    the embedding-extraction stage that feeds the similarity toolkit
    (``cosine_topk``/``semantic_dedup`` accept the output directly).

    The DEFAULT (r6) decodes real pixels and emits the
    mean-centered, L2-normalized luma histogram — a real pixel-statistics
    descriptor; a learned (CLIP-style) encoder would slot into the same
    (blob → float[dim]) kernel signature but is not in this container.
    ``use_real_codec=False`` opts into a stub that derives ``dim`` floats
    from the blob's md5 stream
    and L2-normalizes, so vectors are stable across runs/partitionings
    and the plumbing is exercisable without real images.

    ``on_undecodable`` (real path only): ``"raise"`` (default — an
    embedding column with silent holes corrupts downstream ANN joins) or
    ``"skip"`` — DROP undecodable rows (never a null vector), the
    mixed-corpus choice when a pre-filter on decode_blobs' nulls is not
    already in place.
    """
    if on_undecodable not in ("raise", "skip"):
        # A typo like 'fail'/'Raise' must not silently mean 'skip' — the
        # silent-hole outcome this parameter exists to prevent.
        raise ValueError(
            f"on_undecodable must be 'raise' or 'skip', got {on_undecodable!r}"
        )
    if use_real_codec:
        import struct as _struct
        import zlib as _zlib

        from xdump_spark.operators.imagecodec import (
            UnsupportedImageError,
            decode_image,
            luma_histogram_feature,
        )

        _errs = (UnsupportedImageError, ValueError, _zlib.error, _struct.error, IndexError)

        def feats_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                ids, vecs = [], []
                for i, b in zip(pdf["doc_id"], pdf["blob"]):
                    try:
                        v = luma_histogram_feature(decode_image(bytes(b)), dim)
                    except _errs:
                        if on_undecodable == "raise":
                            raise
                        continue  # "skip": drop the row, never a null vector
                    ids.append(i)
                    vecs.append(v.tolist())
                if ids:  # an all-skipped batch yields nothing: Arrow cannot
                    # type an empty object column as list<float>
                    yield pd.DataFrame({"doc_id": ids, "feature": vecs})

        real_schema = StructType(
            [
                StructField("doc_id", LongType()),
                StructField("feature", ArrayType(FloatType())),
            ]
        )
        return media.select("doc_id", "blob").mapInPandas(
            feats_real, schema=real_schema
        )

    import numpy as np

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for b in pdf["blob"]:
                raw = b""
                seed = bytes(b)
                while len(raw) < dim * 2:
                    seed = hashlib.md5(seed).digest()
                    raw += seed
                v = np.frombuffer(raw[: dim * 2], dtype=np.uint16).astype(np.float32)
                v = v - v.mean()
                n = float(np.linalg.norm(v))
                vecs.append((v / n if n else v).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": vecs})

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("feature", ArrayType(FloatType())),
        ]
    )
    return media.select("doc_id", "blob").mapInPandas(feats, schema=schema)


def repartition_by_bytes(
    media: DataFrame, target_partition_bytes: int = 128 << 20, blob_col: str = "blob"
) -> DataFrame:
    """Size-aware repartition before a Python stage: blob tables are skewed
    by byte size, not row count, so pick the partition count from total
    payload bytes. Volume comes from parquet footer metadata — the
    UNCOMPRESSED row-group sizes, because partitions must fit the decoded
    payload in memory and on-disk compressed sizes understate it several-
    fold (at 100 TB an extra sizing scan of the blob column would itself
    be the cost); non-parquet/file-less frames fall back to one
    octet_length aggregate scan."""
    from xdump_spark.operators.sizing import input_uncompressed_bytes

    total = input_uncompressed_bytes(media)
    if total is None:
        total = media.select(F.sum(F.octet_length(blob_col))).first()[0] or 0
    n = max(1, int(total / target_partition_bytes) + 1)
    return media.repartition(n)
