"""Real-codec tests: pure-numpy PNG/BMP kernels (operators/imagecodec.py)
and the use_real_codec=True paths of the multimodal operators.

No image library exists in this container, so correctness is established
two independent ways: (a) encode→decode round-trips must be bit-exact,
and (b) a spec-reference FILTER implementation (written here, forward
direction per the PNG spec pseudocode) produces streams the decoder must
invert for every filter type — the decoder is tested against the spec,
not against itself.
"""

import struct
import zlib

import numpy as np
import pytest

from xdump_spark.operators.imagecodec import (
    UnsupportedImageError,
    decode_bmp,
    decode_gif,
    decode_image,
    decode_png,
    encode_png,
    luma_histogram_feature,
    mean_luma,
    resize_nearest,
)


def _rng(seed=7):
    return np.random.default_rng(seed)


# ------------------------------------------------------- PNG round-trip ----
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_bit_exact(channels):
    img = _rng(channels).integers(0, 256, size=(13, 17, channels), dtype=np.uint8)
    out = decode_png(encode_png(img))
    assert out.shape == (13, 17, channels)
    assert np.array_equal(out, img)


def test_png_roundtrip_gray_2d_input():
    img = _rng(1).integers(0, 256, size=(5, 9), dtype=np.uint8)
    out = decode_png(encode_png(img))
    assert np.array_equal(out[:, :, 0], img)


# --------------------------------------- spec-reference filter coverage ----
def _spec_filter_row(ftype, raw, prev, bpp):
    """FORWARD filter per the PNG spec pseudocode (the encoder side the
    production code does not implement for types 1-4)."""
    n = len(raw)
    out = np.zeros(n, dtype=np.int32)
    for j in range(n):
        a = int(raw[j - bpp]) if j >= bpp else 0   # left (reconstructed)
        b = int(prev[j])                            # up
        c = int(prev[j - bpp]) if j >= bpp else 0   # upper-left
        x = int(raw[j])
        if ftype == 0:
            out[j] = x
        elif ftype == 1:
            out[j] = (x - a) % 256
        elif ftype == 2:
            out[j] = (x - b) % 256
        elif ftype == 3:
            out[j] = (x - (a + b) // 2) % 256
        elif ftype == 4:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[j] = (x - pred) % 256
    return out.astype(np.uint8)


def _png_with_filters(img, ftypes):
    """Build a PNG whose row r uses filter type ftypes[r % len(ftypes)]."""
    h, w, c = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    flat = img.reshape(h, w * c)
    prev = np.zeros(w * c, dtype=np.uint8)
    lines = []
    for y in range(h):
        ft = ftypes[y % len(ftypes)]
        lines.append(bytes([ft]) + _spec_filter_row(ft, flat[y], prev, c).tobytes())
        prev = flat[y]
    idat = zlib.compress(b"".join(lines))

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_unfilter_each_type_vs_spec(ftype):
    img = _rng(ftype).integers(0, 256, size=(9, 11, 3), dtype=np.uint8)
    blob = _png_with_filters(img, [ftype])
    assert np.array_equal(decode_png(blob), img)


def test_png_unfilter_mixed_rows_vs_spec():
    img = _rng(42).integers(0, 256, size=(20, 7, 4), dtype=np.uint8)
    blob = _png_with_filters(img, [0, 1, 2, 3, 4])  # cycle all five
    assert np.array_equal(decode_png(blob), img)


def test_png_palette_expands_to_rgb():
    # 4-entry palette, 2x3 index image
    plte = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], dtype=np.uint8)
    idx = np.array([[0, 1, 2], [3, 0, 1]], dtype=np.uint8)
    h, w = idx.shape
    lines = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    blob = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", plte.tobytes())
        + chunk(b"IDAT", zlib.compress(lines))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(blob), plte[idx])


def test_png_unsupported_variants_error_clearly():
    img = _rng(1).integers(0, 256, size=(2, 2, 3), dtype=np.uint8)
    blob = bytearray(encode_png(img))
    # IHDR starts at offset 16 (8 magic + 4 len + 4 tag): depth byte at +8
    blob[16 + 8] = 16
    with pytest.raises(UnsupportedImageError, match="bit depth 16"):
        decode_png(bytes(blob))
    blob = bytearray(encode_png(img))
    blob[16 + 12] = 1  # interlace flag
    with pytest.raises(UnsupportedImageError, match="interlaced"):
        decode_png(bytes(blob))
    with pytest.raises(UnsupportedImageError, match="signature"):
        decode_png(b"JUNKJUNKJUNK")


# ------------------------------------------------------------------ BMP ----
def _make_bmp24(img, top_down=False):
    """Hand-rolled 24-bit BI_RGB BMP writer (test-side reference)."""
    h, w, _ = img.shape
    row = (w * 3 + 3) & ~3
    pad = row - w * 3
    bgr = img[:, :, ::-1]
    rows = bgr if top_down else bgr[::-1]
    body = b"".join(rows[y].tobytes() + b"\x00" * pad for y in range(h))
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24, 0, len(body), 0, 0, 0, 0
    )
    return hdr + info + body


@pytest.mark.parametrize("top_down", [False, True])
def test_bmp24_roundtrip(top_down):
    img = _rng(3).integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(_make_bmp24(img, top_down)), img)


def test_bmp_unsupported_depth_errors():
    img = _rng(3).integers(0, 256, size=(2, 2, 3), dtype=np.uint8)
    blob = bytearray(_make_bmp24(img))
    blob[28] = 8  # bits-per-pixel
    with pytest.raises(UnsupportedImageError, match="8-bit"):
        decode_bmp(bytes(blob))


# ----------------------------------------------------------------- GIF -----
def _lzw_encode(min_code_size, indices):
    """Spec-forward GIF LZW compressor (test-side reference writer — the
    production code only decodes). Variable code width, clear/end codes."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    next_code = end + 1
    table = {bytes([i]): i for i in range(clear)}
    buf, nbits, out = 0, 0, bytearray()

    def emit(code):
        nonlocal buf, nbits
        buf |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8

    emit(clear)
    w = b""
    for k in indices:
        wk = w + bytes([int(k)])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        table[wk] = next_code
        next_code += 1
        if next_code > (1 << code_size) and code_size < 12:
            code_size += 1
        w = bytes([int(k)])
    if w:
        emit(table[w])
        # the decoder appends one entry after this code and may grow the
        # width before reading END — mirror that
        next_code += 1
        if next_code > (1 << code_size) and code_size < 12:
            code_size += 1
    emit(end)
    if nbits:
        out.append(buf & 0xFF)
    return bytes(out)


_INTERLACE_ROWS = lambda h: np.concatenate(  # noqa: E731
    [np.arange(0, h, 8), np.arange(4, h, 8), np.arange(2, h, 4), np.arange(1, h, 2)]
)


def _make_gif(
    img,
    interlace=False,
    version=b"GIF89a",
    local_table=False,
    screen=None,
    offset=(0, 0),
    bg_idx=0,
    with_extension=False,
):
    """RGB (H, W, 3) uint8 → GIF bytes via palette quantization on the
    image's (≤256) unique colors."""
    h, w = img.shape[:2]
    colors, inv = np.unique(img.reshape(-1, 3), axis=0, return_inverse=True)
    assert len(colors) <= 256, "test image must have <=256 unique colors"
    pal_bits = max(1, int(np.ceil(np.log2(max(2, len(colors))))))
    n_pal = 1 << pal_bits
    palette = np.zeros((n_pal, 3), dtype=np.uint8)
    palette[: len(colors)] = colors
    idx = inv.reshape(h, w).astype(np.uint8)
    if interlace:
        idx = idx[_INTERLACE_ROWS(h)]
    mcs = max(2, pal_bits)
    sw, sh = screen if screen else (w, h)
    left, top = offset
    out = bytearray()
    out += version + struct.pack("<HH", sw, sh)
    if local_table:
        out += bytes([0x00, bg_idx, 0])  # no global table
    else:
        out += bytes([0x80 | (pal_bits - 1), bg_idx, 0])
        out += palette.tobytes()
    if with_extension:  # a Graphics Control Extension to skip over
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    out += b"\x2c" + struct.pack("<HHHH", left, top, w, h)
    ipacked = (0x40 if interlace else 0) | (0x80 | (pal_bits - 1) if local_table else 0)
    out += bytes([ipacked])
    if local_table:
        out += palette.tobytes()
    out += bytes([mcs])
    data = _lzw_encode(mcs, idx.ravel())
    for i in range(0, len(data), 255):
        blockette = data[i : i + 255]
        out += bytes([len(blockette)]) + blockette
    out += b"\x00\x3b"
    return bytes(out)


def test_gif_roundtrip_basic():
    img = _rng(21).integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_gif(_make_gif(img)), img)
    # full dispatch path too
    assert np.array_equal(decode_image(_make_gif(img)), img)


def test_gif_roundtrip_interlaced():
    img = _rng(22).integers(0, 8, size=(17, 5, 3), dtype=np.uint8) * 31
    assert np.array_equal(decode_gif(_make_gif(img, interlace=True)), img)


def test_gif_local_table_extension_and_87a():
    img = _rng(23).integers(0, 4, size=(6, 6, 3), dtype=np.uint8) * 80
    blob = _make_gif(img, version=b"GIF87a", local_table=True, with_extension=True)
    assert np.array_equal(decode_gif(blob), img)


def test_gif_frame_composed_onto_screen():
    img = np.full((2, 3, 3), 200, dtype=np.uint8)
    img[0, 0] = (10, 20, 30)  # ensure 2 colors so bg != frame fill
    blob = _make_gif(img, screen=(6, 5), offset=(2, 1), bg_idx=0)
    out = decode_gif(blob)
    assert out.shape == (5, 6, 3)
    assert np.array_equal(out[1:3, 2:5], img)
    # background fill is palette[bg_idx] = first unique color
    colors = np.unique(img.reshape(-1, 3), axis=0)
    assert np.array_equal(out[0, 0], colors[0])


def test_gif_truncated_and_malformed_error():
    with pytest.raises(UnsupportedImageError):
        decode_gif(b"GIF89a" + b"\x00" * 20)
    with pytest.raises(UnsupportedImageError, match="signature"):
        decode_gif(b"NOTGIF" + b"\x00" * 20)
    img = _rng(24).integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    blob = _make_gif(img)
    with pytest.raises(UnsupportedImageError):
        decode_gif(blob[: len(blob) // 2])


def test_gif_property_roundtrip():
    """Many shapes × palette sizes × interlace: the decoder must invert
    the spec-forward writer everywhere."""
    rng = _rng(25)
    for trial in range(20):
        h = int(rng.integers(1, 24))
        w = int(rng.integers(1, 24))
        n_colors = int(rng.integers(2, 257))
        pal = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
        img = pal[rng.integers(0, n_colors, size=(h, w))]
        inter = bool(rng.integers(0, 2))
        assert np.array_equal(decode_gif(_make_gif(img, interlace=inter)), img), (
            h, w, n_colors, inter,
        )


# ------------------------------------------------------------- dispatch ----
def test_decode_image_dispatch():
    img = _rng(5).integers(0, 256, size=(3, 4, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_png(img)), img)
    assert np.array_equal(decode_image(_make_bmp24(img)), img)
    # truncated GIF raises rather than fabricating pixels
    with pytest.raises(UnsupportedImageError):
        decode_image(b"GIF89a" + b"\x00" * 20)
    with pytest.raises(UnsupportedImageError, match="unknown"):
        decode_image(b"\x00\x01\x02\x03\x04\x05\x06\x07\x08")


# -------------------------------------------------------------- kernels ----
def test_resize_nearest_identity_and_downscale():
    img = _rng(9).integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    assert np.array_equal(resize_nearest(img, 8, 8), img)
    half = resize_nearest(img, 4, 4)
    assert half.shape == (4, 4, 3)
    # pixel-center sampling picks source index floor((i+0.5)*2) = 2i+1
    assert np.array_equal(half, img[1::2, 1::2])


def test_mean_luma_known_values():
    white = np.full((4, 4, 3), 255, dtype=np.uint8)
    black = np.zeros((4, 4, 3), dtype=np.uint8)
    assert mean_luma(white) == 1.0
    assert mean_luma(black) == 0.0
    red = np.zeros((2, 2, 3), dtype=np.uint8)
    red[:, :, 0] = 255
    assert abs(mean_luma(red) - 0.299) < 1e-6


def test_luma_histogram_feature_unit_norm_and_dim():
    img = _rng(11).integers(0, 256, size=(10, 10, 3), dtype=np.uint8)
    v = luma_histogram_feature(img, dim=16)
    assert v.shape == (16,)
    assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5


# ------------------------------------------- Spark end-to-end pipeline -----
def test_real_codec_pipeline_decode_resize_extract_knn(spark):
    """VERDICT r4 done-criterion: real PNGs (generated in-test) round-trip
    decode → resize → extract_features → cosine_topk on the real-codec
    path, with values traceable to actual pixels."""
    from xdump_spark.operators.multimodal import (
        decode_blobs,
        extract_features,
        resize_blobs,
    )
    from xdump_spark.operators.similarity import cosine_topk

    rng = _rng(123)
    imgs = {
        1: np.full((16, 12, 3), 255, dtype=np.uint8),          # white
        2: np.full((16, 12, 3), 250, dtype=np.uint8),          # near-white
        3: np.zeros((20, 8, 3), dtype=np.uint8),               # black
        4: rng.integers(0, 256, size=(9, 9, 3), dtype=np.uint8),
    }
    rows = [(i, encode_png(img)) for i, img in imgs.items()]
    media = spark.createDataFrame(rows, "doc_id long, blob binary")

    dec = {r.doc_id: r for r in decode_blobs(media, use_real_codec=True).collect()}
    assert (dec[1].width, dec[1].height, dec[1].mean_luma) == (12, 16, 1.0)
    assert dec[3].mean_luma == 0.0
    assert dec[4].width == 9 and dec[4].height == 9

    rs = resize_blobs(media, 6, 6, use_real_codec=True)
    rdec = {r.doc_id: r for r in decode_blobs(rs, use_real_codec=True).collect()}
    assert all(r.width == 6 and r.height == 6 for r in rdec.values())
    assert rdec[1].mean_luma == 1.0  # resampled white stays white
    # resized blob is itself a valid PNG whose pixels match a driver-side
    # resample of the source
    blob6 = {r.doc_id: bytes(r.blob) for r in rs.collect()}
    assert np.array_equal(decode_png(blob6[4]), resize_nearest(imgs[4], 6, 6))

    feats = extract_features(media, dim=16, use_real_codec=True)
    knn = cosine_topk(feats, feats.filter("doc_id = 1"), k=1, id_col="doc_id", vec_col="feature")
    top = knn.collect()[0]
    # white's histogram twin is near-white, never black
    assert top.neighbor_id == 2


def test_real_decode_nulls_undecodable_rows(spark):
    from xdump_spark.operators.multimodal import decode_blobs

    img = np.full((4, 4, 3), 128, dtype=np.uint8)
    rows = [(1, encode_png(img)), (2, b"GIF89a" + b"\x00" * 30), (3, b"garbage")]
    media = spark.createDataFrame(rows, "doc_id long, blob binary")
    out = {r.doc_id: r for r in decode_blobs(media, use_real_codec=True).collect()}
    assert out[1].width == 4 and out[1].mean_luma is not None
    assert out[2].width is None and out[2].mean_luma is None
    assert out[3].width is None


def test_stub_and_real_paths_share_schema(spark):
    """The plumbing contract: both codec paths produce identical schemas,
    so a pipeline can flip use_real_codec without downstream changes."""
    from xdump_spark.operators.multimodal import (
        attach_blobs,
        decode_blobs,
        extract_features,
        resize_blobs,
    )

    docs = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    media = attach_blobs(docs)
    real_media = spark.createDataFrame(
        [(1, encode_png(np.zeros((2, 2, 3), dtype=np.uint8)))], "doc_id long, blob binary"
    )
    assert (
        decode_blobs(media, use_real_codec=False).schema
        == decode_blobs(real_media, use_real_codec=True).schema
    )
    assert (
        resize_blobs(media, 4, 4, use_real_codec=False).schema
        == resize_blobs(real_media, 4, 4, use_real_codec=True).schema
    )
    assert (
        extract_features(media, dim=8, use_real_codec=False).schema
        == extract_features(real_media, dim=8, use_real_codec=True).schema
    )


def test_extract_features_on_undecodable_modes(spark):
    """raise (default) fails loudly on a mixed corpus; skip DROPS the
    undecodable rows (never a null vector)."""
    import numpy as np

    from xdump_spark.operators.multimodal import extract_features

    rows = [
        (1, encode_png(np.full((4, 4, 3), 9, dtype=np.uint8))),
        (2, b"not an image"),
    ]
    media = spark.createDataFrame(rows, "doc_id long, blob binary")
    with pytest.raises(Exception, match="UnsupportedImageError|unknown image"):
        extract_features(media, dim=8, use_real_codec=True).collect()
    kept = extract_features(
        media, dim=8, use_real_codec=True, on_undecodable="skip"
    ).collect()
    assert [r.doc_id for r in kept] == [1]
    assert len(kept[0].feature) == 8
