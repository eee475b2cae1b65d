"""Pure-numpy image codec kernels for the multimodal operators.

The container has no Pillow/ffmpeg, so the "real codec" path is built
from primitives that ARE here: ``zlib`` (stdlib) for PNG's DEFLATE
stream and numpy for scanline unfiltering and pixel math. Coverage is
honest and documented:

* **PNG** — full decode for 8-bit-depth, non-interlaced images of color
  types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA); all
  five scanline filters (None/Sub/Up/Average/Paeth). Encode writes
  filter-0 scanlines. Round-trips bit-exact.
* **BMP** — decode for the uncompressed 24-bit BITMAPINFOHEADER layout
  (bottom-up or top-down), the overwhelmingly common interchange form.
* **GIF** — r6: real pixel decode for the 87a/89a baseline — LZW
  (variable code width up to 12 bits, clear/end codes, deferred clear),
  global and local color tables, interlaced and non-interlaced, first
  frame composed onto the logical-screen canvas (background-filled).
  Later frames / animation disposal are out of scope and ignored
  (first frame only, like a thumbnailer).

Scale note: these kernels are per-image CPU work invoked from Arrow
batches inside ``mapInPandas`` — the parallelism is across blobs
(executor cores × partitions), which is the axis that matters at
100 TB. The per-row Python loops in the Average/Paeth unfilter paths
bound per-image cost at O(W·H); a C codec would be ~20× faster per
image but identical in plan shape and memory behavior.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = [
    "UnsupportedImageError",
    "decode_image",
    "encode_png",
    "decode_png",
    "decode_bmp",
    "decode_gif",
    "resize_nearest",
    "mean_luma",
    "luma_histogram_feature",
]

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# color type → samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class UnsupportedImageError(ValueError):
    """Raised for container formats / encodings outside the documented
    coverage (e.g. GIF pixel data, 16-bit PNG, RLE BMP)."""


# ---------------------------------------------------------------- PNG ------
def decode_png(blob: bytes) -> np.ndarray:
    """PNG → (H, W, C) uint8 array (C per color type; palette expands to
    RGB). 8-bit depth, non-interlaced only — others raise
    UnsupportedImageError with the offending field named."""
    if blob[:8] != _PNG_MAGIC:
        raise UnsupportedImageError("not a PNG (bad signature)")
    pos, ihdr, idat, plte = 8, None, [], None
    while pos + 8 <= len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        tag = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IEND":
            break
        pos += 12 + length  # length + tag + data + crc
    if ihdr is None or not idat:
        raise UnsupportedImageError("PNG missing IHDR/IDAT chunks")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8:
        raise UnsupportedImageError(f"PNG bit depth {depth} (only 8 supported)")
    if ctype not in _PNG_CHANNELS:
        raise UnsupportedImageError(f"PNG color type {ctype}")
    if interlace != 0:
        raise UnsupportedImageError("interlaced PNG not supported")
    channels = _PNG_CHANNELS[ctype]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise UnsupportedImageError(
            f"PNG data length {len(raw)} != {h}*({stride}+1)"
        )
    raw = raw.reshape(h, stride + 1)
    img = _unfilter(raw, stride, bpp=channels)
    img = img.reshape(h, w, channels)
    if ctype == 3:
        if plte is None:
            raise UnsupportedImageError("palette PNG without PLTE")
        img = plte[img[:, :, 0]]
    return img


def _unfilter(raw: np.ndarray, stride: int, bpp: int) -> np.ndarray:
    """Reverse the five PNG scanline filters. Sub is a per-lane cumsum
    (mod 256) and Up is one vectorized add; Average/Paeth carry a true
    left-dependency, so those rows run an O(stride) Python loop —
    per-image cost, parallelized across blobs by the caller."""
    h = raw.shape[0]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub: prefix sum along each byte lane
            cur = line.copy()
            for lane in range(bpp):
                cur[lane::bpp] = np.cumsum(cur[lane::bpp]) % 256
        elif ftype == 2:  # Up
            cur = (line + prev) % 256
        elif ftype == 3:  # Average
            cur = line.copy()
            for j in range(stride):
                left = cur[j - bpp] if j >= bpp else 0
                cur[j] = (cur[j] + (left + prev[j]) // 2) % 256
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for j in range(stride):
                a = cur[j - bpp] if j >= bpp else 0
                b = prev[j]
                c = prev[j - bpp] if j >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[j] = (cur[j] + pred) % 256
        else:
            raise UnsupportedImageError(f"PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def encode_png(img: np.ndarray) -> bytes:
    """(H, W) or (H, W, C) uint8 → PNG bytes (filter-0 scanlines,
    zlib level 6). C∈{1,2,3,4} maps to gray / gray+alpha / RGB / RGBA."""
    arr = np.ascontiguousarray(np.asarray(img, dtype=np.uint8))
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}.get(c)
    if ctype is None:
        raise UnsupportedImageError(f"cannot encode {c}-channel image")
    # prepend the filter-0 byte to every scanline in one numpy op
    lines = np.zeros((h, w * c + 1), dtype=np.uint8)
    lines[:, 1:] = arr.reshape(h, w * c)
    idat = zlib.compress(lines.tobytes(), 6)

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------- BMP ------
def decode_bmp(blob: bytes) -> np.ndarray:
    """Uncompressed 24-bit BITMAPINFOHEADER BMP → (H, W, 3) uint8 RGB.
    Handles bottom-up (positive height) and top-down (negative) row
    order and the 4-byte row padding. Other bit depths / compressions
    raise UnsupportedImageError."""
    if blob[:2] != b"BM":
        raise UnsupportedImageError("not a BMP (bad signature)")
    (data_off,) = struct.unpack("<I", blob[10:14])
    (hdr_size,) = struct.unpack("<I", blob[14:18])
    if hdr_size < 40:
        raise UnsupportedImageError(f"BMP header size {hdr_size} (BITMAPCOREHEADER unsupported)")
    w, h_signed = struct.unpack("<ii", blob[18:26])
    bits, comp = struct.unpack("<HI", blob[28:34])
    if bits != 24 or comp != 0:
        raise UnsupportedImageError(f"BMP {bits}-bit compression={comp} (only 24-bit BI_RGB)")
    h = abs(h_signed)
    w = abs(w)
    row_bytes = (w * 3 + 3) & ~3
    px = np.frombuffer(blob, dtype=np.uint8, count=row_bytes * h, offset=data_off)
    px = px.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    if h_signed > 0:  # bottom-up storage
        px = px[::-1]
    return px[:, :, ::-1].copy()  # BGR → RGB


# ---------------------------------------------------------------- GIF ------
def _lzw_decode(min_code_size: int, data: bytes, max_pixels: int) -> bytearray:
    """GIF-flavored LZW: variable code width starting at min_code_size+1,
    growing through 12 bits; CLEAR resets the table, END terminates.
    Stops once ``max_pixels`` indices are produced (a conforming stream
    ends there; a padded one must not over-allocate)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    # table maps code → byte string of pixel indices
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    buf = 0  # LSB-first bit reservoir
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        buf |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = buf & ((1 << code_size) - 1)
            buf >>= code_size
            nbits -= code_size
            if code == clear:
                table = list(base)
                code_size = min_code_size + 1
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                if code >= len(table):
                    raise UnsupportedImageError("GIF LZW: first code out of range")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):  # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise UnsupportedImageError("GIF LZW: code out of range")
            out += entry
            prev = entry
            if len(out) >= max_pixels:
                return out
            # grow the code width; 12 bits is the GIF maximum (deferred
            # clear: past 4096 entries codes just stop growing)
            if len(table) >= (1 << code_size) and code_size < 12:
                code_size += 1
    return out


def decode_gif(blob: bytes) -> np.ndarray:
    """GIF87a/89a → (H, W, 3) uint8 RGB: the FIRST image frame, LZW-
    decoded (interlaced or not, global or local color table) and composed
    onto the logical-screen canvas (background-color-filled — frames may
    be smaller than the screen). Animation disposal/later frames are out
    of scope. Malformed/truncated streams raise UnsupportedImageError."""
    try:
        return _decode_gif(blob)
    except UnsupportedImageError:
        raise
    except (IndexError, ValueError, struct.error) as e:
        # out-of-bounds reads on truncated streams surface as the one
        # documented error type, so per-row null degradation catches them
        raise UnsupportedImageError(f"GIF malformed: {e}")


def _decode_gif(blob: bytes) -> np.ndarray:
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise UnsupportedImageError("not a GIF (bad signature)")
    if len(blob) < 13:
        raise UnsupportedImageError("GIF truncated before screen descriptor")
    sw, sh = struct.unpack("<HH", blob[6:10])
    packed, bg_idx = blob[10], blob[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(blob, dtype=np.uint8, count=3 * n, offset=pos).reshape(-1, 3)
        pos += 3 * n

    def skip_subblocks(p: int) -> int:
        while True:
            if p >= len(blob):
                raise UnsupportedImageError("GIF truncated in sub-blocks")
            size = blob[p]
            p += 1
            if size == 0:
                return p
            p += size

    while pos < len(blob):
        marker = blob[pos]
        pos += 1
        if marker == 0x3B:  # trailer before any image
            raise UnsupportedImageError("GIF contains no image frame")
        if marker == 0x21:  # extension: label byte + sub-blocks
            pos = skip_subblocks(pos + 1)
            continue
        if marker != 0x2C:
            raise UnsupportedImageError(f"GIF: unknown block marker 0x{marker:02x}")
        # image descriptor
        left, top, fw, fh = struct.unpack("<HHHH", blob[pos : pos + 8])
        ipacked = blob[pos + 8]
        pos += 9
        table = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            table = np.frombuffer(
                blob, dtype=np.uint8, count=3 * n, offset=pos
            ).reshape(-1, 3)
            pos += 3 * n
        if table is None:
            raise UnsupportedImageError("GIF frame without any color table")
        min_code_size = blob[pos]
        pos += 1
        if not 2 <= min_code_size <= 11:
            raise UnsupportedImageError(f"GIF LZW minimum code size {min_code_size}")
        chunks = []
        while True:
            size = blob[pos]
            pos += 1
            if size == 0:
                break
            chunks.append(blob[pos : pos + size])
            pos += size
        idx = _lzw_decode(min_code_size, b"".join(chunks), fw * fh)
        if len(idx) < fw * fh:
            raise UnsupportedImageError(
                f"GIF LZW stream yielded {len(idx)} of {fw * fh} pixels"
            )
        frame = np.frombuffer(bytes(idx[: fw * fh]), dtype=np.uint8).reshape(fh, fw)
        if ipacked & 0x40:  # interlaced: 4-pass row shuffle
            deinterlaced = np.empty_like(frame)
            rows = np.concatenate(
                [np.arange(0, fh, 8), np.arange(4, fh, 8),
                 np.arange(2, fh, 4), np.arange(1, fh, 2)]
            )
            deinterlaced[rows] = frame
            frame = deinterlaced
        rgb = table[np.minimum(frame, len(table) - 1)]
        # compose onto the logical screen (frames may be offset subregions)
        if (left, top, fw, fh) == (0, 0, sw, sh):
            return rgb.copy()
        bg = table[bg_idx] if bg_idx < len(table) else np.zeros(3, dtype=np.uint8)
        canvas = np.broadcast_to(bg, (sh, sw, 3)).copy()
        y1, x1 = min(top + fh, sh), min(left + fw, sw)
        canvas[top:y1, left:x1] = rgb[: y1 - top, : x1 - left]
        return canvas
    raise UnsupportedImageError("GIF truncated before trailer")


# ------------------------------------------------------------ dispatch -----
def decode_image(blob: bytes) -> np.ndarray:
    """Sniff the container magic and decode to (H, W, C) uint8.
    PNG, BMP, and GIF (first frame) are real decodes; everything else
    raises UnsupportedImageError — the caller decides whether to null
    the row or fail the job."""
    b = bytes(blob)
    if b[:8] == _PNG_MAGIC:
        return decode_png(b)
    if b[:2] == b"BM":
        return decode_bmp(b)
    if b[:3] == b"GIF":
        return decode_gif(b)
    raise UnsupportedImageError("unknown image container")


# ------------------------------------------------------------- kernels -----
def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width) — pure integer index
    math (pixel-center convention), so results are deterministic across
    platforms/BLAS builds."""
    h, w = img.shape[:2]
    ys = np.minimum(((np.arange(height) + 0.5) * h / height).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(width) + 0.5) * w / width).astype(np.int64), w - 1)
    return img[ys][:, xs]


def _to_luma(img: np.ndarray) -> np.ndarray:
    """(H, W[, C]) uint8 → float64 luma plane in [0, 1] (Rec.601 weights
    for color; alpha ignored)."""
    if img.ndim == 2 or img.shape[2] == 1:
        return img.reshape(img.shape[0], img.shape[1]).astype(np.float64) / 255.0
    if img.shape[2] == 2:  # gray + alpha
        return img[:, :, 0].astype(np.float64) / 255.0
    rgb = img[:, :, :3].astype(np.float64)
    return (0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]) / 255.0


def mean_luma(img: np.ndarray) -> float:
    return float(np.round(_to_luma(img).mean(), 6))


def luma_histogram_feature(img: np.ndarray, dim: int = 16) -> np.ndarray:
    """``dim``-float image descriptor: the normalized luma histogram,
    mean-centered and L2-normalized — a real (if simple) pixel-statistics
    encoder whose output feeds cosine_topk/semantic_dedup directly. A
    learned encoder would slot into the same (blob → float[dim]) kernel
    signature."""
    hist, _ = np.histogram(_to_luma(img), bins=dim, range=(0.0, 1.0))
    v = hist.astype(np.float32) / max(1, img.shape[0] * img.shape[1])
    v = v - v.mean()
    n = float(np.linalg.norm(v))
    return v / n if n else v
