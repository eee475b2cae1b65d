"""Audio codec + operator tests (operators/audiocodec.py, audio.py).

No audio library exists in the container; correctness is established via
(a) bit-exact/near-exact round-trips through our own encoder, (b) the
stdlib ``wave`` module as an INDEPENDENT writer (different code path
from encode_wav) for decode cross-checks, and (c) analytically known
signals (sine waves: RMS = A/√2, ZCR = 2f/rate, spectral peak band).
"""

import math
import struct

import numpy as np
import pytest

from xdump_spark.operators.audiocodec import (
    UnsupportedAudioError,
    audio_stats,
    decode_wav,
    encode_wav,
    resample_linear,
    spectral_feature,
)


def sine(freq=440.0, rate=8000, secs=0.25, amp=0.5):
    t = np.arange(int(rate * secs)) / rate
    return amp * np.sin(2 * math.pi * freq * t)


# ---------------------------------------------------------- round trips ----
def test_wav_pcm16_roundtrip_mono_and_stereo():
    x = sine()
    got, rate = decode_wav(encode_wav(x, 8000))
    assert rate == 8000 and got.shape == (len(x), 1)
    assert np.abs(got[:, 0] - x).max() < 1.0 / 32767  # PCM16 quantization

    st = np.stack([sine(220), sine(330)], axis=1)
    got2, _ = decode_wav(encode_wav(st, 8000))
    assert got2.shape == st.shape
    assert np.abs(got2 - st).max() < 1.0 / 32767


def test_wav_decode_stdlib_wave_writer_cross_check(tmp_path):
    """Decode a file written by the stdlib wave module — an independent
    RIFF writer — and compare against the source signal."""
    import wave

    x = sine(freq=1000, rate=16000, secs=0.1, amp=0.9)
    pcm = np.clip(np.round(x * 32767), -32768, 32767).astype("<i2")
    p = str(tmp_path / "t.wav")
    with wave.open(p, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    got, rate = decode_wav(open(p, "rb").read())
    assert rate == 16000
    assert np.abs(got[:, 0] - pcm.astype(np.float64) / 32768.0).max() == 0.0


@pytest.mark.parametrize("bits", [8, 24, 32])
def test_wav_decode_other_pcm_depths(bits):
    """Hand-packed fmt/data chunks at non-16 depths decode to the right
    normalized values."""
    vals = {
        8: (np.array([0, 128, 255], dtype=np.uint8), np.array([-1.0, 0.0, 127 / 128])),
        24: (None, None),
        32: (None, None),
    }
    if bits == 8:
        raw, want = vals[8]
        data = raw.tobytes()
    elif bits == 24:
        ints = [-(1 << 23), 0, (1 << 23) - 1]
        data = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in ints)
        want = np.array([-1.0, 0.0, ((1 << 23) - 1) / (1 << 23)])
    else:
        ints = np.array([-(1 << 31), 0, (1 << 31) - 1], dtype="<i4")
        data = ints.tobytes()
        want = np.array([-1.0, 0.0, ((1 << 31) - 1) / (1 << 31)])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * bits // 8, bits // 8, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    got, rate = decode_wav(blob)
    assert rate == 8000
    assert np.allclose(got[:, 0], want, atol=1e-12)


def test_wav_float32_and_extensible():
    x = sine(amp=0.25).astype("<f4")
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 8000 * 4, 4, 32)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(x.tobytes())) + x.tobytes()
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    got, _ = decode_wav(blob)
    assert np.abs(got[:, 0] - x.astype(np.float64)).max() < 1e-7

    # EXTENSIBLE wrapper around PCM16: cbSize=22, then validBits(2) +
    # channelMask(4) + 16-byte SubFormat GUID whose first 2 bytes are
    # the real format tag
    sub = struct.pack("<HI", 16, 0) + struct.pack("<H", 1) + b"\x00" * 14
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16) + struct.pack("<H", 22) + sub
    pcm = np.array([1000, -1000], dtype="<i2").tobytes()
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    got, _ = decode_wav(blob)
    assert np.allclose(got[:, 0], [1000 / 32768, -1000 / 32768])


def test_wav_unsupported_variants_error_clearly():
    with pytest.raises(UnsupportedAudioError, match="RIFF"):
        decode_wav(b"not audio at all")
    # mu-law format tag 7
    fmt = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 2) + b"\x00\x00"
    with pytest.raises(UnsupportedAudioError, match="format tag 7"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


# ------------------------------------------------------------- kernels -----
def test_audio_stats_analytic_sine():
    rate, f, amp = 8000, 400, 0.5
    st = audio_stats(sine(f, rate, 0.5, amp)[:, None], rate)
    assert abs(st["duration_s"] - 0.5) < 1e-9
    assert abs(st["rms"] - amp / math.sqrt(2)) < 1e-3
    assert abs(st["peak"] - amp) < 1e-3
    # a sine at f Hz crosses zero 2f times per second
    assert abs(st["zcr"] - 2 * f / rate) < 1e-3


def test_resample_preserves_duration_and_shape():
    x = sine(440, 8000, 0.25)
    y = resample_linear(x[:, None], 8000, 4000)
    assert y.shape == (1000, 1)
    # downsampled sine keeps its RMS (well below Nyquist)
    assert abs(np.sqrt((y**2).mean()) - 0.5 / math.sqrt(2)) < 1e-2
    assert resample_linear(x[:, None], 8000, 8000).shape == (2000, 1)


def test_spectral_feature_peak_band_tracks_frequency():
    rate = 8000
    lo = spectral_feature(sine(200, rate, 0.25)[:, None], rate, dim=16)
    hi = spectral_feature(sine(3800, rate, 0.25)[:, None], rate, dim=16)
    assert lo.shape == (16,) and abs(float(np.linalg.norm(lo)) - 1.0) < 1e-5
    # 200 Hz of 4000 Hz Nyquist → band 0; 3800 Hz → last band
    assert int(np.argmax(lo)) == 0
    assert int(np.argmax(hi)) == 15
    # distinct tones are spectrally dissimilar
    assert float(lo @ hi) < 0.5


# ------------------------------------------------- Spark-side operators ----
def _media(spark, items):
    return spark.createDataFrame(items, "doc_id long, blob binary")


def test_sniff_wav_meta_codegen_only(spark):
    from xdump_spark.operators.audio import sniff_wav_meta

    blob = encode_wav(np.stack([sine(440), sine(880)], axis=1), 22050)
    media = _media(spark, [(1, blob), (2, b"\x89PNG1234junk")])
    out = {r.doc_id: r for r in sniff_wav_meta(media).collect()}
    assert (out[1].format, out[1].n_channels, out[1].sample_rate, out[1].bits) == (
        "wav", 2, 22050, 16,
    )
    assert out[2].format == "unknown" and out[2].sample_rate is None
    # plan: no Python stage
    plan = sniff_wav_meta(media)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_decode_audio_profile_and_null_degradation(spark):
    from xdump_spark.operators.audio import decode_audio

    blob = encode_wav(sine(440, 8000, 0.25, 0.5), 8000)
    media = _media(spark, [(1, blob), (2, b"garbage")])
    out = {r.doc_id: r for r in decode_audio(media).collect()}
    assert out[1].sample_rate == 8000 and out[1].n_samples == 2000
    assert out[1].n_channels == 1
    assert abs(out[1].rms - 0.5 / math.sqrt(2)) < 1e-3
    assert out[2].sample_rate is None and out[2].rms is None


def test_resample_audio_end_to_end(spark):
    from xdump_spark.operators.audio import decode_audio, resample_audio

    blob = encode_wav(sine(440, 8000, 0.25, 0.5), 8000)
    media = _media(spark, [(1, blob)])
    rs = resample_audio(media, 16000)
    prof = decode_audio(rs).collect()[0]
    assert prof.sample_rate == 16000
    assert prof.n_samples == 4000
    assert abs(prof.duration_s - 0.25) < 1e-6  # duration preserved
    assert abs(prof.rms - 0.5 / math.sqrt(2)) < 1e-2


def test_audio_features_feed_knn(spark):
    """decode → features → cosine_topk: the 440 Hz query's nearest
    neighbor is the 450 Hz tone, never the 3 kHz one."""
    from xdump_spark.operators.audio import extract_audio_features
    from xdump_spark.operators.similarity import cosine_topk

    media = _media(
        spark,
        [
            (1, encode_wav(sine(440), 8000)),
            (2, encode_wav(sine(450), 8000)),
            (3, encode_wav(sine(3000), 8000)),
        ],
    )
    feats = extract_audio_features(media, dim=32)
    rows = feats.collect()
    assert all(len(r.feature) == 32 for r in rows)
    top = cosine_topk(
        feats, feats.filter("doc_id = 1"), k=1, id_col="doc_id", vec_col="feature"
    ).collect()[0]
    assert top.neighbor_id == 2


def test_audio_partition_invariance(spark):
    from xdump_spark.operators.audio import decode_audio

    items = [(i, encode_wav(sine(200 + 50 * i, 8000, 0.05), 8000)) for i in range(20)]
    a = {r.doc_id: r.rms for r in decode_audio(_media(spark, items)).collect()}
    b = {
        r.doc_id: r.rms
        for r in decode_audio(_media(spark, items).repartition(7)).collect()
    }
    assert a == b


def test_extract_audio_features_on_undecodable_modes(spark):
    from xdump_spark.operators.audio import extract_audio_features

    media = _media(spark, [(1, encode_wav(sine(300), 8000)), (2, b"junk")])
    with pytest.raises(Exception, match="UnsupportedAudioError|RIFF"):
        extract_audio_features(media, dim=8).collect()
    kept = extract_audio_features(media, dim=8, on_undecodable="skip").collect()
    assert [r.doc_id for r in kept] == [1] and len(kept[0].feature) == 8
