"""Audio column operators: WAV blobs as first-class corpus data.

Mirrors the image side of multimodal.py with the audiocodec.py kernels
(REAL WAV decode/resample/features — no audio library in the container,
but RIFF/PCM needs none). The reference engine is text-only (SURVEY.md
§1.2); this is the brief's multimodal extension surface.

Plan shape contracts (same discipline as the image operators):

* header sniffing is pure whole-stage-codegen byte reads — no Python,
  no full-blob decode, prefix bytes only;
* every Python stage is Arrow-batched ``mapInPandas`` over (id, blob)
  projections, with ``repartition_by_bytes`` available upstream because
  audio tables are byte-skewed, not row-skewed;
* corrupt blobs null their ROW in profiling stages and FAIL loudly in
  transform stages (decode-profile vs resample), matching
  decode_blobs/resize_blobs semantics.
"""

from __future__ import annotations

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
    StructField,
    StructType,
)

from xdump_spark.operators.multimodal import _read_le16, _read_le32


def sniff_wav_meta(
    media: DataFrame, blob_col: str = "blob", id_col: str = "doc_id"
) -> DataFrame:
    """(id, format, n_channels, sample_rate, bits) from the CANONICAL
    WAV header layout (fmt chunk directly after the RIFF header — what
    encode_wav and virtually every PCM writer emit) with pure codegen
    byte reads; non-RIFF or non-canonical blobs → format 'unknown',
    null fields. The audio twin of sniff_image_meta: the scan-side
    metadata pass that runs BEFORE any Python decode stage."""
    b = F.col(blob_col)
    is_wav = (F.substring(b, 1, 4) == F.encode(F.lit("RIFF"), "UTF-8")) & (
        F.substring(b, 9, 4) == F.encode(F.lit("WAVE"), "UTF-8")
    )
    canonical = is_wav & (F.substring(b, 13, 4) == F.encode(F.lit("fmt "), "UTF-8"))
    fmt = F.when(canonical, F.lit("wav")).when(is_wav, F.lit("wav-noncanonical")).otherwise(
        F.lit("unknown")
    )
    return media.select(
        F.col(id_col),
        fmt.alias("format"),
        F.when(canonical, _read_le16(b, 23)).cast("int").alias("n_channels"),
        F.when(canonical, _read_le32(b, 25)).cast("long").alias("sample_rate"),
        F.when(canonical, _read_le16(b, 35)).cast("int").alias("bits"),
    )


_AUDIO_PROFILE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("n_channels", IntegerType()),
        StructField("duration_s", DoubleType()),
        StructField("rms", DoubleType()),
        StructField("peak", DoubleType()),
        StructField("zcr", DoubleType()),
    ]
)


def decode_audio(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-blob audio profile from REAL decoded samples:
    (id, sample_rate, n_samples, n_channels, duration_s, rms, peak,
    zcr). Undecodable blobs null their row (mixed-corpus degradation,
    same contract as decode_blobs)."""
    from xdump_spark.operators.audiocodec import (
        UnsupportedAudioError,
        audio_stats,
        decode_wav,
    )

    import struct as _struct

    errs = (UnsupportedAudioError, ValueError, _struct.error, IndexError)

    def prof(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("sample_rate", "n_samples", "n_channels",
                                    "duration_s", "rms", "peak", "zcr")}
            for b in pdf["blob"]:
                try:
                    x, rate = decode_wav(bytes(b))
                    st = audio_stats(x, rate)
                    rows["sample_rate"].append(rate)
                    rows["n_samples"].append(x.shape[0])
                    rows["n_channels"].append(x.shape[1])
                    for k in ("duration_s", "rms", "peak", "zcr"):
                        rows[k].append(st[k])
                except errs:
                    for k in rows:
                        rows[k].append(None)
            yield pd.DataFrame({"doc_id": pdf[id_col], **rows})

    return media.select(id_col, "blob").mapInPandas(prof, _AUDIO_PROFILE_SCHEMA)


_RESAMPLE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("blob", BinaryType()),
    ]
)


def resample_audio(media: DataFrame, rate: int, id_col: str = "doc_id") -> DataFrame:
    """Resample every WAV blob to ``rate`` Hz (linear interpolation) and
    re-encode PCM16: (id, sample_rate, blob). A transform stage —
    undecodable blobs FAIL the job rather than silently nulling, same
    contract as resize_blobs."""
    from xdump_spark.operators.audiocodec import (
        decode_wav,
        encode_wav,
        resample_linear,
    )

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for b in pdf["blob"]:
                x, src = decode_wav(bytes(b))
                out.append(encode_wav(resample_linear(x, src, rate), rate))
            yield pd.DataFrame(
                {"doc_id": pdf[id_col], "sample_rate": rate, "blob": out}
            )

    return media.select(id_col, "blob").mapInPandas(rs, _RESAMPLE_SCHEMA)


def extract_audio_features(
    media: DataFrame,
    dim: int = 16,
    id_col: str = "doc_id",
    on_undecodable: str = "raise",
) -> DataFrame:
    """(id, feature array<float>, unit-norm): banded log-magnitude
    spectrum of real samples — feeds cosine_topk/semantic_dedup
    directly, the audio twin of the image luma-histogram descriptor.

    ``on_undecodable``: ``"raise"`` (default — holes in an embedding
    column corrupt downstream ANN joins) or ``"skip"`` — DROP
    undecodable rows, the mixed-corpus choice."""
    if on_undecodable not in ("raise", "skip"):
        # A typo like 'fail'/'Raise' must not silently mean 'skip'.
        raise ValueError(
            f"on_undecodable must be 'raise' or 'skip', got {on_undecodable!r}"
        )
    import struct as _struct

    from xdump_spark.operators.audiocodec import (
        UnsupportedAudioError,
        decode_wav,
        spectral_feature,
    )

    _errs = (UnsupportedAudioError, ValueError, _struct.error, IndexError)

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs = [], []
            for i, b in zip(pdf[id_col], pdf["blob"]):
                try:
                    x, rate = decode_wav(bytes(b))
                except _errs:
                    if on_undecodable == "raise":
                        raise
                    continue
                ids.append(i)
                vecs.append(spectral_feature(x, rate, dim).tolist())
            if ids:  # an all-skipped batch yields nothing: Arrow cannot
                # type an empty object column as list<float>
                yield pd.DataFrame({"doc_id": ids, "feature": vecs})

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("feature", ArrayType(FloatType())),
        ]
    )
    return media.select(id_col, "blob").mapInPandas(feats, schema)
