"""Multimodal (binary) column plumbing.

Images/audio/video are opaque ``binary`` columns with typed metadata
alongside. The Spark-side machinery — schemas, partitioning, Arrow batch
shapes, mapInPandas signatures — is real and tested; the actual
decode/resize/feature steps are STUBBED (Pillow/ffmpeg/torchaudio are
not in this container) behind deterministic fakes so the pipeline shape
can be exercised end-to-end. Swapping the stub body for a real decoder
changes nothing upstream or downstream.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# schema for decoded image features produced by decode_image_stub
IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)


def binary_metadata(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """Typed metadata over an opaque binary column — pure built-ins
    (byte length, sha256 content address, magic-byte sniff)."""
    return df.select(
        F.col(id_col),
        F.octet_length(F.col(bin_col)).alias("n_bytes"),
        F.sha2(F.col(bin_col), 256).alias("sha256"),
        F.when(F.hex(F.substring(F.col(bin_col), 1, 2)) == "FFD8", "image/jpeg")
        .when(F.hex(F.substring(F.col(bin_col), 1, 2)) == "8950", "image/png")
        .otherwise("application/octet-stream")
        .alias("mime_sniffed"),
    )


def decode_image_stub(
    df: DataFrame, id_col: str, bin_col: str, batch_size_hint: int = 1024
) -> DataFrame:
    """'Decode' images via mapInPandas — Arrow-batched, partition-local,
    the exact shape a real decoder plugs into.

    STUB: produces deterministic fake dimensions/intensity from the
    bytes (a real impl would call ``PIL.Image.open`` here and raise
    ``NotImplementedError`` on unsupported codecs). The distributed
    contract — binary in, fixed-width features out, no driver
    involvement — is the part under test.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[bin_col]
            n_bytes = blobs.map(len)
            # deterministic fake decode: dimensions derived from content
            first = blobs.map(lambda b: b[0] if len(b) else 0)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "n_bytes": n_bytes.astype("int32"),
                    "width": (64 + (first % 64)).astype("int32"),
                    "height": (64 + (n_bytes % 64)).astype("int32"),
                    "channels": 3,
                    "mean_intensity": (
                        blobs.map(lambda b: (sum(b[:64]) / max(1, len(b[:64]))))
                    ).astype("float64"),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(decode, IMAGE_FEATURES_SCHEMA)


def frame_sample_stub(
    df: DataFrame, id_col: str, bin_col: str, every_nth: int = 10
) -> DataFrame:
    """'Sample frames' from a video binary: one output row per sampled
    frame (1:N fan-out through mapInPandas — the row-explosion shape of
    real frame extraction). STUB: frame count is derived from byte
    length; a real impl would demux with ffmpeg."""

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_sha", T.StringType()),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, idxs, shas = [], [], []
            for _id, blob in zip(pdf[id_col], pdf[bin_col]):
                n_frames = max(1, len(blob) // 100)
                for f in range(0, n_frames, every_nth):
                    ids.append(_id)
                    idxs.append(f)
                    shas.append(
                        hashlib.sha256(blob + f.to_bytes(4, "big")).hexdigest()[:16]
                    )
            yield pd.DataFrame(
                {"id": ids, "frame_idx": pd.array(idxs, dtype="int32"), "frame_sha": shas}
            )

    return df.select(id_col, bin_col).mapInPandas(sample, schema)


# schema for resize_image_stub: binary in → binary out (plus dims)
RESIZED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("in_w", T.IntegerType()),
        T.StructField("in_h", T.IntegerType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def resize_image_stub(
    df: DataFrame, id_col: str, bin_col: str, target_w: int = 128, target_h: int = 96
) -> DataFrame:
    """'Resize' images via mapInPandas — the binary→binary transform
    shape (decode → scale → re-encode), aspect-ratio-preserving fit
    into ``target_w × target_h``.

    STUB: input dims come from the same fake decode as
    decode_image_stub; the scale factor is integer-exact
    (``min(tw·1000//w, th·1000//h) / 1000``); the 're-encoded' blob is
    a deterministic byte-prefix whose length tracks the output pixel
    count. A real impl swaps in PIL's ``resize`` + ``save`` and keeps
    every signature: binary in, binary out, executor-local, no driver
    involvement — the blob never leaves the Arrow batch."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, iw, ih, ow, oh, blobs = [], [], [], [], [], []
            for _id, blob in zip(pdf[id_col], pdf[bin_col]):
                n = len(blob)
                first = blob[0] if n else 0
                w = 64 + first % 64
                h = 64 + n % 64
                s = min(target_w * 1000 // w, target_h * 1000 // h)
                w2, h2 = w * s // 1000, h * s // 1000
                k = min(n, w2 * h2 // 16)
                ids.append(_id)
                iw.append(w)
                ih.append(h)
                ow.append(w2)
                oh.append(h2)
                blobs.append(bytes(blob[:k]))
            yield pd.DataFrame(
                {
                    "id": ids,
                    "in_w": pd.array(iw, dtype="int32"),
                    "in_h": pd.array(ih, dtype="int32"),
                    "out_w": pd.array(ow, dtype="int32"),
                    "out_h": pd.array(oh, dtype="int32"),
                    "resized": blobs,
                }
            )

    return df.select(id_col, bin_col).mapInPandas(resize, RESIZED_IMAGE_SCHEMA)


# schema for decoded audio features produced by decode_audio_stub
AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms_x1000", T.LongType()),
    ]
)


def decode_audio_stub(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """'Decode' audio via mapInPandas — the waveform twin of
    decode_image_stub, completing the image/audio/video triad.

    STUB: sample rate, duration, and an RMS-style loudness proxy are
    derived deterministically from the bytes in pure integer math (a
    real impl would call soundfile/torchaudio here). Integer-only output
    keeps the whole binary→mapInPandas→features pipeline hashable by a
    SQL oracle; swapping in a real decoder changes nothing upstream or
    downstream.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[bin_col]
            n_bytes = blobs.map(len)
            first = blobs.map(lambda b: b[0] if len(b) else 0)
            sample_rate = 8000 + (first % 3) * 4000  # 8k / 12k / 16k
            n_samples = n_bytes // 2  # fake 16-bit mono PCM
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "n_bytes": n_bytes.astype("int32"),
                    "sample_rate": sample_rate.astype("int32"),
                    "n_samples": n_samples.astype("int64"),
                    "duration_ms": (n_samples * 1000 // sample_rate).astype("int64"),
                    "rms_x1000": blobs.map(
                        lambda b: sum(b[:64]) * 1000 // (max(1, len(b[:64])) * 255)
                    ).astype("int64"),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(decode, AUDIO_FEATURES_SCHEMA)
