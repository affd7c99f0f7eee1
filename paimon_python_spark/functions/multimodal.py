"""Multimodal (binary) column processing.

Images/audio/video are opaque ``binary`` columns with typed metadata
alongside. The decode/resize/feature steps are REAL for the formats a
container without Pillow/ffmpeg can honestly support, implemented in
pure Python + numpy:

- BMP: 24-bit uncompressed BI_RGB (encoder + decoder);
- PNG: 8-bit gray / gray+alpha / RGB / RGBA, all five scanline filters
  (None/Sub/Up/Average/Paeth), zlib IDAT (encoder writes filter 0);
- WAV: PCM16 via the stdlib ``wave`` module;
- resize: deterministic nearest-neighbor (integer source sampling), so
  any engine can reproduce the output bytes bit-for-bit.

JPEG and real video demuxing need codecs this container does not have:
``decode_image_bytes`` raises ``NotImplementedError`` on a JPEG magic
(clearly marked, per the design rule), and ``frame_sample_stub``
remains the one declared stub — the 1:N row-explosion shape of frame
extraction with a deterministic fake demux.

Everything runs inside ``mapInPandas`` — Arrow-batched, executor-local,
no driver involvement; blobs never leave their batch. At 100 TB the
decode cost is embarrassingly parallel and the feature outputs are
fixed-width rows, so the operators scale like any map-only stage.
"""

from __future__ import annotations

import io
import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---- BMP (24-bit BI_RGB) ----


def _bmp_header(w: int, h: int) -> bytes:
    """54-byte BMP file+DIB header for a 24-bit (h, w) image."""
    pad = (4 - (w * 3) % 4) % 4
    img_size = (w * 3 + pad) * h
    return struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit uncompressed BMP (bottom-up rows,
    BGR byte order, rows padded to 4 bytes — the classic layout)."""
    h, w, ch = arr.shape
    if ch != 3:
        raise ValueError("encode_bmp expects (h, w, 3) RGB")
    pad = (4 - (w * 3) % 4) % 4
    row_bytes = w * 3 + pad
    bgr = arr[::-1, :, ::-1]  # bottom-up, RGB→BGR
    if pad:
        padded = np.zeros((h, row_bytes), np.uint8)
        padded[:, : w * 3] = bgr.reshape(h, w * 3)
        body = padded.tobytes()
    else:
        body = bgr.tobytes()
    return _bmp_header(w, h) + body


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → (h, w, 3) uint8 RGB."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack_from("<I", data, 10)[0]
    size, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", data, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={comp} unsupported")
    flip = h > 0
    h = abs(h)
    pad = (4 - (w * 3) % 4) % 4
    row_bytes = w * 3 + pad
    raw = np.frombuffer(data, np.uint8, count=row_bytes * h, offset=offset)
    rows = raw.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]
    return rgb[::-1] if flip else rgb


# ---- PNG (8-bit depth) ----

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type → channels


def encode_png(arr: np.ndarray) -> bytes:
    """(h, w) or (h, w, {1,2,3,4}) uint8 → PNG (filter 0 scanlines)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(tag: bytes, payload: bytes) -> bytes:
        body = tag + payload
        return struct.pack(">I", len(payload)) + body + struct.pack(
            ">I", zlib.crc32(body)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    lines = np.concatenate(
        [np.zeros((h, 1), np.uint8), arr.reshape(h, w * ch)], axis=1
    )  # filter byte 0 per scanline
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(lines.tobytes(), 6))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """8-bit non-interlaced PNG → (h, w, channels) uint8. Implements
    all five scanline filters per the spec."""
    if data[: len(_PNG_MAGIC)] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos = len(_PNG_MAGIC)
    w = h = None
    channels = 0
    idat = bytearray()
    while pos < len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
                raise NotImplementedError(
                    f"PNG depth={depth} color={color_type} interlace={interlace}"
                )
            channels = _PNG_CHANNELS[color_type]
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    bpp = channels
    # vectorized filter reconstruction (numpy, no per-byte Python loops):
    # None is a copy; Up is one vectorized add against the prior row; Sub
    # is exactly a per-channel cumulative sum along the pixel axis
    # (line[i] += line[i-bpp] unrolled); Average/Paeth walk PIXELS
    # (w steps, all channels per step). They cannot vectorize further:
    # cur[y, i] depends on BOTH cur[y, i-bpp] (left, same row) and
    # cur[y-1, i] (up, prior row) — a 2D recurrence, so neither a
    # row-sweep nor a column-sweep has independent lanes. Encoders that
    # matter here (our own, filter-0-only) never emit them; the loops
    # exist for spec-complete decode of foreign PNGs.
    lines = np.frombuffer(raw, np.uint8, count=h * (1 + stride)).reshape(
        h, 1 + stride
    )
    ftypes = lines[:, 0]
    if not np.all(ftypes <= 4):
        raise ValueError(f"PNG filter {int(ftypes.max())}")
    data = lines[:, 1:]
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        ftype = int(ftypes[y])
        line = data[y]
        if ftype == 0:  # None
            cur = line.copy()
        elif ftype == 1:  # Sub: cumsum per channel over the pixel axis
            cur = (
                np.cumsum(line.reshape(-1, bpp), axis=0, dtype=np.uint32)
                .astype(np.uint8)
                .reshape(stride)
            )
        elif ftype == 2:  # Up
            cur = line + prev  # uint8 wraps mod 256
        elif ftype == 3:  # Average
            cur = np.empty(stride, np.uint8)
            cur[:bpp] = line[:bpp] + (prev[:bpp].astype(np.uint16) >> 1)
            pv = prev.astype(np.uint16)
            for i in range(bpp, stride, bpp):
                left = cur[i - bpp : i].astype(np.uint16)
                cur[i : i + bpp] = line[i : i + bpp] + (
                    (left + pv[i : i + bpp]) >> 1
                ).astype(np.uint8)
        else:  # Paeth
            cur = np.empty(stride, np.uint8)
            cur[:bpp] = line[:bpp] + prev[:bpp]  # left=ul=0 → predictor=up
            pv = prev.astype(np.int16)
            for i in range(bpp, stride, bpp):
                a = cur[i - bpp : i].astype(np.int16)  # left
                b = pv[i : i + bpp]  # up
                c = pv[i - bpp : i]  # upper-left
                p_ = a + b - c
                pa, pb, pc = np.abs(p_ - a), np.abs(p_ - b), np.abs(p_ - c)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
                )
                cur[i : i + bpp] = line[i : i + bpp] + pred.astype(np.uint8)
        out[y] = cur
        prev = cur
    return out.reshape(h, w, channels)


# ---- WAV (PCM16) ----


def encode_wav_pcm16(sample_rate: int, samples: np.ndarray) -> bytes:
    import wave

    bio = io.BytesIO()
    with wave.open(bio, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(np.asarray(samples, np.int16).tobytes())
    return bio.getvalue()


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    import wave

    with wave.open(io.BytesIO(data), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise NotImplementedError("only PCM16 WAV supported")
        rate = wf.getframerate()
        frames = wf.readframes(wf.getnframes())
        arr = np.frombuffer(frames, np.int16)
        if wf.getnchannels() > 1:
            arr = arr.reshape(-1, wf.getnchannels())
    return rate, arr


# ---- dispatch ----


def decode_image_bytes(data: bytes) -> np.ndarray:
    """Magic-sniffed decode → (h, w, channels) uint8.

    JPEG needs a DCT codec this container does not ship — clearly
    marked unsupported rather than faked."""
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[: len(_PNG_MAGIC)] == _PNG_MAGIC:
        return decode_png(data)
    if data[:2] == b"\xff\xd8":
        raise NotImplementedError(
            "JPEG decode requires a DCT codec (Pillow/libjpeg) not present "
            "in this environment"
        )
    raise ValueError("unrecognized image format")


# ---- metadata (pure built-ins, no decode) ----


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


# ---- operators (mapInPandas, real decoders) ----

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sum_intensity", T.LongType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)


def image_features(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """REAL image decode via mapInPandas: BMP/PNG bytes → dimensions +
    integer-exact intensity stats (sum over all samples; mean as one
    IEEE division, so a SQL oracle reproduces it bit-for-bit)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nb, ws, hs, cs, sums, means = [], [], [], [], [], [], []
            for _id, blob in zip(pdf[id_col], pdf[bin_col]):
                arr = decode_image_bytes(bytes(blob))
                h, w, ch = arr.shape
                s = int(arr.sum(dtype=np.int64))
                ids.append(_id)
                nb.append(len(blob))
                ws.append(w)
                hs.append(h)
                cs.append(ch)
                sums.append(s)
                means.append(s / (h * w * ch))
            yield pd.DataFrame(
                {
                    "id": ids,
                    "n_bytes": pd.array(nb, dtype="int32"),
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                    "channels": pd.array(cs, dtype="int32"),
                    "sum_intensity": pd.array(sums, dtype="int64"),
                    "mean_intensity": pd.array(means, dtype="float64"),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(decode, IMAGE_FEATURES_SCHEMA)


RESIZED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("in_w", T.IntegerType()),
        T.StructField("in_h", T.IntegerType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("out_sum", T.LongType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def resize_image(
    df: DataFrame, id_col: str, bin_col: str, target_w: int = 128, target_h: int = 96
) -> DataFrame:
    """REAL aspect-fit resize: decode (BMP/PNG) → nearest-neighbor
    sample at integer coordinates (``src = out_idx * src_dim //
    out_dim`` — deterministic, engine-reproducible) → re-encode BMP.
    Scale factor is integer-exact (``min(tw·1000//w, th·1000//h) /
    1000``), matching what a SQL oracle can recompute."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # decode per row (cheap frombuffer views), then VECTORIZE the
            # resample/sum/pad per (h, w) group: same-dimension images
            # stack into one (n, h, w, 3) fancy-index + one axis-sum
            # instead of n separate Python iterations — images in a
            # corpus cluster into few dimension classes, so the Python
            # loop runs per CLASS, not per image
            ids, iw, ih, ow, oh, sums, blobs = [], [], [], [], [], [], []
            groups: dict = {}
            for _id, blob in zip(pdf[id_col], pdf[bin_col]):
                arr = decode_image_bytes(bytes(blob))
                if arr.shape[2] == 1:
                    arr = np.repeat(arr, 3, axis=2)
                elif arr.shape[2] == 4:
                    arr = arr[:, :, :3]
                groups.setdefault(arr.shape[:2], ([], []))
                groups[arr.shape[:2]][0].append(_id)
                groups[arr.shape[:2]][1].append(arr)
            for (h, w), (gids, arrs) in groups.items():
                s = min(target_w * 1000 // w, target_h * 1000 // h)
                w2, h2 = max(1, w * s // 1000), max(1, h * s // 1000)
                ys = (np.arange(h2) * h) // h2
                xs = (np.arange(w2) * w) // w2
                stack = np.stack(arrs)  # (n, h, w, 3)
                out = stack[:, ys][:, :, xs]  # (n, h2, w2, 3)
                n = len(gids)
                pad = (4 - (w2 * 3) % 4) % 4
                row_bytes = w2 * 3 + pad
                header = _bmp_header(w2, h2)
                bgr = out[:, ::-1, :, ::-1].reshape(n, h2, w2 * 3)
                if pad:
                    padded = np.zeros((n, h2, row_bytes), np.uint8)
                    padded[:, :, : w2 * 3] = bgr
                else:
                    padded = bgr
                ids.extend(gids)
                iw.extend([w] * n)
                ih.extend([h] * n)
                ow.extend([w2] * n)
                oh.extend([h2] * n)
                sums.extend(out.sum(axis=(1, 2, 3), dtype=np.int64).tolist())
                blobs.extend(header + padded[i].tobytes() for i in range(n))
            yield pd.DataFrame(
                {
                    "id": ids,
                    "in_w": pd.array(iw, dtype="int32"),
                    "in_h": pd.array(ih, dtype="int32"),
                    "out_w": pd.array(ow, dtype="int32"),
                    "out_h": pd.array(oh, dtype="int32"),
                    "out_sum": pd.array(sums, dtype="int64"),
                    "resized": blobs,
                }
            )

    return df.select(id_col, bin_col).mapInPandas(resize, RESIZED_IMAGE_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("mean_abs_x1000", T.LongType()),
    ]
)


def audio_features(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """REAL audio decode via mapInPandas: PCM16 WAV → sample rate,
    sample count, duration, and an integer loudness proxy
    (``sum(|sample|)·1000 // n`` — exact, so SQL oracles agree)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nb, rates, ns, durs, loud = [], [], [], [], [], []
            for _id, blob in zip(pdf[id_col], pdf[bin_col]):
                rate, samples = decode_wav(bytes(blob))
                n = int(samples.shape[0])
                ids.append(_id)
                nb.append(len(blob))
                rates.append(rate)
                ns.append(n)
                durs.append(n * 1000 // rate)
                loud.append(
                    int(np.abs(samples.astype(np.int64)).sum()) * 1000 // max(1, n)
                )
            yield pd.DataFrame(
                {
                    "id": ids,
                    "n_bytes": pd.array(nb, dtype="int32"),
                    "sample_rate": pd.array(rates, dtype="int32"),
                    "n_samples": pd.array(ns, dtype="int64"),
                    "duration_ms": pd.array(durs, dtype="int64"),
                    "mean_abs_x1000": pd.array(loud, dtype="int64"),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(decode, AUDIO_FEATURES_SCHEMA)


AUDIO_SPECTRAL_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("dominant_hz", T.DoubleType()),
        T.StructField("centroid_hz", T.DoubleType()),
        T.StructField("low_band_ratio_x1000", T.LongType()),
    ]
)


def audio_spectral_features(
    df: DataFrame, id_col: str, bin_col: str, n_fft: int = 512
) -> DataFrame:
    """REAL spectral features via numpy rfft over the first ``n_fft``
    samples (zero-padded): dominant-bin frequency, magnitude-weighted
    spectral centroid, and the energy share below sample_rate/8 —
    the classic cheap audio-quality signals. All computation is
    vectorized per batch (one stacked rfft per equal-rate group); no
    SQL oracle exists for an FFT, so correctness is pinned by pytest
    against analytic sinusoids instead of the DuckDB gate."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rates, clips = [], [], []
            for _id, blob in zip(pdf[id_col], pdf[bin_col]):
                rate, samples = decode_wav(bytes(blob))
                clip = np.zeros(n_fft, np.float64)
                n = min(n_fft, samples.shape[0])
                clip[:n] = samples[:n]
                ids.append(_id)
                rates.append(rate)
                clips.append(clip)
            if not ids:
                continue
            stack = np.stack(clips)  # (n_rows, n_fft)
            mag = np.abs(np.fft.rfft(stack, axis=1))
            mag[:, 0] = 0.0  # ignore DC for dominance/centroid
            freqs_per_rate = {
                r: np.fft.rfftfreq(n_fft, d=1.0 / r) for r in set(rates)
            }
            dom, cent, low = [], [], []
            for i, r in enumerate(rates):
                freqs = freqs_per_rate[r]
                m = mag[i]
                tot = m.sum()
                dom.append(float(freqs[int(m.argmax())]))
                cent.append(float((m * freqs).sum() / tot) if tot > 0 else 0.0)
                lo = m[freqs < r / 8.0].sum()
                low.append(int(round(lo * 1000 / tot)) if tot > 0 else 0)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "sample_rate": pd.array(rates, dtype="int32"),
                    "dominant_hz": dom,
                    "centroid_hz": cent,
                    "low_band_ratio_x1000": pd.array(low, dtype="int64"),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(decode, AUDIO_SPECTRAL_SCHEMA)


def frame_sample_stub(
    df: DataFrame, id_col: str, bin_col: str, every_nth: int = 10
) -> DataFrame:
    """'Sample frames' from a video binary: one output row per sampled
    frame (1:N fan-out through mapInPandas — the row-explosion shape of
    real frame extraction). STUB — the one that remains: real demuxing
    needs ffmpeg, absent here; frame count derives from byte length."""

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


# ---- deterministic test-pattern generators ----
#
# The testdata tables carry no real image/audio payloads, so gated
# queries SYNTHESIZE them: pixel/sample values are pure integer
# functions of (id, coordinate), which means a SQL oracle can compute
# the expected decoded features analytically — the decode is real, the
# expectation is closed-form.


def synth_image_payloads(df: DataFrame, id_col: str) -> DataFrame:
    """Per id: a (12 + id%8) × (16 + id%16) RGB test pattern with
    pixel(y, x, c) = (id·7 + y·5 + x·3 + c·11) mod 256, encoded BMP."""
    schema = T.StructType(
        [T.StructField(id_col, T.LongType()), T.StructField("payload", T.BinaryType())]
    )

    from paimon_python_spark.operators._util import widen

    # cap at 8: blob synth/decode is overhead-bound per python-runner
    # task at gate scale; real corpora arrive wide and skip the clamp
    df = widen(df.select(id_col), max_parts=8)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # vectorized per (w, h) class: ids sharing dimensions render
            # as ONE broadcasted (n, h, w, 3) modular expression and one
            # padded reshape — the Python loop runs per class (≤128),
            # not per image
            all_ids = pdf[id_col].to_numpy(dtype=np.int64)
            ws = 16 + all_ids % 16
            hs = 12 + all_ids % 8
            ids, blobs = [], []
            for key in {(int(w), int(h)) for w, h in zip(ws, hs)}:
                w, h = key
                gids = all_ids[(ws == w) & (hs == h)]
                n = len(gids)
                idv = gids[:, None, None, None]
                y = np.arange(h)[None, :, None, None]
                x = np.arange(w)[None, None, :, None]
                c = np.arange(3)[None, None, None, :]
                arr = ((idv * 7 + y * 5 + x * 3 + c * 11) % 256).astype(np.uint8)
                pad = (4 - (w * 3) % 4) % 4
                row_bytes = w * 3 + pad
                header = _bmp_header(w, h)
                bgr = arr[:, ::-1, :, ::-1].reshape(n, h, w * 3)
                if pad:
                    padded = np.zeros((n, h, row_bytes), np.uint8)
                    padded[:, :, : w * 3] = bgr
                else:
                    padded = bgr
                ids.extend(gids.tolist())
                blobs.extend(header + padded[i].tobytes() for i in range(n))
            yield pd.DataFrame({id_col: ids, "payload": blobs})

    return df.select(id_col).mapInPandas(gen, schema)


def synth_audio_payloads(df: DataFrame, id_col: str) -> DataFrame:
    """Per id: (500 + id%500) PCM16 samples at 8/12/16 kHz with
    sample(i) = ((id·31 + i·17) mod 2048) − 1024, encoded WAV."""
    schema = T.StructType(
        [T.StructField(id_col, T.LongType()), T.StructField("payload", T.BinaryType())]
    )
    from paimon_python_spark.operators._util import widen

    # cap at 8: blob synth/decode is overhead-bound per python-runner
    # task at gate scale; real corpora arrive wide and skip the clamp
    df = widen(df.select(id_col), max_parts=8)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for _id in pdf[id_col]:
                _id = int(_id)
                rate = 8000 + (_id % 3) * 4000
                n = 500 + _id % 500
                i = np.arange(n, dtype=np.int64)
                samples = ((_id * 31 + i * 17) % 2048) - 1024
                ids.append(_id)
                blobs.append(encode_wav_pcm16(rate, samples))
            yield pd.DataFrame({id_col: ids, "payload": blobs})

    return df.select(id_col).mapInPandas(gen, schema)
