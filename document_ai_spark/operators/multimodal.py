"""Multimodal binary columns: images/audio/video as opaque BINARY + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched `mapInPandas` stages.

r3: the decoders are REAL (the r1/r2 deterministic-fake stubs are gone):
  - decode_bmp: uncompressed BMP (BITMAPFILEHEADER + BITMAPINFOHEADER),
    24bpp BGR and 8bpp palette, bottom-up/top-down rows, 4-byte row
    padding -> uint8 luma plane (exact integer BT.601: (299r+587g+114b)
    // 1000, so the feature math has a closed form DuckDB reproduces).
  - decode_wav: RIFF/WAVE chunk walk, PCM 16-bit -> int16 sample array.
No third-party codec is needed for either format; richer formats (JPEG,
FLAC, ...) plug in behind the same decode_ok/err row contract.

Design mirrors the text pipeline: prune columns before the Arrow boundary,
bounded batches (session.py caps), total per-row error capture.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),       # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("meta", T.StructType([          # typed metadata
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("duration_ms", T.IntegerType()),
        ])),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("phash", T.LongType()),
        T.StructField("decode_ok", T.BooleanType()),
        T.StructField("err", T.StringType()),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("ts_ms", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Real minimal BMP decoder -> uint8 luma plane (height, width).

    Supports the classic uncompressed layout: 14-byte BITMAPFILEHEADER,
    >=40-byte BITMAPINFOHEADER, BI_RGB, 24bpp BGR triples or 8bpp with a
    BGRA palette, rows 4-byte padded, bottom-up (positive height) or
    top-down (negative). Luma uses exact integer BT.601
    ((299*r + 587*g + 114*b) // 1000) so every downstream feature has a
    closed form both engines can compute."""
    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = int.from_bytes(payload[10:14], "little")
    hdr_size = int.from_bytes(payload[14:18], "little")
    if hdr_size < 40:
        raise ValueError("unsupported DIB header")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if comp != 0:
        raise ValueError("compressed BMP unsupported")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h <= 0 or w > 1 << 16 or h > 1 << 16:
        raise ValueError("bad dimensions")
    stride = ((w * bpp + 31) // 32) * 4
    px = payload[data_off : data_off + stride * h]
    if len(px) < stride * h:
        raise ValueError("truncated pixel array")
    arr = np.frombuffer(px, np.uint8).reshape(h, stride)
    if bpp == 24:
        rows = arr[:, : w * 3].reshape(h, w, 3).astype(np.int64)
        b, g, r = rows[..., 0], rows[..., 1], rows[..., 2]
        luma = ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)
    elif bpp == 8:
        pal_off = 14 + hdr_size
        n_colors = int.from_bytes(payload[46:50], "little") or 256
        pal = np.frombuffer(
            payload[pal_off : pal_off + 4 * n_colors], np.uint8
        ).reshape(-1, 4).astype(np.int64)
        pal_luma = (
            (299 * pal[:, 2] + 587 * pal[:, 1] + 114 * pal[:, 0]) // 1000
        ).astype(np.uint8)
        idx = arr[:, :w]
        if idx.max(initial=0) >= len(pal_luma):
            raise ValueError("palette index out of range")
        luma = pal_luma[idx]
    else:
        raise ValueError(f"unsupported bpp {bpp}")
    if not top_down:
        luma = luma[::-1]
    return luma


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Real minimal WAV decoder -> (int16 sample array, sample_rate).

    Walks RIFF chunks; requires a PCM (format 1) 16-bit `fmt ` chunk and a
    `data` chunk. Multi-channel data is returned interleaved."""
    if payload is None or len(payload) < 44 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    fmt = None
    data = None
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits != 16:
        raise ValueError("only 16-bit PCM supported")
    rate = int.from_bytes(fmt[4:8], "little")
    samples = np.frombuffer(data[: len(data) - (len(data) % 2)], "<i2")
    return samples, rate


def _phash64(plane: np.ndarray) -> int:
    """Real feature math over the decoded plane: 8x8 mean-threshold hash."""
    h, w = plane.shape
    ys = np.array_split(np.arange(h), 8)
    xs = np.array_split(np.arange(w), 8)
    cells = np.array(
        [[plane[np.ix_(y, x)].mean() for x in xs] for y in ys]
    )
    bits = (cells > cells.mean()).flatten()
    val = 0
    for i, b in enumerate(bits):
        if b:
            val |= 1 << i
    return val - (1 << 64) if val >= (1 << 63) else val


def _image_feature_batches(
    it: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in it:
        rows = {k: [] for k in ("media_id", "width", "height", "mean_luma",
                                "phash", "decode_ok", "err")}
        # column iteration, not iterrows(): no per-row Series construction
        for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
            rows["media_id"].append(media_id)
            try:
                plane = decode_bmp(payload)
                rows["width"].append(int(plane.shape[1]))
                rows["height"].append(int(plane.shape[0]))
                rows["mean_luma"].append(round(float(plane.mean()), 6))
                rows["phash"].append(_phash64(plane.astype(np.float64)))
                rows["decode_ok"].append(True)
                rows["err"].append("")
            except Exception as exc:  # error row, never task failure
                rows["width"].append(0)
                rows["height"].append(0)
                rows["mean_luma"].append(0.0)
                rows["phash"].append(0)
                rows["decode_ok"].append(False)
                rows["err"].append(f"decode_failed:{type(exc).__name__}")
        yield pd.DataFrame(rows)


def image_features(media: DataFrame) -> DataFrame:
    """media (MEDIA_SCHEMA, kind='image') -> per-image features. The BMP
    header carries the dimensions, so only (media_id, payload) cross the
    Arrow boundary."""
    cols = media.select("media_id", "payload")  # prune before Arrow
    return cols.mapInPandas(_image_feature_batches,
                            schema=IMAGE_FEATURES_SCHEMA)


def _frame_sample_batches(
    n_frames: int,
) -> "callable":
    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("media_id", "frame_no", "ts_ms", "frame")}
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                meta = meta or {}
                dur = int(meta.get("duration_ms") or 0)
                payload = payload or b""
                if not payload or dur <= 0:
                    continue  # undecodable video -> zero frames
                step = max(1, dur // n_frames)
                for f in range(min(n_frames, dur // step)):
                    ts = f * step
                    # container-agnostic frame sample: deterministic byte
                    # slice at the timestamp's position (a codec plugs in
                    # here for real container formats)
                    lo = (ts * 31) % max(1, len(payload))
                    out["media_id"].append(media_id)
                    out["frame_no"].append(f)
                    out["ts_ms"].append(ts)
                    out["frame"].append(payload[lo : lo + 64])
            yield pd.DataFrame(out) if out["media_id"] else pd.DataFrame(
                {k: pd.Series([], dtype=o) for k, o in
                 [("media_id", "object"), ("frame_no", "int32"),
                  ("ts_ms", "int32"), ("frame", "object")]}
            )
    return gen


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """video rows -> n deterministic frame samples per video (1-to-many
    mapInPandas — the M6 subdivide pattern over binary media)."""
    cols = media.filter(media.kind == "video").select(
        "media_id", "payload", "meta"
    )
    return cols.mapInPandas(_frame_sample_batches(n_frames),
                            schema=FRAME_SAMPLE_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def audio_features(media: DataFrame) -> DataFrame:
    """audio rows -> (media_id, n_samples, sample_rate, rms) via the real
    WAV/PCM16 decoder; rms is over samples normalized to [-1, 1)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "n_samples": [], "sample_rate": [],
                   "rms": [], "decode_ok": []}
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(media_id)
                try:
                    pcm, rate = decode_wav(payload)
                    norm = pcm.astype(np.float64) / 32768.0
                    out["n_samples"].append(int(pcm.size))
                    out["sample_rate"].append(int(rate))
                    out["rms"].append(
                        round(float(np.sqrt((norm ** 2).mean())), 6)
                        if pcm.size else 0.0
                    )
                    out["decode_ok"].append(True)
                except Exception:
                    out["n_samples"].append(0)
                    out["sample_rate"].append(0)
                    out["rms"].append(0.0)
                    out["decode_ok"].append(False)
            yield pd.DataFrame(out)

    cols = media.filter(media.kind == "audio").select("media_id", "payload")
    return cols.mapInPandas(gen, schema=AUDIO_FEATURES_SCHEMA)
