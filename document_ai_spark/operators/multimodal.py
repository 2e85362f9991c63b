"""Multimodal binary columns: images/audio/video as opaque BINARY + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched `mapInPandas` stages.

The Spark-side plumbing (schemas, batch shape, partitioning, error rows) is
real and tested; the actual media DECODE is stubbed — this container ships
no image/audio codecs — behind `_decode_image` / `_decode_audio`, which
produce a deterministic fake (size-seeded) so tests are reproducible. Swap
those two functions for PIL/libsndfile calls on a cluster with codecs
installed; nothing else changes.

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


def _decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB — deterministic fake decoder. No image codec ships in this
    container; a real deployment replaces this body with e.g.
    ``np.asarray(PIL.Image.open(io.BytesIO(payload)))``. The fake derives
    a (height, width) luma plane from the payload bytes so downstream
    feature math is real and reproducible."""
    if not payload:
        raise ValueError("empty payload")
    h = max(1, int(height or 8))
    w = max(1, int(width or 8))
    seed = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8)
    tiled = np.resize(seed, (h, w))
    return tiled


def _decode_audio(payload: bytes, duration_ms: int) -> np.ndarray:
    """STUB — deterministic fake PCM decoder (same contract as above)."""
    if not payload:
        raise ValueError("empty payload")
    n = max(1, int(duration_ms or 100) * 16)  # fake 16 samples/ms
    seed = np.frombuffer(payload[:256].ljust(256, b"\0"), dtype=np.uint8)
    return np.resize(seed.astype(np.float32) / 255.0 - 0.5, n)


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
        for _i, r in pdf.iterrows():
            rows["media_id"].append(r["media_id"])
            try:
                meta = r["meta"] or {}
                plane = _decode_image(
                    r["payload"], meta.get("width"), meta.get("height")
                )
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
    """media (MEDIA_SCHEMA, kind='image') -> per-image features."""
    cols = media.select("media_id", "payload", "meta")  # prune before Arrow
    return cols.mapInPandas(_image_feature_batches,
                            schema=IMAGE_FEATURES_SCHEMA)


def _frame_sample_batches(
    n_frames: int,
) -> "callable":
    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("media_id", "frame_no", "ts_ms", "frame")}
            for _i, r in pdf.iterrows():
                meta = r["meta"] or {}
                dur = int(meta.get("duration_ms") or 0)
                payload = r["payload"] or b""
                if not payload or dur <= 0:
                    continue  # undecodable video -> zero frames
                step = max(1, dur // n_frames)
                for f in range(min(n_frames, dur // step)):
                    ts = f * step
                    # STUB frame bytes: deterministic slice of the payload
                    lo = (ts * 31) % max(1, len(payload))
                    out["media_id"].append(r["media_id"])
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


def audio_features(media: DataFrame) -> DataFrame:
    """audio rows -> (media_id, n_samples, rms) via the stub PCM decoder."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.StringType()),
            T.StructField("n_samples", T.IntegerType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("decode_ok", T.BooleanType()),
        ]
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "n_samples": [], "rms": [],
                   "decode_ok": []}
            for _i, r in pdf.iterrows():
                out["media_id"].append(r["media_id"])
                try:
                    meta = r["meta"] or {}
                    pcm = _decode_audio(
                        r["payload"], meta.get("duration_ms")
                    )
                    out["n_samples"].append(int(pcm.size))
                    out["rms"].append(
                        round(float(np.sqrt((pcm ** 2).mean())), 6)
                    )
                    out["decode_ok"].append(True)
                except Exception:
                    out["n_samples"].append(0)
                    out["rms"].append(0.0)
                    out["decode_ok"].append(False)
            yield pd.DataFrame(out)

    cols = media.filter(media.kind == "audio").select(
        "media_id", "payload", "meta"
    )
    return cols.mapInPandas(gen, schema=schema)
