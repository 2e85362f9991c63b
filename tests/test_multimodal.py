"""Multimodal binary columns with REAL codecs (r3): pure-Python BMP and
WAV/PCM16 decoders, feature math with hand-computed goldens, 1-to-many
frame sampling, error rows, determinism."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from document_ai_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    audio_features,
    decode_bmp,
    decode_wav,
    image_features,
    sample_frames,
)


def _bmp24(rows_top_down: list[list[tuple[int, int, int]]],
           top_down: bool = False) -> bytes:
    """Build a real uncompressed 24bpp BMP from (r, g, b) pixel rows."""
    h = len(rows_top_down)
    w = len(rows_top_down[0])
    stride = ((w * 24 + 31) // 32) * 4
    hdr = (
        b"BM"
        + struct.pack("<IHHI", 54 + stride * h, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h if not top_down else -h,
                      1, 24, 0, stride * h, 2835, 2835, 0, 0)
    )
    order = rows_top_down if top_down else rows_top_down[::-1]
    body = b""
    for row in order:
        line = b"".join(bytes([b, g, r]) for (r, g, b) in row)
        body += line + b"\0" * (stride - len(line))
    return hdr + body


def _bmp8_gray(rows_top_down: list[list[int]]) -> bytes:
    """Real 8bpp BMP with an identity grayscale palette."""
    h = len(rows_top_down)
    w = len(rows_top_down[0])
    stride = ((w * 8 + 31) // 32) * 4
    palette = b"".join(bytes([v, v, v, 0]) for v in range(256))
    data_off = 54 + len(palette)
    hdr = (
        b"BM"
        + struct.pack("<IHHI", data_off + stride * h, 0, 0, data_off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, stride * h,
                      2835, 2835, 256, 0)
    )
    body = b""
    for row in rows_top_down[::-1]:
        body += bytes(row) + b"\0" * (stride - w)
    return hdr + palette + body


def _wav16(samples: list[int], rate: int = 16000) -> bytes:
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


# ---------- decoder unit tests (hand-computed) ----------

def test_decode_bmp24_gray_identity():
    # r=g=b=v -> luma (299v+587v+114v)//1000 == v exactly
    rows = [[(10, 10, 10), (200, 200, 200)], [(0, 0, 0), (255, 255, 255)]]
    plane = decode_bmp(_bmp24(rows))
    assert plane.tolist() == [[10, 200], [0, 255]]


def test_decode_bmp24_color_luma_and_orientation():
    # pure red / green / blue lumas: 299//1000 scaled
    rows = [[(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0)]]
    plane = decode_bmp(_bmp24(rows))
    assert plane.tolist() == [[
        (299 * 255) // 1000, (587 * 255) // 1000, (114 * 255) // 1000,
        (299 * 255 + 587 * 255) // 1000,
    ]]
    # top-down flag yields the same image
    assert decode_bmp(_bmp24(rows, top_down=True)).tolist() == plane.tolist()


def test_decode_bmp24_row_order_bottom_up():
    rows = [[(1, 1, 1)], [(2, 2, 2)], [(3, 3, 3)]]  # top-down 1,2,3
    assert decode_bmp(_bmp24(rows)).flatten().tolist() == [1, 2, 3]


def test_decode_bmp8_palette():
    plane = decode_bmp(_bmp8_gray([[0, 128], [255, 7]]))
    assert plane.tolist() == [[0, 128], [255, 7]]


def test_decode_bmp_rejects_garbage():
    for bad in (b"", b"BM", b"notabmp" * 20,
                _bmp24([[(1, 1, 1)]])[:30]):
        with pytest.raises(ValueError):
            decode_bmp(bad)
    # truncated pixel array
    full = _bmp24([[(5, 5, 5)] * 4] * 4)
    with pytest.raises(ValueError):
        decode_bmp(full[:-8])


def test_decode_wav_roundtrip():
    samples = [0, 16384, -16384, 32767, -32768, 5]
    pcm, rate = decode_wav(_wav16(samples, rate=8000))
    assert rate == 8000
    assert pcm.tolist() == samples


def test_decode_wav_rejects_garbage():
    for bad in (b"", b"RIFFxxxxWAVE", b"\x00" * 100):
        with pytest.raises(ValueError):
            decode_wav(bad)


# ---------- Spark-side feature stages ----------

def _media_df(spark):
    gray_ramp = [[(8 * y + x,) * 3 for x in range(8)] for y in range(8)]
    rows = [
        ("img_const", "image", _bmp24([[(7, 7, 7)] * 8] * 8), "image/bmp",
         {"width": 8, "height": 8, "duration_ms": None}),
        ("img_ramp", "image", _bmp24(gray_ramp), "image/bmp",
         {"width": 8, "height": 8, "duration_ms": None}),
        ("img_bad", "image", b"\x89PNGnotsupported", "image/png",
         {"width": 4, "height": 4, "duration_ms": None}),
        ("aud1", "audio", _wav16([16384] * 1000), "audio/wav",
         {"width": None, "height": None, "duration_ms": 62}),
        ("aud_bad", "audio", b"RIFFjunk", "audio/wav",
         {"width": None, "height": None, "duration_ms": 10}),
        ("vid1", "video", b"\x00\x00ftypmp4fake" * 20, "video/mp4",
         {"width": 64, "height": 48, "duration_ms": 2000}),
        ("vid_empty", "video", b"", "video/mp4",
         {"width": 64, "height": 48, "duration_ms": 2000}),
    ]
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def test_image_features_hand_computed_goldens(spark):
    """Real decode, exact answers:
    - constant 8x8 plane of 7s: mean_luma 7.0; no pixel exceeds the mean
      -> phash 0
    - ramp plane[y][x] = 8y+x: mean 31.5; bits set exactly for pixels
      >= 32, i.e. bit indices 32..63 -> unsigned 2^64 - 2^32 -> signed
      -2^32."""
    media = _media_df(spark)
    got = {r.media_id: r for r in image_features(
        media.filter(media.kind == "image")).collect()}
    c = got["img_const"]
    assert (c.width, c.height) == (8, 8)
    assert (c.mean_luma, c.phash, c.decode_ok) == (7.0, 0, True)
    r = got["img_ramp"]
    assert (r.mean_luma, r.phash, r.decode_ok) == (31.5, -(1 << 32), True)
    bad = got["img_bad"]
    assert not bad.decode_ok and bad.err.startswith("decode_failed:")
    # deterministic across runs
    again = {x.media_id: x.phash for x in image_features(
        media.filter(media.kind == "image")).collect()}
    assert again == {k: v.phash for k, v in got.items()}


def test_audio_features_real_wav(spark):
    media = _media_df(spark)
    rows = {r.media_id: r for r in audio_features(media).collect()}
    a = rows["aud1"]
    assert a.decode_ok and a.n_samples == 1000 and a.sample_rate == 16000
    # all samples 16384 -> normalized 0.5 -> rms exactly 0.5
    assert a.rms == 0.5
    assert not rows["aud_bad"].decode_ok


def test_frame_sampling_one_to_many(spark):
    media = _media_df(spark)
    frames = sample_frames(media, n_frames=4).collect()
    by_id = {}
    for f in frames:
        by_id.setdefault(f.media_id, []).append(f)
    assert len(by_id["vid1"]) == 4
    assert [f.frame_no for f in sorted(by_id["vid1"],
                                       key=lambda x: x.frame_no)] == [0, 1, 2, 3]
    assert all(len(f.frame) > 0 for f in by_id["vid1"])
    assert "vid_empty" not in by_id  # undecodable -> zero frames, no crash


def test_media_features_query_matches_kernel(spark):
    """The driver query's in-query BMP construction really decodes: pick
    one doc, rebuild its payload locally, decode with the kernel decoder,
    and compare with the query's output row."""
    import hashlib

    from document_ai_spark.queries import _t
    from document_ai_spark.queries_ml import (
        _BMP_SUFFIXES,
        q_media_features,
    )

    sf = "/root/testdata/sf0.001"
    doc = (
        _t(spark, sf, "documents")
        .filter("doc_id = 1").select("text").collect()[0].text
    )
    hx = "".join(
        hashlib.md5((doc + s).encode()).hexdigest() for s in _BMP_SUFFIXES
    )
    from document_ai_spark.queries_ml import _bmp_header_b64
    import base64

    payload = base64.b64decode(_bmp_header_b64()) + hx.encode()
    plane = decode_bmp(payload)
    row = {
        r.media_id: r for r in q_media_features(spark, sf).collect()
    }["1"]
    assert row.width == plane.shape[1] and row.height == plane.shape[0]
    assert row.mean_luma == round(float(plane.mean()), 6)
