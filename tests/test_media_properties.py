"""Property tests for the real media decoders: total on garbage (raise
ValueError or return, never crash otherwise), and round-trip exact on
arbitrary valid planes/samples."""

from __future__ import annotations

import struct

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from document_ai_spark.operators.multimodal import decode_bmp, decode_wav


@settings(max_examples=400, deadline=None)
@given(st.binary(max_size=512))
def test_decode_bmp_total_on_garbage(payload):
    try:
        plane = decode_bmp(payload)
    except ValueError:
        return
    assert plane.dtype == np.uint8 and plane.ndim == 2


@settings(max_examples=400, deadline=None)
@given(st.binary(max_size=512))
def test_decode_wav_total_on_garbage(payload):
    try:
        pcm, rate = decode_wav(payload)
    except ValueError:
        return
    assert pcm.dtype == np.int16


@settings(max_examples=150, deadline=None)
@given(
    st.integers(min_value=1, max_value=17),
    st.integers(min_value=1, max_value=9),
    st.data(),
)
def test_bmp24_gray_roundtrip(w, h, data):
    # r=g=b=v rows -> luma == v exactly, any width (exercises row padding)
    vals = [
        [data.draw(st.integers(min_value=0, max_value=255))
         for _ in range(w)]
        for _ in range(h)
    ]
    stride = ((w * 24 + 31) // 32) * 4
    hdr = (
        b"BM" + struct.pack("<IHHI", 54 + stride * h, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h,
                      2835, 2835, 0, 0)
    )
    body = b""
    for row in vals[::-1]:
        line = b"".join(bytes([v, v, v]) for v in row)
        body += line + b"\0" * (stride - len(line))
    assert decode_bmp(hdr + body).tolist() == vals


@settings(max_examples=150, deadline=None)
@given(st.lists(st.integers(min_value=-32768, max_value=32767),
                min_size=0, max_size=300),
       st.integers(min_value=1, max_value=192000))
def test_wav_roundtrip(samples, rate):
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    pcm, got_rate = decode_wav(wav)
    assert got_rate == rate
    assert pcm.tolist() == samples
