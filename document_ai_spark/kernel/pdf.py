"""Minimal deterministic PDF text extraction (S6 analog).

Reference analog: pdf2image page conversion + downstream OCR
(/root/reference/ai_documents/analysis/cv/document_parsing.py:5-14). Here the
"layout parse" is direct: we read uncompressed PDF content streams and pull
``Td``-positioned ``Tj``/``TJ`` text-show operators, then order spans by
layout (top-to-bottom, then left-to-right) exactly like the reference orders
word boxes before key-value search (document_parsing.py:16-29,132-198).

Scope is frozen to the deterministic subset our corpus generator emits
(uncompressed streams, literal strings, Td/TD positioning). Anything else
yields zero spans -> the caller records ``pdf_parse_failed``. No external
PDF library is used.
"""

from __future__ import annotations

import re

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)
# "x y Td" or "x y TD" followed (possibly after font ops) by "(...) Tj"
_TD_RE = re.compile(
    rb"(-?\d+(?:\.\d+)?)\s+(-?\d+(?:\.\d+)?)\s+T[dD]"
)
_TJ_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)\s*Tj")
# TJ array form: [(seg) -20 (ment)] TJ — string segments concatenated,
# numeric kerning adjustments ignored (frozen policy)
_TJ_ARRAY_RE = re.compile(rb"\[((?:[^\[\]\\]|\\.)*)\]\s*TJ")
_TJ_SEG_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)")

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape_pdf_string(s: bytes) -> str:
    out = bytearray()
    i = 0
    n = len(s)
    while i < n:
        c = s[i : i + 1]
        if c == b"\\" and i + 1 < n:
            nxt = s[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal escape \ddd (1-3 digits)
                j = i + 1
                while j < min(i + 4, n) and s[j : j + 1].isdigit():
                    j += 1
                out.append(int(s[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            i += 1
            continue
        out += c
        i += 1
    return out.decode("latin-1")


def extract_pdf_lines(raw: bytes) -> list[tuple[float, float, str]]:
    """Return [(y, x, text)] for every positioned text-show in layout order:
    descending y (PDF origin is bottom-left), then ascending x, then source
    order for exact ties."""
    spans: list[tuple[float, float, int, str]] = []
    order = 0
    for sm in _STREAM_RE.finditer(raw):
        body = sm.group(1)
        # Walk Td/Tj in source order, pairing each Tj with the text cursor
        # set by the most recent Td/TD (relative moves accumulate).
        x = y = 0.0
        events = sorted(
            [(m.start(), "td", m) for m in _TD_RE.finditer(body)]
            + [(m.start(), "tj", m) for m in _TJ_RE.finditer(body)]
            + [(m.start(), "tja", m) for m in _TJ_ARRAY_RE.finditer(body)]
            + [(m.start(), "bt", m) for m in re.finditer(rb"\bBT\b", body)]
        )
        for _pos, kind, m in events:
            if kind == "bt":  # new text object resets the text cursor
                x = y = 0.0
            elif kind == "td":
                x += float(m.group(1))
                y += float(m.group(2))
            else:
                if kind == "tja":
                    txt = "".join(
                        _unescape_pdf_string(seg.group(1))
                        for seg in _TJ_SEG_RE.finditer(m.group(1))
                    )
                else:
                    txt = _unescape_pdf_string(m.group(1))
                if txt:
                    spans.append((y, x, order, txt))
                    order += 1
    spans.sort(key=lambda s: (-s[0], s[1], s[2]))
    return [(y, x, t) for (y, x, _o, t) in spans]
