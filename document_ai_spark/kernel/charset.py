"""Charset sniffing + byte decode policy (stage M3 analog).

Reference analog: orientation/rotation normalization of the raw scan before
any downstream analysis (/root/reference/ai_documents/detection/sam.py:104-145).
Our input is raw HTML bytes; "orientation fix" becomes a deterministic
decode policy: BOM > declared <meta charset> > strict UTF-8 > windows-1252
fallback (which never fails). Fully deterministic — no chardet-style
statistical guessing.
"""

from __future__ import annotations

import re

# Only charsets we commit to honoring when declared; anything else falls
# through to the utf-8 / cp1252 chain so behaviour stays frozen.
_ALLOWED = {
    "utf-8": "utf-8",
    "utf8": "utf-8",
    "ascii": "ascii",
    "us-ascii": "ascii",
    "latin-1": "latin-1",
    "latin1": "latin-1",
    "iso-8859-1": "latin-1",
    "windows-1252": "cp1252",
    "cp1252": "cp1252",
}

# charset= inside the first 1024 bytes (HTML5 pre-scan window).
_CHARSET_RE = re.compile(
    rb"""charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)""", re.IGNORECASE
)

_PRESCAN = 1024


def decode_html(raw: bytes) -> tuple[str, str]:
    """Decode raw page bytes -> (text, charset_used).

    Policy (frozen; golden fixtures depend on it):
      1. UTF-8 / UTF-16 BOM wins.
      2. A declared ``charset=`` in the first 1024 bytes wins if it is in
         the allow-list AND the bytes actually decode under it (strict).
      3. Strict UTF-8.
      4. cp1252 with latin-1 fallback for the 5 undefined cp1252 bytes
         (0x81 0x8d 0x8f 0x90 0x9d) — total, never raises.
    """
    if raw.startswith(b"\xef\xbb\xbf"):
        return raw[3:].decode("utf-8", errors="replace"), "utf-8-bom"
    if raw.startswith(b"\xff\xfe") or raw.startswith(b"\xfe\xff"):
        return raw.decode("utf-16", errors="replace"), "utf-16"

    m = _CHARSET_RE.search(raw[:_PRESCAN])
    if m:
        declared = m.group(1).decode("ascii", errors="replace").lower()
        codec = _ALLOWED.get(declared)
        if codec is not None:
            try:
                return raw.decode(codec), codec
            except (UnicodeDecodeError, ValueError):
                pass  # lying declaration -> fall through

    try:
        return raw.decode("utf-8"), "utf-8"
    except UnicodeDecodeError:
        pass
    try:
        return raw.decode("cp1252"), "cp1252"
    except UnicodeDecodeError:
        return raw.decode("latin-1"), "latin-1"
