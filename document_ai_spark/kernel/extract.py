"""Per-document extraction orchestrator: raw bytes -> ExtractResult.

This is the single frozen kernel shared by the Spark ``mapInPandas`` stage,
the golden-fixture generator's verification pass, and the unit tests — the
analog of the reference's ``analyze()`` orchestration
(/root/reference/ai_documents/analysis/entities.py:370-384), with the same
"never crash, degrade to an error row" posture
(/root/reference/ai_documents/analysis/entities.py:425-430;
/root/reference/performances.py:282-294).

Pipeline per document:
  %PDF- magic -> PDF branch (pdf.py)          [S6]
  else        -> decode (charset.py)          [M3]
              -> truncation guard             [bounded work per doc, analog of
                                               fixed-height resize,
                                               template_matching.py:169-188]
              -> tokenize + segment (tokenizer.py)   [M1/M4/M5]
              -> classify (classify.py)              [M7 replacement]
              -> main_text + span offsets (W5 cumulative offsets)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .charset import decode_html
from .classify import classify_blocks
from .pdf import extract_pdf_lines
from .tokenizer import tokenize_blocks

MAX_HTML_BYTES = 4 * 1024 * 1024  # truncation guard for giant pages

ERR_NONE = ""
ERR_TRUNCATED = "truncated_page"
ERR_PDF = "pdf_parse_failed"
ERR_EXC = "parse_exception"

KIND_TEXT = "text"
KIND_HEADING = "heading"
KIND_PDF = "pdf"

_BLOCK_SEP = "\n\n"
_PDF_SEP = "\n"


@dataclass
class Span:
    span_id: int
    start: int
    end: int
    block_id: int
    kind: str


@dataclass
class ExtractResult:
    main_text: str = ""
    spans: list[Span] = field(default_factory=list)
    n_blocks: int = 0
    parse_ok: bool = True
    err: str = ERR_NONE
    charset: str = ""


def _extract_pdf(raw: bytes) -> ExtractResult:
    lines = extract_pdf_lines(raw)
    if not lines:
        return ExtractResult(parse_ok=False, err=ERR_PDF, charset="binary")
    res = ExtractResult(charset="binary")
    parts: list[str] = []
    offset = 0
    for i, (_y, _x, txt) in enumerate(lines):
        if i > 0:
            offset += len(_PDF_SEP)
        res.spans.append(
            Span(span_id=i, start=offset, end=offset + len(txt),
                 block_id=i, kind=KIND_PDF)
        )
        parts.append(txt)
        offset += len(txt)
    res.main_text = _PDF_SEP.join(parts)
    res.n_blocks = len(lines)
    return res


def _extract_html(raw: bytes) -> ExtractResult:
    err = ERR_NONE
    if len(raw) > MAX_HTML_BYTES:
        raw = raw[:MAX_HTML_BYTES]
        err = ERR_TRUNCATED
    text, charset = decode_html(raw)
    blocks = tokenize_blocks(text)
    flags = classify_blocks(blocks)
    res = ExtractResult(err=err, charset=charset, n_blocks=len(blocks))
    parts: list[str] = []
    offset = 0
    span_id = 0
    for b, is_content in zip(blocks, flags):
        if not is_content:
            continue
        if parts:
            offset += len(_BLOCK_SEP)
        res.spans.append(
            Span(
                span_id=span_id,
                start=offset,
                end=offset + len(b.text),
                block_id=b.block_id,
                kind=KIND_HEADING if b.is_heading else KIND_TEXT,
            )
        )
        parts.append(b.text)
        offset += len(b.text)
        span_id += 1
    res.main_text = _BLOCK_SEP.join(parts)
    return res


def extract_document(raw: bytes | None) -> ExtractResult:
    """Total function: any byte string (or None) -> ExtractResult."""
    try:
        if raw is None:
            return ExtractResult(parse_ok=False, err=ERR_EXC, charset="")
        if raw.startswith(b"%PDF-"):
            return _extract_pdf(raw)
        return _extract_html(raw)
    except Exception as exc:  # degrade to error row, never fail the task
        return ExtractResult(
            parse_ok=False, err=f"{ERR_EXC}:{type(exc).__name__}", charset=""
        )
