"""Unit tests for the frozen extraction kernel — hand-written expectations
(independent of both datagen and Spark), per stage: decode, tokenize,
classify, PDF, orchestration."""

from __future__ import annotations

from document_ai_spark.kernel.charset import decode_html
from document_ai_spark.kernel.classify import classify_blocks
from document_ai_spark.kernel.extract import (
    ERR_PDF,
    ERR_TRUNCATED,
    MAX_HTML_BYTES,
    extract_document,
)
from document_ai_spark.kernel.pdf import extract_pdf_lines
from document_ai_spark.kernel.tokenizer import tokenize_blocks

LONG = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"


# ---------- charset ----------

def test_decode_bom():
    assert decode_html(b"\xef\xbb\xbfhi") == ("hi", "utf-8-bom")


def test_decode_declared_cp1252():
    raw = '<meta charset="windows-1252"><p>café</p>'.encode("cp1252")
    text, cs = decode_html(raw)
    assert cs == "cp1252" and "café" in text


def test_decode_lying_declaration_falls_back():
    # declares utf-8 but contains invalid utf-8 byte -> cp1252 fallback
    raw = b'<meta charset="utf-8"><p>caf\xe9</p>'
    text, cs = decode_html(raw)
    assert cs == "cp1252" and "caf\xe9" in text


def test_decode_plain_utf8():
    assert decode_html("héllo".encode())[1] == "utf-8"


# ---------- tokenizer ----------

def test_tokenize_basic_blocks():
    blocks = tokenize_blocks("<body><h1>Title Here</h1><p>one two</p></body>")
    assert [(b.tag, b.text) for b in blocks] == [
        ("h1", "Title Here"),
        ("p", "one two"),
    ]
    assert blocks[0].is_heading and not blocks[1].is_heading


def test_tokenize_whitespace_and_entities():
    blocks = tokenize_blocks("<p>  a&amp;b \n\t c &lt;d&gt; &nosuch; </p>")
    assert blocks[0].text == "a&b c <d> &nosuch;"


def test_tokenize_inline_tags_do_not_split():
    blocks = tokenize_blocks("<p>one <b>two</b> three <i>four</i></p>")
    assert len(blocks) == 1 and blocks[0].text == "one two three four"


def test_tokenize_script_style_skipped():
    blocks = tokenize_blocks(
        "<p>keep</p><script>drop() < 1;</script><style>p{}</style><p>also</p>"
    )
    assert [b.text for b in blocks] == ["keep", "also"]


def test_tokenize_link_text_tracked():
    blocks = tokenize_blocks('<p>go <a href="/x">here now</a> end</p>')
    b = blocks[0]
    assert b.text == "go here now end"
    assert b.link_text_len == len("here now")


def test_tokenize_chrome_flag():
    blocks = tokenize_blocks(
        "<nav><li>x</li></nav><p>main</p><footer><p>c</p></footer>"
    )
    flags = [(b.text, b.in_chrome) for b in blocks]
    assert flags == [("x", True), ("main", False), ("c", True)]


def test_tokenize_unclosed_tags_recover():
    blocks = tokenize_blocks("<p><b>one<p>two</p>")
    assert [b.text for b in blocks] == ["one", "two"]


def test_tokenize_stray_lt_is_text():
    blocks = tokenize_blocks("<p>5 < 6 and a <1 ok</p>")
    assert blocks[0].text == "5 < 6 and a <1 ok"


def test_tokenize_comment_and_doctype_dropped():
    blocks = tokenize_blocks("<!DOCTYPE html><!-- c --><p>x y</p>")
    assert [b.text for b in blocks] == ["x y"]


# ---------- classifier ----------

def _mk(html: str):
    blocks = tokenize_blocks(html)
    return blocks, classify_blocks(blocks)


def test_classify_dense_paragraph_content():
    _b, f = _mk(f"<p>{LONG}</p>")
    assert f == [True]


def test_classify_short_and_linky_rejected():
    _b, f = _mk('<p>short</p><p><a href="/x">' + LONG + "</a></p>")
    assert f == [False, False]


def test_classify_heading_promoted_by_dense_next():
    _b, f = _mk(f"<h1>A Title</h1><p>{LONG}</p>")
    assert f == [True, True]


def test_classify_heading_without_content_rejected():
    _b, f = _mk("<h1>A Title</h1><p>short tail</p>")
    assert f == [False, False]


def test_classify_bridge_between_dense():
    _b, f = _mk(f"<p>{LONG}</p><p>tiny quote</p><p>{LONG}</p>")
    assert f == [True, True, True]


def test_classify_chrome_never_content():
    _b, f = _mk(f"<nav><p>{LONG}</p></nav><p>{LONG}</p>")
    assert f == [False, True]


# ---------- pdf ----------

PDF = (
    b"%PDF-1.4\n1 0 obj << /Length 99 >>\nstream\n"
    b"BT /F1 12 Tf 72 700 Td (First line) Tj ET\n"
    b"BT /F1 12 Tf 72 680 Td (Second \\(esc\\) line) Tj ET\n"
    b"endstream\nendobj\n%%EOF\n"
)


def test_pdf_lines_layout_order():
    lines = extract_pdf_lines(PDF)
    assert [t for (_y, _x, t) in lines] == ["First line", "Second (esc) line"]


def test_pdf_extract_document():
    res = extract_document(PDF)
    assert res.parse_ok
    assert res.main_text == "First line\nSecond (esc) line"
    assert [s.kind for s in res.spans] == ["pdf", "pdf"]
    assert res.main_text[res.spans[1].start : res.spans[1].end] == (
        "Second (esc) line"
    )


def test_pdf_garbage_fails_cleanly():
    res = extract_document(b"%PDF-1.4\nnot really\n")
    assert not res.parse_ok and res.err == ERR_PDF


# ---------- orchestration ----------

def test_extract_spans_offsets_consistent():
    res = extract_document(
        f"<h1>My Title</h1><p>{LONG}</p><p>{LONG} extra</p>".encode()
    )
    assert res.parse_ok
    for s in res.spans:
        # every span slices back out of main_text exactly
        seg = res.main_text[s.start : s.end]
        assert seg and "\n" not in seg
    assert res.spans[0].kind == "heading"
    assert res.main_text.startswith("My Title\n\n")


def test_extract_truncation_guard():
    big = b"<p>" + b"a " * (MAX_HTML_BYTES // 2 + 16) + b"</p>"
    res = extract_document(big)
    assert res.parse_ok and res.err == ERR_TRUNCATED


def test_extract_none_and_empty():
    assert not extract_document(None).parse_ok
    res = extract_document(b"")
    assert res.parse_ok and res.main_text == ""


def test_extract_deterministic():
    raw = f"<h1>T A B</h1><p>{LONG}</p>".encode()
    a, b = extract_document(raw), extract_document(raw)
    assert a.main_text == b.main_text and len(a.spans) == len(b.spans)


def test_pdf_tj_array_form():
    pdf = (
        b"%PDF-1.4\n1 0 obj << /Length 80 >>\nstream\n"
        b"BT /F1 12 Tf 72 700 Td [(Hel) -20 (lo wor) 5 (ld)] TJ ET\n"
        b"endstream\nendobj\n%%EOF\n"
    )
    res = extract_document(pdf)
    assert res.parse_ok
    assert res.main_text == "Hello world"


def test_decode_utf16_bom():
    raw = "﻿<p>utf sixteen text here</p>".encode("utf-16")
    text, cs = decode_html(raw)
    assert cs == "utf-16"
    res = extract_document(raw)
    # utf-16 has no %PDF magic and decodes through the BOM branch
    assert res.parse_ok


def test_tokenize_self_closing_anchor_not_link_text():
    # <a/> opens nothing: following text must not count as link text
    blocks = tokenize_blocks(f"<p><a/>{LONG}</p>")
    assert blocks[0].link_text_len == 0


def test_tokenize_unquoted_attr_trailing_slash_not_self_close():
    # <a href=https://example.com/> — the trailing '/' belongs to the
    # unquoted HTML5 attribute value, NOT a self-close marker: the anchor
    # opens and its text must count as link text (ADVICE r2)
    blocks = tokenize_blocks(
        f"<p><a href=https://example.com/>{LONG}</a></p>"
    )
    assert blocks[0].link_text_len == len(LONG)


def test_tokenize_standalone_trailing_slash_still_self_closes():
    # '<a href="x" />' and '<a/>' keep self-close semantics: the slash is
    # a standalone token (preceded by whitespace/quote or alone)
    for frag in (f'<p><a href="x" />{LONG}</p>', f'<p><a href="x"/>{LONG}</p>'):
        blocks = tokenize_blocks(frag)
        assert blocks[0].link_text_len == 0, frag


def test_tokenize_unclosed_anchor_resets_at_block_boundary():
    # an unclosed <a> must not mark every later block as pure link text
    blocks = tokenize_blocks(f"<p><a href='x'>here</p><p>{LONG}</p>")
    assert blocks[0].link_text_len == len("here")
    assert blocks[1].link_text_len == 0
    res = extract_document(f"<p><a href='x'>nav</a></p><div><a>{LONG}</div>"
                           f"<p>{LONG} {LONG}</p>".encode())
    assert LONG in res.main_text  # later blocks survive the unclosed <a>
