"""Property-based robustness: the kernel is TOTAL and DETERMINISTIC over
arbitrary bytes (the reference's safe-mode posture,
/root/reference/performances.py:282-294, taken to its limit)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from document_ai_spark.kernel.extract import extract_document

_html_ish = st.one_of(
    st.binary(max_size=2000),
    st.text(
        alphabet=st.sampled_from(
            list("<>/&;=\"' abcdefghijklnoprstu\n\t%()\\")
        ),
        max_size=2000,
    ).map(lambda s: s.encode("utf-8", errors="ignore")),
    st.builds(
        lambda parts: b"%PDF-" + b"".join(parts),
        st.lists(st.binary(max_size=200), max_size=10),
    ),
)


@settings(max_examples=400, deadline=None)
@given(_html_ish)
def test_extract_total_and_consistent(raw: bytes):
    res = extract_document(raw)
    # never raises (total), and the result is internally consistent
    assert isinstance(res.main_text, str)
    last_end = None
    for s in res.spans:
        assert 0 <= s.start <= s.end <= len(res.main_text)
        if last_end is not None:
            assert s.start >= last_end  # spans are ordered, non-overlapping
        last_end = s.end
    if not res.parse_ok:
        assert res.err


@settings(max_examples=150, deadline=None)
@given(_html_ish)
def test_extract_deterministic(raw: bytes):
    a = extract_document(raw)
    b = extract_document(raw)
    assert a.main_text == b.main_text
    assert [(s.start, s.end, s.kind) for s in a.spans] == [
        (s.start, s.end, s.kind) for s in b.spans
    ]
    assert (a.parse_ok, a.err, a.charset) == (b.parse_ok, b.err, b.charset)
