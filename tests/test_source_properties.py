"""Property tests for the newest parsers: the WARC record scanner and
the robots.txt parser are total on arbitrary bytes and exact on
generated well-formed inputs."""

from __future__ import annotations

import io

from hypothesis import given, settings
from hypothesis import strategies as st

from document_ai_spark.functions.robots import parse_robots
from document_ai_spark.sources.warc import _parse_warc_stream


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=2048))
def test_warc_stream_total_on_garbage(blob):
    # never raises, never loops forever; every yielded row is 6-tuple
    rows = list(_parse_warc_stream(io.BufferedReader(io.BytesIO(blob)),
                                   "fuzz"))
    for r in rows:
        assert len(r) == 6
        assert isinstance(r[4], bool)


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcdefghij/._-", min_size=1, max_size=30),
            st.binary(max_size=200),
        ),
        min_size=0,
        max_size=8,
    )
)
def test_warc_stream_roundtrips_generated_records(recs):
    blob = b""
    for path, body in recs:
        http = b"HTTP/1.1 200 OK\r\n\r\n" + body
        blob += (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Target-URI: https://h.example/" + path.encode() + b"\r\n"
            b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
            b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
            + http + b"\r\n\r\n"
        )
    rows = list(_parse_warc_stream(io.BufferedReader(io.BytesIO(blob)),
                                   "gen"))
    good = [r for r in rows if r[4]]
    assert len(good) == len(recs)
    for (path, body), r in zip(recs, good):
        assert r[0] == "https://h.example/" + path
        assert r[2] == body


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=1024), st.text(max_size=12))
def test_parse_robots_total(blob, agent):
    rules = parse_robots(blob, agent or "*")
    for allow, prefix in rules:
        assert isinstance(allow, bool) and isinstance(prefix, str)


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(st.booleans(),
                  st.text(alphabet="abc/-_", min_size=1, max_size=15)),
        min_size=0, max_size=10,
    )
)
def test_parse_robots_roundtrips_star_group(rules):
    lines = ["User-agent: *"]
    for allow, prefix in rules:
        lines.append(("Allow: " if allow else "Disallow: ") + prefix)
    got = parse_robots("\n".join(lines).encode(), "*")
    assert got == rules
