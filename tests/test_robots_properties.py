"""RFC 9309 wildcard matching + group merging: the regex translation and
the full per-path decision are property-tested against straight-line
reference evaluators, and the distributed gate must agree with the
single-URL evaluator on a seeded random site."""

from __future__ import annotations

import random
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from document_ai_spark.functions.robots import (
    allowed_pages,
    parse_robots,
    pattern_regex,
    robots_allowed,
)


def ref_match(pattern: str, path: str) -> bool:
    """Backtracking reference for robots pattern semantics: match from
    the start of path; '*' matches any run; trailing '$' anchors the
    end; a non-trailing '$' is literal."""
    end_anchor = pattern.endswith("$")
    core = pattern[:-1] if end_anchor else pattern

    def m(p: str, s: str) -> bool:
        if p == "":
            return s == "" if end_anchor else True
        if p[0] == "*":
            return any(m(p[1:], s[i:]) for i in range(len(s) + 1))
        return s != "" and s[0] == p[0] and m(p[1:], s[1:])

    return m(core, path)


_PAT = st.text(alphabet="ab/.*$+(", min_size=1, max_size=8)
_PATH = st.text(alphabet="ab/.$+(", max_size=10)


@settings(max_examples=500, deadline=None)
@given(_PAT, _PATH)
def test_pattern_regex_matches_reference(pattern, path):
    got = bool(re.match(pattern_regex(pattern), path))
    assert got == ref_match(pattern, path), (pattern, path)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.tuples(st.booleans(), _PAT), max_size=6),
    _PATH,
)
def test_robots_allowed_longest_match(rules, path):
    got = robots_allowed(rules, path)
    # brute-force twin: enumerate matches, rank by (len, allow)
    matches = [
        (len(p), int(a), a) for a, p in rules if ref_match(p, path)
    ]
    expect = max(matches)[2] if matches else True
    assert got == expect, (rules, path)


def test_parse_robots_merges_same_agent_groups():
    # the r3 advice repro: two '*' groups must BOTH contribute rules
    txt = b"User-agent: *\nDisallow: /a\n\nUser-agent: *\nDisallow: /b"
    assert sorted(parse_robots(txt)) == [(False, "/a"), (False, "/b")]
    # exact-agent groups merge too, and still beat '*'
    txt2 = (b"User-agent: x\nDisallow: /1\n"
            b"User-agent: *\nDisallow: /z\n"
            b"User-agent: x\nAllow: /2\n")
    assert sorted(parse_robots(txt2, "x")) == [(False, "/1"), (True, "/2")]
    assert parse_robots(txt2, "other") == [(False, "/z")]


def test_crawl_delay_and_sitemaps():
    from document_ai_spark.functions.robots import parse_robots_directives

    txt = (b"Sitemap: https://s.example/a.xml\n"
           b"User-agent: fastbot\nCrawl-delay: 1\nDisallow: /x\n\n"
           b"User-agent: *\nCrawl-delay: 5\n\n"
           b"User-agent: *\nCrawl-delay: 2.5\n"
           b"Sitemap: https://s.example/b.xml\n")
    delay, maps = parse_robots_directives(txt)
    assert delay == 5.0  # max across merged '*' groups (conservative)
    assert maps == ["https://s.example/a.xml", "https://s.example/b.xml"]
    assert parse_robots_directives(txt, "fastbot")[0] == 1.0
    assert parse_robots_directives(b"User-agent: *\nCrawl-delay: nope\n") \
        == (None, [])
    assert parse_robots_directives(b"\xff garbage") == (None, [])


def test_robots_directives_frame(spark):
    from document_ai_spark.functions.robots import robots_directives

    robots = spark.createDataFrame(
        [
            ("a.example",
             b"User-agent: *\nCrawl-delay: 3\n"
             b"Sitemap: https://a.example/s1.xml\n"
             b"Sitemap: https://a.example/s2.xml\n"),
            ("b.example", b"User-agent: *\nCrawl-delay: 7\n"),
            ("c.example", b""),
        ],
        "host string, robots_txt binary",
    )
    rows = robots_directives(robots).collect()
    by_host: dict[str, list] = {}
    for r in rows:
        by_host.setdefault(r.host, []).append(r)
    assert {r.sitemap for r in by_host["a.example"]} == {
        "https://a.example/s1.xml", "https://a.example/s2.xml"
    }
    assert all(r.crawl_delay == 3.0 for r in by_host["a.example"])
    assert [(r.crawl_delay, r.sitemap) for r in by_host["b.example"]] == [
        (7.0, None)
    ]
    (c,) = by_host["c.example"]
    assert c.crawl_delay is None
    assert c.sitemap is None


def test_allowed_pages_wildcards(spark):
    robots = spark.createDataFrame(
        [(
            "s.example",
            b"User-agent: *\n"
            b"Disallow: /*?sessionid=\n"
            b"Disallow: /*.pdf$\n"
            b"Allow: /pub*.pdf$\n"
            b"Disallow: /tmp\n",
        )],
        "host string, robots_txt binary",
    )
    pages = spark.createDataFrame(
        [
            ("https://s.example/a/b?sessionid=42",),   # wildcard disallow
            ("https://s.example/doc.pdf",),            # $-anchored disallow
            ("https://s.example/doc.pdf.html",),       # $ => NOT matched
            ("https://s.example/pub1.pdf",),           # longer allow wins
            ("https://s.example/tmpfile",),            # literal prefix
            ("https://s.example/fine",),
        ],
        ["url"],
    )
    kept = {r.url for r in allowed_pages(pages, robots).collect()}
    assert kept == {
        "https://s.example/doc.pdf.html",
        "https://s.example/pub1.pdf",
        "https://s.example/fine",
    }


def test_allowed_pages_agrees_with_reference_evaluator(spark):
    """Seeded random site: the distributed join/max_by gate must equal
    robots_allowed on every path."""
    rng = random.Random(7)
    alphabet = "ab/"
    rules = []
    for _ in range(12):
        pat = "/" + "".join(
            rng.choice(alphabet + "*") for _ in range(rng.randint(1, 5))
        )
        if rng.random() < 0.3:
            pat += "$"
        rules.append((rng.random() < 0.4, pat))
    txt = "User-agent: *\n" + "\n".join(
        ("Allow: " if a else "Disallow: ") + p for a, p in rules
    )
    robots = spark.createDataFrame(
        [("r.example", txt.encode())], "host string, robots_txt binary"
    )
    paths = ["/"] + [
        "/" + "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
        for _ in range(60)
    ]
    pages = spark.createDataFrame(
        [(f"https://r.example{p}",) for p in paths], ["url"]
    )
    kept = {r.url for r in allowed_pages(pages, robots).collect()}
    parsed = parse_robots(txt.encode())
    for p in paths:
        expect = robots_allowed(parsed, p)
        assert (f"https://r.example{p}" in kept) == expect, (p, parsed)
