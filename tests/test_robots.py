"""robots.txt parsing and the join-shaped allowed-pages gate."""

from __future__ import annotations

from document_ai_spark.functions.robots import (
    allowed_pages,
    parse_robots,
    robots_rules,
)

ROBOTS = b"""
# comment line
User-agent: specialbot
Disallow: /

User-agent: *
Disallow: /private/
Disallow: /tmp
Allow: /private/pub/
"""


def test_parse_robots_star_group():
    rules = parse_robots(ROBOTS, "*")
    assert (False, "/private/") in rules
    assert (False, "/tmp") in rules
    assert (True, "/private/pub/") in rules


def test_parse_robots_specific_agent_wins():
    assert parse_robots(ROBOTS, "specialbot") == [(False, "/")]
    # unknown agent falls back to the * group
    assert (False, "/private/") in parse_robots(ROBOTS, "otherbot")


def test_parse_robots_edge_cases():
    assert parse_robots(b"") == []
    assert parse_robots(b"\xff\xfe garbage bytes") == []
    # empty Disallow = allow all (no rule emitted)
    assert parse_robots(b"User-agent: *\nDisallow:") == []
    # consecutive User-agent lines share one group
    r = parse_robots(b"User-agent: a\nUser-agent: b\nDisallow: /x", "b")
    assert r == [(False, "/x")]


def test_allowed_pages_longest_match(spark):
    robots = spark.createDataFrame(
        [("site.example", ROBOTS), ("open.example", b"")],
        "host string, robots_txt binary",
    )
    pages = spark.createDataFrame(
        [
            ("https://site.example/ok/page",),            # no rule -> allow
            ("https://site.example/private/secret",),     # disallow
            ("https://site.example/private/pub/x",),      # allow overrides
            ("https://site.example/tmpfile",),            # prefix match
            ("https://open.example/anything",),           # empty robots
            ("https://norobots.example/page",),           # host w/o robots
        ],
        ["url"],
    )
    kept = {r.url for r in allowed_pages(pages, robots).collect()}
    assert kept == {
        "https://site.example/ok/page",
        "https://site.example/private/pub/x",
        "https://open.example/anything",
        "https://norobots.example/page",
    }


def test_allowed_pages_specific_agent(spark):
    robots = spark.createDataFrame(
        [("site.example", ROBOTS)], "host string, robots_txt binary"
    )
    pages = spark.createDataFrame(
        [("https://site.example/anything",)], ["url"]
    )
    assert allowed_pages(pages, robots, "specialbot").count() == 0
    assert allowed_pages(pages, robots, "*").count() == 1


def test_robots_rules_frame(spark):
    robots = spark.createDataFrame(
        [("site.example", ROBOTS)], "host string, robots_txt binary"
    )
    rows = robots_rules(robots).collect()
    assert {(r.allow, r.prefix) for r in rows} == {
        (False, "/private/"), (False, "/tmp"), (True, "/private/pub/"),
    }
    assert all(r.prefix_len == len(r.prefix) for r in rows)
