"""robots.txt evaluation: which pages may a polite pipeline keep.

`parse_robots` implements the Robots Exclusion Protocol (RFC 9309):
User-agent groups with the most specific matching agent winning (an
exact agent token beats `*`; multiple agent lines share one group; ALL
groups naming the winning agent merge — RFC 9309 §2.2.1 says rules from
groups with the same matched agent are combined), Allow/Disallow path
rules with `*` (any run of characters) and trailing `$` (end anchor)
wildcards per §2.2.3, longest-pattern-wins at query time with Allow
winning length ties, empty Disallow meaning allow-all.

The Spark side is join-shaped for crawl scale: robots files parse once
per HOST into a (host, allow, prefix, prefix_len, regex, has_wild)
rules table (one small python parse per host — robots files are KBs),
pages join rules on host with the path-match in the join condition,
and `max_by(struct(prefix_len, allow))` realizes longest-match-wins per
url. Literal rules (no wildcard — the overwhelming majority in real
files) match via `startsWith`; only wildcard rules pay the per-row
regex. Hosts without rules (or without a robots file) default to
allowed.

`robots_allowed(rules, path)` is the straight-line single-URL evaluator
— the reference implementation the distributed gate is property-tested
against (tests/test_robots_properties.py).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

RULES_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("allow", T.BooleanType()),
        T.StructField("prefix", T.StringType()),
        T.StructField("prefix_len", T.IntegerType()),
        T.StructField("regex", T.StringType()),
        T.StructField("has_wild", T.BooleanType()),
    ]
)

# regex metacharacters escaped in pattern translation — '*' and a
# trailing '$' are the robots wildcards; everything else is literal.
# The escape set is Java-and-Python safe (RLIKE runs Java regex).
_RE_SPECIAL = set("\\.^$+?()[]{}|")


def pattern_regex(pattern: str) -> str:
    """Robots path pattern -> anchored regex, identical semantics in
    Python `re` and Java (Spark RLIKE): '*' -> '.*', trailing '$' ->
    end anchor, all else literal."""
    end_anchor = pattern.endswith("$")
    core = pattern[:-1] if end_anchor else pattern
    out = ["^"]
    for ch in core:
        if ch == "*":
            out.append(".*")
        elif ch in _RE_SPECIAL:
            out.append("\\" + ch)
        else:
            out.append(ch)
    if end_anchor:
        out.append("$")
    return "".join(out)


def _parse_groups(content: bytes | str):
    """One-pass group parser: -> (groups, sitemaps) where each group is
    (agents, rules, crawl_delays) and sitemaps are file-global (the de
    facto standard — Sitemap lines live outside groups). Total:
    undecodable/garbage lines are skipped."""
    if isinstance(content, bytes):
        text = content.decode("utf-8", "replace")
    else:
        text = content
    groups: list[tuple[list[str], list[tuple[bool, str]], list[float]]] = []
    sitemaps: list[str] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    cur_delays: list[float] = []
    agents_open = False  # consecutive User-agent lines share a group
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "sitemap":
            if value:
                sitemaps.append(value)
            continue
        if field == "user-agent":
            if not agents_open:
                if cur_agents:
                    groups.append((cur_agents, cur_rules, cur_delays))
                cur_agents = []
                cur_rules = []
                cur_delays = []
                agents_open = True
            cur_agents.append(value.lower())
        elif field in ("allow", "disallow"):
            agents_open = False
            if field == "disallow" and value == "":
                continue  # empty Disallow = allow all (no rule)
            if value:
                cur_rules.append((field == "allow", value))
        elif field == "crawl-delay":
            agents_open = False
            try:
                d = float(value)
            except ValueError:
                continue
            if d >= 0:
                cur_delays.append(d)
    if cur_agents:
        groups.append((cur_agents, cur_rules, cur_delays))
    return groups, sitemaps


def _matching_groups(groups, user_agent: str):
    """Groups for the most specific matching agent: exact token beats
    '*'; ALL groups naming that agent merge (taking only the first group
    kept later groups' Disallows silently allowed — the r3 advice
    finding)."""
    ua = user_agent.lower()
    if any(ua in agents for agents, _, _ in groups):
        return [g for g in groups if ua in g[0]]
    return [g for g in groups if "*" in g[0]]


def parse_robots(content: bytes | str, user_agent: str = "*"
                 ) -> list[tuple[bool, str]]:
    """robots.txt bytes -> [(allow, path_pattern)] for `user_agent`.
    Rules from EVERY group naming the winning agent are merged."""
    groups, _ = _parse_groups(content)
    return [r for _, rules, _ in _matching_groups(groups, user_agent)
            for r in rules]


def parse_robots_directives(content: bytes | str, user_agent: str = "*"
                            ) -> tuple[float | None, list[str]]:
    """(crawl_delay, sitemaps) for `user_agent`: the crawl delay is the
    MAXIMUM across the winning agent's merged groups (the conservative
    politeness choice when a file states several); sitemaps are
    file-global."""
    groups, sitemaps = _parse_groups(content)
    delays = [d for _, _, ds in _matching_groups(groups, user_agent)
              for d in ds]
    return (max(delays) if delays else None), sitemaps


def robots_allowed(rules: list[tuple[bool, str]], path: str) -> bool:
    """Straight-line RFC 9309 decision for one path: among matching
    rules the longest pattern wins, Allow wins length ties, no match ->
    allowed."""
    best: tuple[int, int] | None = None
    verdict = True
    for allow, pattern in rules:
        if re.match(pattern_regex(pattern), path):
            key = (len(pattern), int(allow))
            if best is None or key > best:
                best = key
                verdict = allow
    return verdict


def robots_rules(robots: DataFrame, user_agent: str = "*",
                 host_col: str = "host",
                 content_col: str = "robots_txt") -> DataFrame:
    """robots(host, robots_txt BINARY) -> RULES_SCHEMA rows."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hosts, allows, patterns, lens, regexes, wilds = (
                [], [], [], [], [], []
            )
            for host, content in zip(pdf[host_col], pdf[content_col]):
                try:
                    rules = parse_robots(content or b"", user_agent)
                except Exception:
                    rules = []
                for allow, pattern in rules:
                    hosts.append(host)
                    allows.append(allow)
                    patterns.append(pattern)
                    lens.append(len(pattern))
                    regexes.append(pattern_regex(pattern))
                    wilds.append("*" in pattern or pattern.endswith("$"))
            # explicit dtypes: an empty partition's DataFrame otherwise
            # defaults every column to float64, which Arrow cannot convert
            # to the string/bool schema
            yield pd.DataFrame(
                {
                    "host": pd.Series(hosts, dtype="object"),
                    "allow": pd.Series(allows, dtype="bool"),
                    "prefix": pd.Series(patterns, dtype="object"),
                    "prefix_len": pd.Series(lens, dtype="int32"),
                    "regex": pd.Series(regexes, dtype="object"),
                    "has_wild": pd.Series(wilds, dtype="bool"),
                }
            )

    return robots.select(host_col, content_col).mapInPandas(
        gen, schema=RULES_SCHEMA
    )


DIRECTIVES_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("crawl_delay", T.DoubleType()),
        T.StructField("sitemap", T.StringType()),
    ]
)


def robots_directives(robots: DataFrame, user_agent: str = "*",
                      host_col: str = "host",
                      content_col: str = "robots_txt") -> DataFrame:
    """Per-host politeness metadata: (host, crawl_delay, sitemap) — one
    row per sitemap URL (sitemap NULL when the file declares none, so
    every host with a parseable crawl delay still gets a row). The
    crawl-delay column feeds a fetch scheduler's per-host rate limit;
    same one-parse-per-host shape as robots_rules."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hosts, delays, maps = [], [], []
            for host, content in zip(pdf[host_col], pdf[content_col]):
                try:
                    delay, sitemaps = parse_robots_directives(
                        content or b"", user_agent
                    )
                except Exception:
                    delay, sitemaps = None, []
                for sm in sitemaps or [None]:
                    hosts.append(host)
                    delays.append(delay)
                    maps.append(sm)
            yield pd.DataFrame(
                {
                    "host": pd.Series(hosts, dtype="object"),
                    "crawl_delay": pd.Series(delays, dtype="float64"),
                    "sitemap": pd.Series(maps, dtype="object"),
                }
            )

    return robots.select(host_col, content_col).mapInPandas(
        gen, schema=DIRECTIVES_SCHEMA
    )


def allowed_pages(pages: DataFrame, robots: DataFrame,
                  user_agent: str = "*") -> DataFrame:
    """Filter `pages` to urls robots.txt permits. `robots` is
    (host, robots_txt). Longest-pattern-wins; Allow wins length ties;
    no matching rule (or no robots file for the host) -> allowed."""
    from .url import url_host

    rules = robots_rules(robots, user_agent)
    urls = pages.select("url").distinct().withColumn(
        "_host", url_host(F.col("url"))
    ).withColumn(
        "_path",
        F.coalesce(
            F.nullif(
                F.regexp_extract(
                    F.col("url"), r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/]*(/.*)$",
                    1,
                ),
                F.lit(""),
            ),
            F.lit("/"),
        ),
    )
    # LEFT join keyed on host WITH the path-match in the condition:
    # a url whose host has rules but none matching its path keeps its
    # null-rule row (default allowed) instead of disappearing. Literal
    # rules match via startsWith (codegen-cheap); wildcard rules via the
    # translated anchored regex.
    matches = F.when(
        F.col("has_wild"), F.rlike(F.col("_path"), F.col("regex"))
    ).otherwise(F.col("_path").startswith(F.col("prefix")))
    cond = (urls["_host"] == rules["host"]) & matches
    decision = (
        urls.join(rules, cond, "left")
        .groupBy("url")
        .agg(
            F.max_by(
                F.coalesce(F.col("allow"), F.lit(True)),
                # longest pattern wins; allow=true wins length ties (RFC)
                F.struct(
                    F.coalesce(F.col("prefix_len"), F.lit(-1)),
                    F.coalesce(F.col("allow").cast("int"), F.lit(1)),
                ),
            ).alias("_allowed")
        )
    )
    return pages.join(
        decision.filter(F.col("_allowed")).select("url"), "url", "left_semi"
    )
