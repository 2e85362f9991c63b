"""robots.txt evaluation: which pages may a polite pipeline keep.

`parse_robots` implements the core Robots Exclusion Protocol (RFC 9309):
User-agent groups (most specific matching group wins: an exact agent
token beats `*`; multiple agent lines share one group), Allow/Disallow
path-prefix rules, longest-match-wins at query time with Allow winning
length ties, empty Disallow meaning allow-all. Wildcard (`*`, `$`) path
patterns are not modeled (documented; prefix rules dominate real files).

The Spark side is join-shaped for crawl scale: robots files parse once
per HOST into a (host, allow, prefix, prefix_len) rules table (one small
python parse per host — robots files are KBs), pages join rules on host,
prefix matches filter, and `max_by(struct(prefix_len, allow))` realizes
longest-match-wins per url. Hosts without rules (or without a robots
file) default to allowed.
"""

from __future__ import annotations

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
    ]
)


def parse_robots(content: bytes | str, user_agent: str = "*"
                 ) -> list[tuple[bool, str]]:
    """robots.txt bytes -> [(allow, path_prefix)] for `user_agent`.
    Total: undecodable/garbage lines are skipped."""
    if isinstance(content, bytes):
        text = content.decode("utf-8", "replace")
    else:
        text = content
    ua = user_agent.lower()
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    agents_open = False  # consecutive User-agent lines share a group
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not agents_open:
                if cur_agents:
                    groups.append((cur_agents, cur_rules))
                cur_agents = []
                cur_rules = []
                agents_open = True
            cur_agents.append(value.lower())
        elif field in ("allow", "disallow"):
            agents_open = False
            if field == "disallow" and value == "":
                continue  # empty Disallow = allow all (no rule)
            if value:
                cur_rules.append((field == "allow", value))
    if cur_agents:
        groups.append((cur_agents, cur_rules))
    # most specific matching group: exact agent token beats '*'
    exact = [r for agents, r in groups if ua in agents]
    if exact:
        return exact[0]
    star = [r for agents, r in groups if "*" in agents]
    return star[0] if star else []


def robots_rules(robots: DataFrame, user_agent: str = "*",
                 host_col: str = "host",
                 content_col: str = "robots_txt") -> DataFrame:
    """robots(host, robots_txt BINARY) -> RULES_SCHEMA rows."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hosts, allows, prefixes, lens = [], [], [], []
            for host, content in zip(pdf[host_col], pdf[content_col]):
                try:
                    rules = parse_robots(content or b"", user_agent)
                except Exception:
                    rules = []
                for allow, prefix in rules:
                    hosts.append(host)
                    allows.append(allow)
                    prefixes.append(prefix)
                    lens.append(len(prefix))
            # explicit dtypes: an empty partition's DataFrame otherwise
            # defaults every column to float64, which Arrow cannot convert
            # to the string/bool schema
            yield pd.DataFrame(
                {
                    "host": pd.Series(hosts, dtype="object"),
                    "allow": pd.Series(allows, dtype="bool"),
                    "prefix": pd.Series(prefixes, dtype="object"),
                    "prefix_len": pd.Series(lens, dtype="int32"),
                }
            )

    return robots.select(host_col, content_col).mapInPandas(
        gen, schema=RULES_SCHEMA
    )


def allowed_pages(pages: DataFrame, robots: DataFrame,
                  user_agent: str = "*") -> DataFrame:
    """Filter `pages` to urls robots.txt permits. `robots` is
    (host, robots_txt). Longest-match-wins; Allow wins length ties;
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
    # LEFT join keyed on host WITH the prefix-match in the condition:
    # a url whose host has rules but none matching its path keeps its
    # null-rule row (default allowed) instead of disappearing
    cond = (urls["_host"] == rules["host"]) & F.col("_path").startswith(
        F.col("prefix")
    )
    decision = (
        urls.join(rules, cond, "left")
        .groupBy("url")
        .agg(
            F.max_by(
                F.coalesce(F.col("allow"), F.lit(True)),
                # longest match wins; allow=true wins length ties (RFC)
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
