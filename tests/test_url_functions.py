"""URL canonicalization column expressions: normalization policy cases,
host / registered-domain extraction, per-host metrics rollup, and the
full datagen -> extract -> host_metrics -> curate chain."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from document_ai_spark.functions.url import (
    host_metrics,
    registered_domain,
    url_host,
    with_url_columns,
)

CASES = [
    # (input, url_norm, host, domain)
    ("https://Example.COM/path/page",
     "https://example.com/path/page", "example.com", "example.com"),
    ("http://example.com:80/a//b///c",
     "http://example.com/a/b/c", "example.com", "example.com"),
    ("https://example.com:443/x?utm_source=tw&q=1#frag",
     "https://example.com/x?q=1", "example.com", "example.com"),
    ("https://example.com/x?gclid=abc123",
     "https://example.com/x", "example.com", "example.com"),
    ("https://example.com/x?a=1&utm_medium=mail&b=2",
     "https://example.com/x?a=1&b=2", "example.com", "example.com"),
    ("https://user:pw@News.BBC.co.uk:443/story",
     "https://news.bbc.co.uk/story", "news.bbc.co.uk", "bbc.co.uk"),
    ("http://sub.deep.example.org/",
     "http://sub.deep.example.org/", "sub.deep.example.org",
     "example.org"),
    ("https://example.com:8443/keepport",
     "https://example.com:8443/keepport", "example.com", "example.com"),
    # '&' is legal inside a path segment: the tracking strip must not
    # swallow the rest of the path or the real query (r3 review finding)
    ("https://example.com/p&utm_source=mail/more?q=1",
     "https://example.com/p&utm_source=mail/more?q=1", "example.com",
     "example.com"),
    ("https://example.com/x?utm_source=a",
     "https://example.com/x", "example.com", "example.com"),
]


def test_url_normalization_policy(spark):
    df = spark.createDataFrame([(c[0],) for c in CASES], ["url"])
    got = with_url_columns(df).select("url", "url_norm", "host",
                                      "domain").collect()
    by_url = {r.url: r for r in got}
    for raw, norm, host, domain in CASES:
        r = by_url[raw]
        assert r.url_norm == norm, (raw, r.url_norm)
        assert r.host == host, (raw, r.host)
        assert r.domain == domain, (raw, r.domain)


def test_url_helpers_are_pure_expressions(spark):
    # whole-stage-codegen'd plan: no Python UDF, no BatchEvalPython
    df = spark.createDataFrame([("https://a.example.com/x",)], ["url"])
    plan = (
        df.select(url_host(F.col("url")), registered_domain(F.col("url")))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_host_metrics_end_to_end(spark, corpus_dir):
    from document_ai_spark.operators.extraction import extract_pages

    pages = spark.read.parquet(os.path.join(corpus_dir, "pages.parquet"))
    extracted = extract_pages(pages, num_partitions=4)
    hm = host_metrics(extracted).collect()
    assert hm
    assert sum(r.docs for r in hm) == 200
    assert all(r.parse_failures <= r.docs for r in hm)
    # domains are registered-domain rollups of real urls, never empty
    assert all(r.domain for r in hm)


def test_registered_domain_psl(spark):
    from document_ai_spark.functions.url import registered_domain_psl

    psl = spark.createDataFrame(
        [("co.uk",), ("com",), ("org",), ("github.io",), ("uk",)],
        ["suffix"],
    )
    rows = [
        ("https://news.bbc.co.uk/story",),     # longest match co.uk
        ("https://a.b.example.com/x",),        # com -> example.com
        ("https://user.github.io/repo",),      # github.io -> user.github.io
        ("https://host.internal/x",),          # no PSL hit -> heuristic
        ("https://example.org/",),             # suffix == whole host - 1
    ]
    df = spark.createDataFrame(rows, ["url"])
    got = {r.url: r.domain
           for r in registered_domain_psl(df, psl).collect()}
    assert got["https://news.bbc.co.uk/story"] == "bbc.co.uk"
    assert got["https://a.b.example.com/x"] == "example.com"
    assert got["https://user.github.io/repo"] == "user.github.io"
    assert got["https://host.internal/x"] == "host.internal"
    assert got["https://example.org/"] == "example.org"


def test_registered_domain_bundled_snapshot(spark):
    """The vendored PSL snapshot is the default: real-crawl hosts the
    12-suffix heuristic misgroups must resolve to true eTLD+1."""
    from document_ai_spark.functions.url import (
        load_psl_suffixes,
        registered_domain_psl,
    )

    suffixes = load_psl_suffixes()
    assert len(suffixes) > 400
    assert {"github.io", "blogspot.co.uk", "com.sg", "co.uk"} <= set(
        suffixes
    )
    rows = [
        ("https://alice.github.io/project/",),
        ("https://cooking.blogspot.co.uk/recipe",),
        ("https://shop.acme.com.sg/catalog",),
        ("https://news.bbc.co.uk/story",),
        ("https://sub.deep.example.org/page",),
    ]
    df = spark.createDataFrame(rows, ["url"])
    got = {r.url: r.domain for r in registered_domain_psl(df).collect()}
    assert got["https://alice.github.io/project/"] == "alice.github.io"
    assert (got["https://cooking.blogspot.co.uk/recipe"]
            == "cooking.blogspot.co.uk")
    assert got["https://shop.acme.com.sg/catalog"] == "acme.com.sg"
    assert got["https://news.bbc.co.uk/story"] == "bbc.co.uk"
    assert got["https://sub.deep.example.org/page"] == "example.org"


def test_registered_domain_psl_wildcard_and_exception(spark):
    """publicsuffix.org algorithm: '*.ck' makes every second-level label
    a public suffix, '!www.ck' carves www.ck back out; wildcard matches
    beat shorter plain rules; exceptions beat everything."""
    from document_ai_spark.functions.url import registered_domain_psl

    psl = spark.createDataFrame(
        [
            ("ck", "rule"), ("ck", "wild"), ("www.ck", "exc"),
            ("bd", "wild"), ("com", "rule"),
        ],
        ["suffix", "kind"],
    )
    rows = [
        ("https://foo.bar.ck/x",),       # bar.ck is a PS -> foo.bar.ck
        ("https://www.ck/x",),           # exception -> ck is PS -> www.ck
        ("https://sub.www.ck/x",),       # tail www.ck exc -> www.ck? no:
                                         # candidate tails include www.ck
                                         # (exc, ps=ck) and *.ck match on
                                         # sub.www.ck... longest non-exc
                                         # wins unless exc matched: exc
                                         # matched -> ps=ck -> www.ck
        ("https://shop.example.com.bd/x",),  # *.bd -> com.bd PS
        ("https://a.example.com/x",),
    ]
    df = spark.createDataFrame(rows, ["url"])
    got = {r.url: r.domain
           for r in registered_domain_psl(df, psl).collect()}
    assert got["https://foo.bar.ck/x"] == "foo.bar.ck"
    assert got["https://www.ck/x"] == "www.ck"
    assert got["https://sub.www.ck/x"] == "www.ck"
    assert got["https://shop.example.com.bd/x"] == "example.com.bd"
    assert got["https://a.example.com/x"] == "example.com"


def test_bundled_snapshot_wildcards(spark):
    from document_ai_spark.functions.url import (
        load_psl_rules,
        registered_domain_psl,
    )

    kinds = {(s, k) for s, k in load_psl_rules()}
    assert ("ck", "wild") in kinds and ("www.ck", "exc") in kinds
    assert ("bd", "wild") in kinds
    df = spark.createDataFrame(
        [("https://news.dhaka.gov.bd/story",), ("https://www.ck/",)],
        ["url"],
    )
    got = {r.url: r.domain for r in registered_domain_psl(df).collect()}
    assert got["https://news.dhaka.gov.bd/story"] == "dhaka.gov.bd"
    assert got["https://www.ck/"] == "www.ck"


def test_host_metrics_groups_by_true_etld1(spark):
    from document_ai_spark.functions.url import host_metrics

    rows = [
        ("https://a.github.io/x", 10, True),
        ("https://a.github.io/y", 20, True),
        ("https://b.github.io/z", 30, False),
        ("https://www.acme.com.sg/p", 40, True),
        ("https://cdn.acme.com.sg/q", 50, True),
    ]
    df = spark.createDataFrame(
        rows, "url string, html_bytes long, parse_ok boolean"
    )
    got = {r.domain: r for r in host_metrics(df).collect()}
    # two different github.io users are DIFFERENT registered domains;
    # two hosts of one com.sg site are ONE
    assert set(got) == {"a.github.io", "b.github.io", "acme.com.sg"}
    assert got["a.github.io"].docs == 2
    assert got["b.github.io"].parse_failures == 1
    assert got["acme.com.sg"].docs == 2
    assert got["acme.com.sg"].bytes == 90
