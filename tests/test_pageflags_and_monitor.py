"""Page-policy flags (robots noindex/nofollow, canonical) and the
streaming windowed extraction monitor."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq

from document_ai_spark.operators.pageflags import (
    indexable_pages,
    page_flags,
    scan_page_flags,
)


# ---------- scanner unit tests ----------

def test_scan_robots_variants():
    cases = [
        (b'<meta name="robots" content="noindex,nofollow">', True, True),
        (b"<META NAME='ROBOTS' CONTENT='NOINDEX'>", True, False),
        (b'<meta content="nofollow" name="robots">', False, True),
        (b'<meta name="robots" content="none">', True, True),
        (b'<meta name="robots" content="index, follow">', False, False),
        (b'<meta name="viewport" content="noindex">', False, False),
        (b"", False, False),
        (b"%PDF-1.4 whatever", False, False),
    ]
    for head, ni, nf in cases:
        page = b"<html><head>" + head + b"</head><body>x</body></html>"
        got = scan_page_flags(page)
        assert got[:2] == (ni, nf), (head, got)


def test_scan_canonical_variants():
    page = (b'<html><head><link rel="canonical" '
            b'href="https://example.com/canon"></head>')
    assert scan_page_flags(page)[2] == "https://example.com/canon"
    page2 = b"<link href='/x' rel='CANONICAL'><link rel=canonical href=/y>"
    assert scan_page_flags(page2)[2] == "/x"  # first match wins
    assert scan_page_flags(b"<html>no links")[2] == ""


def test_scan_only_prescan_window():
    # a robots meta buried past the prescan window is NOT honored
    filler = b"<p>" + b"x" * 9000 + b"</p>"
    page = b"<html>" + filler + b'<meta name="robots" content="noindex">'
    assert scan_page_flags(page)[0] is False


# ---------- Spark stage ----------

def test_page_flags_and_indexable_filter(spark):
    rows = [
        ("u/ok", b"<html><head><title>t</title></head><body>fine</body>"),
        ("u/blocked",
         b'<html><head><meta name="robots" content="noindex"></head>'),
        ("u/canon",
         b'<html><head><link rel="canonical" href="https://c/x"></head>'),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    got = {r.url: r for r in page_flags(pages).collect()}
    assert not got["u/ok"].noindex
    assert got["u/blocked"].noindex
    assert got["u/canon"].canonical_url == "https://c/x"
    kept = {r.url for r in indexable_pages(pages).collect()}
    assert kept == {"u/ok", "u/canon"}


# ---------- streaming monitor ----------

def test_stream_extraction_metrics_windows(spark, tmp_path):
    from document_ai_spark.streaming.monitor import (
        stream_extraction_metrics,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    t0 = dt.datetime(2026, 1, 1, 10, 0, 0)

    def write(name, rows, mtime):
        path = os.path.join(src, name)
        pq.write_table(
            pa.table(
                {
                    "warc_ts": pa.array(
                        [r[0] for r in rows], pa.timestamp("us")
                    ),
                    "html_bytes": pa.array(
                        [r[1] for r in rows], pa.int64()
                    ),
                    "parse_ok": pa.array([r[2] for r in rows], pa.bool_()),
                }
            ),
            path,
        )
        os.utime(path, (mtime, mtime))

    m = dt.timedelta(minutes=1)
    # window 10:00-10:05: 3 docs, one failure
    write("b1.parquet", [
        (t0, 100, True), (t0 + m, 200, False), (t0 + 2 * m, 300, True),
    ], 1_700_000_000)
    # a much later doc advances the watermark past the first window
    write("b2.parquet", [(t0 + dt.timedelta(minutes=30), 50, True)],
          1_700_000_100)

    stream = (
        spark.readStream.schema(
            "warc_ts timestamp, html_bytes long, parse_ok boolean"
        )
        .format("parquet").option("maxFilesPerTrigger", "1").load(src)
    )
    q = (
        stream_extraction_metrics(stream)
        .writeStream.format("memory").queryName("mon_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.table("mon_out").collect()
    assert len(rows) == 1  # only the finalized window emits
    r = rows[0]
    assert r.window_start == t0
    assert (r.docs, r.bytes, r.parse_failures) == (3, 600, 1)


def test_canonical_dedup(spark):
    import datetime as dt

    from document_ai_spark.operators.pageflags import canonical_dedup

    t0 = dt.datetime(2026, 1, 1, 10, 0, 0)
    m = dt.timedelta(minutes=1)
    canon = (b'<html><head><link rel="canonical" '
             b'href="https://Example.com/story?utm_source=x"></head>ok')
    rows = [
        # three mirrors of the same canonical target -> keep earliest
        ("https://m1.example.com/a", t0 + m, canon),
        ("https://m2.example.com/b", t0, canon),
        ("https://m3.example.com/c", t0 + 2 * m, canon),
        # no canonical -> keyed by own normalized url
        ("https://other.example.com/solo", t0, b"<html>solo"),
        # relative canonical is ignored (key falls back to own url)
        ("https://rel.example.com/r", t0,
         b'<html><head><link rel="canonical" href="/r2"></head>'),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary"
    )
    kept = {r.url for r in canonical_dedup(pages).collect()}
    assert kept == {
        "https://m2.example.com/b",        # earliest mirror wins
        "https://other.example.com/solo",
        "https://rel.example.com/r",
    }


def test_cli_extract_respect_noindex(spark, tmp_path, capsys):
    """extract --respect-noindex drops noindex pages before the kernel."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from document_ai_spark.__main__ import main

    body = (b"<html><body><p>alpha beta gamma delta epsilon zeta eta "
            b"theta iota kappa lambda mu</p></body></html>")
    blocked = (b'<html><head><meta name="robots" content="noindex">'
               b"</head><body><p>secret words here</p></body></html>")
    t0 = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
    rows = [(f"https://s.example/{i}", t0, body) for i in range(8)]
    rows += [(f"https://s.example/blocked/{i}", t0, blocked)
             for i in range(4)]
    src = str(tmp_path / "pages.parquet")
    pq.write_table(
        pa.table({
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([r[1] for r in rows],
                                pa.timestamp("us", tz="UTC")),
            "html": pa.array([r[2] for r in rows], pa.binary()),
            "text": pa.array([""] * len(rows)),
            "lang": pa.array(["en"] * len(rows)),
        }),
        src,
    )
    out = str(tmp_path / "ex")
    rc = main([
        "extract", "--input", src, "--output", out,
        "--n-shards", "2", "--shards-per-commit", "2",
        "--respect-noindex",
    ])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert res["docs_total"] == 8  # the 4 noindex pages never extracted
