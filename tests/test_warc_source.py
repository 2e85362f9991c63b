"""WARC source: synthesize real WARC / WARC.gz archives from datagen
pages, read them back distributed, and prove the byte-identical
extraction invariant survives the format round trip."""

from __future__ import annotations

import gzip
import os

import pytest
from pyspark.sql import functions as F

from document_ai_spark.sources.warc import read_warc, warc_pages


def _warc_record(url: str, ts: str, body: bytes,
                 warc_type: bytes = b"response") -> bytes:
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body)
    headers = (
        b"WARC/1.0\r\n"
        b"WARC-Type: " + warc_type + b"\r\n"
        b"WARC-Target-URI: " + url.encode() + b"\r\n"
        b"WARC-Date: " + ts.encode() + b"\r\n"
        b"Content-Length: " + str(len(http)).encode() + b"\r\n"
        b"\r\n"
    )
    return headers + http + b"\r\n\r\n"


def _write_warcs(tmp_path, pages, gz: bool):
    """pages: list of (url, ts_iso, html). Two files, split half/half,
    with a request record and a malformed record interleaved."""
    paths = []
    half = len(pages) // 2
    for i, chunk in enumerate((pages[:half], pages[half:])):
        blob = b""
        blob += _warc_record("https://meta.example/req", chunk[0][1],
                             b"GET / HTTP/1.1", warc_type=b"request")
        for url, ts, body in chunk:
            blob += _warc_record(url, ts, body)
        if i == 0:
            # malformed record: bad content-length
            blob += (b"WARC/1.0\r\nWARC-Type: response\r\n"
                     b"Content-Length: notanumber\r\n\r\n")
            blob += _warc_record(*chunk[-1])  # parser must resync after
        name = f"part{i}.warc" + (".gz" if gz else "")
        p = str(tmp_path / name)
        data = blob
        if gz:
            # per-record gzip members is the CC layout; whole-file gzip
            # must also work (GzipFile reads members sequentially)
            data = gzip.compress(blob)
        with open(p, "wb") as f:
            f.write(data)
        paths.append(p)
    return paths


@pytest.mark.parametrize("gz", [False, True])
def test_warc_roundtrip_and_goldens(spark, corpus_dir, tmp_path, gz):
    src = spark.read.parquet(os.path.join(corpus_dir, "pages.parquet"))
    sample = src.orderBy("url").limit(40).collect()
    pages = [
        (r.url, r.warc_ts.strftime("%Y-%m-%dT%H:%M:%SZ"), bytes(r.html))
        for r in sample
    ]
    paths = _write_warcs(tmp_path, pages, gz)

    raw = read_warc(spark, paths)
    bad = raw.filter("NOT record_ok").collect()
    assert len(bad) == 1 and bad[0].err == "bad_content_length"

    got = warc_pages(spark, paths)
    assert got.count() == 41  # 40 pages + the resync duplicate
    # html bytes survive the WARC round trip exactly
    orig = {r.url: bytes(r.html) for r in sample}
    for r in got.collect():
        assert bytes(r.html) == orig[r.url], r.url

    # the full invariant: extract the WARC-sourced pages, byte-identical
    from document_ai_spark.operators.extraction import extract_pages

    ex = extract_pages(got.dropDuplicates(["url"]), salted=False)
    golden = spark.read.parquet(
        os.path.join(corpus_dir, "golden_text.parquet")
    )
    j = ex.join(golden, "url")
    n = j.count()
    assert n > 0
    mism = j.filter(
        F.col("expected_text").isNotNull()
        & (F.col("main_text") != F.col("expected_text"))
    ).count()
    assert mism == 0


def test_warc_missing_file_error_row(spark, tmp_path):
    rows = read_warc(spark, [str(tmp_path / "nope.warc")]).collect()
    assert len(rows) == 1
    assert not rows[0].record_ok
    assert rows[0].err.startswith("warc_open_failed:")


def test_cli_extract_from_warc(spark, corpus_dir, tmp_path, capsys):
    import json

    from document_ai_spark.__main__ import main

    src = spark.read.parquet(os.path.join(corpus_dir, "pages.parquet"))
    sample = src.orderBy("url").limit(20).collect()
    pages = [
        (r.url, r.warc_ts.strftime("%Y-%m-%dT%H:%M:%SZ"), bytes(r.html))
        for r in sample
    ]
    paths = _write_warcs(tmp_path, pages, gz=True)
    out = str(tmp_path / "extracted")
    rc = main([
        "extract", "--input", ",".join(paths), "--input-format", "warc",
        "--output", out, "--n-shards", "2", "--shards-per-commit", "2",
    ])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    # 20 pages + 1 resync duplicate url extracted
    assert res["docs_total"] == 21
    got = spark.read.parquet(out)
    assert got.select("url").distinct().count() == 20


def test_wet_sink_roundtrip(spark, corpus_dir, tmp_path):
    """extract -> write_wet -> read_wet: extracted text survives the WET
    container exactly; commit leaves only final files + _SUCCESS."""
    from document_ai_spark.operators.extraction import extract_pages
    from document_ai_spark.sources.wet import read_wet, write_wet

    pages = spark.read.parquet(
        os.path.join(corpus_dir, "pages.parquet")
    ).orderBy("url").limit(50)
    ex = extract_pages(pages, num_partitions=3).cache()
    out = str(tmp_path / "wet")
    stats = write_wet(ex, out)
    assert stats["records"] == 50 and stats["files"] >= 1

    names = sorted(os.listdir(out))
    assert "_SUCCESS" in names and "_MANIFEST.json" in names
    assert all(n in ("_SUCCESS", "_MANIFEST.json")
               or n.endswith(".warc.wet.gz")
               for n in names)  # staging dir cleaned up

    back = read_wet(spark, [
        os.path.join(out, n) for n in names if n.endswith(".gz")
    ])
    assert back.count() == 50
    orig = {r.url: r.main_text for r in ex.collect()}
    for r in back.collect():
        assert r.text == orig[r.url], r.url


def test_jsonl_export_roundtrip(spark, corpus_dir, tmp_path, capsys):
    """extract -> export (gzip JSONL shards) -> spark.read.json: text and
    meta survive; the stock reader decodes the per-record gzip members."""
    import json

    from document_ai_spark.__main__ import main
    from document_ai_spark.operators.extraction import extract_pages

    pages = spark.read.parquet(
        os.path.join(corpus_dir, "pages.parquet")
    ).orderBy("url").limit(30)
    src = str(tmp_path / "ex")
    extract_pages(pages, num_partitions=3).write.parquet(src)
    out = str(tmp_path / "shards")
    rc = main(["export", "--extracted", src, "--output", out])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and res["records"] == 30

    names = sorted(os.listdir(out))
    assert "_SUCCESS" in names
    shards = [os.path.join(out, n) for n in names if n.endswith(".jsonl.gz")]
    assert shards
    back = spark.read.json(shards)
    assert back.count() == 30
    orig = {r.url: r.main_text
            for r in spark.read.parquet(src).collect()}
    for r in back.collect():
        assert r.text == orig[r.url]
        assert r.meta.charset  # meta columns carried through
