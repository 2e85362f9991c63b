"""Regression tests for the round-3 ADVICE findings: staged commits must
survive a failed re-export, WET headers must be injection-proof, JSONL
shards compress as one gzip stream, and the noindex gate judges each
crawl row by its own head region."""

from __future__ import annotations

import datetime as dt
import gzip
import os
import zlib

import pytest

from document_ai_spark.sources.staged import staged_write


def _read_parts(out, ext):
    return sorted(
        n for n in os.listdir(out)
        if n.startswith("part-") and n.endswith(ext)
    )


def test_staged_write_failed_rerun_preserves_prior_commit(spark, tmp_path):
    out = str(tmp_path / "out")
    df = spark.createDataFrame([(i,) for i in range(10)], ["v"]).repartition(2)
    staged_write(df, out, lambda r: f"{r[0]}\n".encode(), ".txt")
    parts = _read_parts(out, ".txt")
    assert parts and os.path.exists(os.path.join(out, "_SUCCESS"))
    before = {
        p: open(os.path.join(out, p), "rb").read() for p in parts
    }

    def boom(row):
        raise RuntimeError("serializer broke")

    with pytest.raises(Exception):
        staged_write(df, out, boom, ".txt")
    # the failed job must not have touched the previous commit, and its
    # staging dir must not linger
    assert _read_parts(out, ".txt") == parts
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    assert not [n for n in os.listdir(out) if n.startswith("_stage")]
    for p, data in before.items():
        assert open(os.path.join(out, p), "rb").read() == data


def test_staged_write_narrower_rerun_drops_stale_parts(spark, tmp_path):
    out = str(tmp_path / "out")
    df4 = spark.createDataFrame([(i,) for i in range(8)], ["v"]).repartition(4)
    staged_write(df4, out, lambda r: f"{r[0]}\n".encode(), ".txt")
    assert len(_read_parts(out, ".txt")) == 4
    df1 = spark.createDataFrame([(i,) for i in range(8)], ["v"]).coalesce(1)
    stats = staged_write(df1, out, lambda r: f"{r[0]}\n".encode(), ".txt")
    # stale shards from the wider commit are gone, marker is fresh
    assert len(_read_parts(out, ".txt")) == stats["files"] == 1
    assert os.path.exists(os.path.join(out, "_SUCCESS"))


def test_wet_header_injection_stripped(spark, tmp_path):
    from document_ai_spark.sources.wet import read_wet, write_wet

    ts = dt.datetime(2024, 1, 1, 12, 0, 0)
    evil = "https://a.example/x\r\nWARC-Type: forged\r\nX-Evil: 1"
    rows = [
        (evil, ts, "payload one"),
        ("https://b.example/y", ts, "payload two"),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, main_text string"
    ).coalesce(1)
    out = str(tmp_path / "wet")
    stats = write_wet(df, out)
    assert stats["records"] == 2
    back = read_wet(spark, [
        os.path.join(out, n) for n in os.listdir(out)
        if n.endswith(".warc.wet.gz")
    ]).collect()
    # still exactly two intact conversion records; the control chars in
    # the url were stripped rather than splitting the header block
    assert len(back) == 2
    urls = {r.url for r in back}
    assert "https://a.example/xWARC-Type: forgedX-Evil: 1" in urls
    texts = {r.text for r in back}
    assert texts == {"payload one", "payload two"}


def test_jsonl_shard_is_single_gzip_stream(spark, tmp_path):
    from document_ai_spark.sources.jsonl import write_jsonl

    ts = dt.datetime(2024, 1, 1)
    # repetitive text: cross-record compression context must shrink it
    rows = [
        (f"https://e/{i}", ts, "the common prefix words " * 10)
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, main_text string"
    ).coalesce(1)
    out = str(tmp_path / "shards")
    write_jsonl(df, out)
    shard = [n for n in os.listdir(out) if n.endswith(".jsonl.gz")]
    assert len(shard) == 1
    blob = open(os.path.join(out, shard[0]), "rb").read()
    d = zlib.decompressobj(wbits=31)
    raw = d.decompress(blob)
    # ONE gzip member covering the whole shard — no per-record members
    assert d.eof and d.unused_data == b""
    assert len(raw.splitlines()) == 200
    # and the stream actually compresses (the per-record-member regression
    # made shards LARGER than the uncompressed data)
    assert len(blob) < len(raw) // 5
    assert gzip.decompress(blob) == raw
    back = spark.read.json(os.path.join(out, shard[0]))
    assert back.count() == 200


def test_wet_null_timestamp_fallback(spark, tmp_path):
    """Non-WARC-sourced rows may carry NULL warc_ts; the WET sink must
    emit the epoch sentinel, not crash the task."""
    from document_ai_spark.sources.wet import read_wet, write_wet

    df = spark.createDataFrame(
        [("https://a.example/x", None, "hello")],
        "url string, warc_ts timestamp, main_text string",
    )
    out = str(tmp_path / "wet")
    assert write_wet(df, out)["records"] == 1
    back = read_wet(spark, [
        os.path.join(out, n) for n in os.listdir(out)
        if n.endswith(".warc.wet.gz")
    ]).collect()
    assert back[0].text == "hello"
    assert back[0].warc_ts.year == 1970


def test_staged_write_manifest_checksums(spark, tmp_path):
    """Every commit carries _MANIFEST.json whose per-shard md5/bytes/
    records match the files on disk (checksummed in-task)."""
    import hashlib
    import json

    from document_ai_spark.sources.jsonl import write_jsonl

    ts = dt.datetime(2024, 1, 1)
    rows = [(f"https://e/{i}", ts, f"text number {i}") for i in range(50)]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, main_text string"
    ).repartition(3)
    out = str(tmp_path / "shards")
    stats = write_jsonl(df, out)
    man = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert man["records"] == stats["records"] == 50
    assert man["bytes"] == stats["bytes"]
    assert len(man["files"]) == stats["files"]
    for name, info in man["files"].items():
        blob = open(os.path.join(out, name), "rb").read()
        assert len(blob) == info["bytes"]
        assert hashlib.md5(blob).hexdigest() == info["md5"]
        assert len(gzip.decompress(blob).splitlines()) == info["records"]


def test_indexable_pages_gates_per_crawl_row(spark):
    from document_ai_spark.operators.pageflags import indexable_pages

    clean = b"<html><head><title>t</title></head><body>ok</body></html>"
    blocked = (b'<html><head><meta name="robots" content="noindex">'
               b"</head><body>ok</body></html>")
    rows = [
        ("u/mixed", 1, clean),
        ("u/mixed", 2, blocked),  # newer crawl declares noindex
        ("u/clean", 3, clean),
        ("u/blocked", 4, blocked),
    ]
    pages = spark.createDataFrame(
        rows, "url string, crawl int, html binary"
    )
    kept = [(r.url, r.crawl) for r in indexable_pages(pages).collect()]
    # only the rows whose OWN head allows indexing survive
    assert sorted(kept) == [("u/clean", 3), ("u/mixed", 1)]
