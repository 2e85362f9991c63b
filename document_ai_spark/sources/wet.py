"""WET sink: extracted text back out in Common Crawl's WET container
(`.warc.wet.gz` — one `WARC-Type: conversion` record per document, one
gzip member per record, so consumers can seek-stream members).

Writes go through the shared two-phase staged committer
(sources/staged.py): task-attempt-unique staging files, driver-side
winner-per-partition rename, `_SUCCESS` marker — readers never observe a
half-written commit.
"""

from __future__ import annotations

import gzip
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .staged import staged_write

_CTRL_RE = re.compile(r"[\x00-\x1f\x7f]")


def _wet_record(url: str, ts, text: str) -> bytes:
    # control characters in the url (possible when the extracted table
    # came from a non-WARC source) would inject forged headers and break
    # the CRLF record framing — strip them before building the block
    url = _CTRL_RE.sub("", url or "")
    body = text.encode("utf-8")
    # a non-WARC-sourced table may carry NULL timestamps; WARC-Date is
    # mandatory, so fall back to the epoch sentinel rather than failing
    # the task
    date = (
        ts.strftime("%Y-%m-%dT%H:%M:%SZ") if ts
        else "1970-01-01T00:00:00Z"
    )
    headers = (
        b"WARC/1.0\r\n"
        b"WARC-Type: conversion\r\n"
        b"WARC-Target-URI: " + url.encode("utf-8") + b"\r\n"
        b"WARC-Date: " + date.encode("ascii") + b"\r\n"
        b"Content-Type: text/plain\r\n"
        b"Content-Length: " + str(len(body)).encode("ascii") + b"\r\n"
        b"\r\n"
    )
    return headers + body + b"\r\n\r\n"


def write_wet(extracted: DataFrame, out_dir: str) -> dict:
    """extracted(url, warc_ts, main_text, ...) -> WET files under
    `out_dir`. Returns {files, records, bytes}."""

    def rec(row) -> bytes:
        u, t, x = row
        return gzip.compress(_wet_record(u, t, x or ""))

    return staged_write(
        extracted.select("url", "warc_ts", "main_text"),
        out_dir, rec, ".warc.wet.gz",
    )


def read_wet(spark, paths: list[str]) -> DataFrame:
    """WET archives -> (url, warc_ts, text) — the readback twin, built on
    the WARC record parser with record_type='conversion'."""
    from .warc import read_warc

    w = read_warc(spark, paths, record_type="conversion")
    return (
        w.filter(F.col("record_ok"))
        .select(
            "url", "warc_ts",
            F.decode(F.col("html"), "UTF-8").alias("text"),
        )
    )
