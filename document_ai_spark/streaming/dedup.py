"""Streaming dedup: drop re-crawled duplicate pages across micro-batches.

A crawl stream re-delivers urls (retries, re-crawls, mirrored hosts).
`stream_dedup_pages` keeps the FIRST page per key within the watermark
horizon using Spark's built-in `dropDuplicatesWithinWatermark` — the
state store holds one entry per key and expires it once the event-time
watermark passes, so state is bounded by (arrival rate x horizon), not by
corpus size; that is the only state shape that survives a 10^12-document
crawl. Keying on `content_key` (url + html md5) instead of url alone
dedups exact re-fetches while letting a changed page through.

The reference is strictly batch (SURVEY.md §2.11); this is an engine
addition alongside streaming ingest/sessionize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_dedup_pages(
    pages: DataFrame,
    horizon: str = "1 hour",
    by_content: bool = True,
) -> DataFrame:
    """pages stream (url, warc_ts, html, ...) -> stream with duplicates
    within `horizon` of event time removed (first arrival wins).

    `by_content=True` keys on (url, md5(html)): an exact re-fetch is a
    duplicate, a changed page is not. False keys on url alone."""
    keyed = pages.withWatermark("warc_ts", horizon)
    if by_content:
        keyed = keyed.withColumn(
            "_content_key",
            F.concat_ws("#", "url", F.md5(F.coalesce(
                F.col("html"), F.lit(b"")))),
        )
        out = keyed.dropDuplicatesWithinWatermark(["_content_key"])
        return out.drop("_content_key")
    return keyed.dropDuplicatesWithinWatermark(["url"])
