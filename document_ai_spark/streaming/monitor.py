"""Streaming extraction monitoring: windowed crawl-health metrics over
the extracted stream (docs, bytes, parse failures per event-time window),
watermarked so late pages fold into the right window and state expires —
the live twin of the batch per-shard lineage metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_extraction_metrics(
    extracted: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """extracted stream (warc_ts, html_bytes, parse_ok, ...) -> one row
    per finalized event-time window. Append-mode safe: a window emits
    exactly once, after the watermark passes its end."""
    w = F.window("warc_ts", window)
    return (
        extracted.withWatermark("warc_ts", watermark)
        .groupBy(w)
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("html_bytes").alias("bytes"),
            F.sum(F.when(~F.col("parse_ok"), 1).otherwise(0)).alias(
                "parse_failures"
            ),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "docs",
            "bytes",
            "parse_failures",
        )
    )
