"""Structured-Streaming extraction ingest.

The reference is strictly batch (SURVEY.md §2.11) — its closest notion of
incremental processing is the on-disk block cache probed before recompute
(/root/reference/ai_documents/analysis/entities.py:208-235). This module is
the engine addition for continuously-arriving crawl data: a file-source
stream over the pages directory runs the SAME frozen extraction kernel and
appends to the extracted table, with exactly-once file-level progress kept in
the streaming checkpoint (the streaming twin of the batch lineage table).

`trigger(availableNow=True)` drains everything currently present and stops —
the deployment mode for cron-style incremental crawls; leave it False for a
long-running micro-batch ingest.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..operators.extraction import extract_pages

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    dedup_horizon: str | None = None,
) -> StreamingQuery:
    """Start (and return) the streaming extraction query.

    `dedup_horizon` (e.g. '1 hour') drops re-crawled duplicates before
    extraction via dropDuplicatesWithinWatermark (streaming/dedup.py) —
    paying the dedup state BEFORE the expensive kernel, keyed on
    url+content hash so changed pages still flow through."""
    reader = (
        spark.readStream.schema(PAGES_SCHEMA)
        .format("parquet")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    pages = reader.load(input_dir)
    if dedup_horizon is not None:
        from .dedup import stream_dedup_pages

        pages = stream_dedup_pages(pages, horizon=dedup_horizon)
    # salted repartition is a stateless shuffle — allowed in streaming; it
    # spreads giant pages across tasks exactly like the batch path
    extracted = extract_pages(pages, salted=True)
    writer = (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
