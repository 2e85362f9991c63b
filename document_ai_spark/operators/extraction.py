"""The Spark extraction stage: pages DataFrame -> extracted DataFrame.

One ``mapInArrow`` stage over Arrow record batches runs the frozen kernel
(document_ai_spark.kernel.extract) per document — the analog of the
reference's per-document ``analyze()`` loop (/root/reference/
performances.py:239), but Arrow-batched and executor-parallel instead of a
single sequential Python process. The kernel's regexes are compiled once at
module import per Python worker (the reference instead reconstructs its OCR
model per image — /root/reference/ai_documents/analysis/cv/
boxes_processing.py:8 — the anti-pattern we avoid).

Scale design:
  - Column pruning before the UDF: only (url, warc_ts, html) cross the
    Arrow boundary.
  - Salted repartition by url-hash (``pmod(xxhash64(url), parts)``) spreads
    giant pages (100-1000x median bytes) across partitions so no single task
    inherits a run of them — AQE skew handling cannot see Python UDF compute
    skew, so this is done explicitly (SURVEY.md §4).
  - Arrow maxRecordsPerBatch is capped in session.py so one batch of giant
    pages stays bounded in memory.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernel.extract import extract_document

SPAN_TYPE = T.StructType(
    [
        T.StructField("span_id", T.IntegerType()),
        T.StructField("start", T.IntegerType()),
        T.StructField("end", T.IntegerType()),
        T.StructField("block_id", T.IntegerType()),
        T.StructField("kind", T.StringType()),
    ]
)

EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("main_text", T.StringType()),
        T.StructField("spans", T.ArrayType(SPAN_TYPE)),
        T.StructField("n_blocks", T.IntegerType()),
        T.StructField("parse_ok", T.BooleanType()),
        T.StructField("err", T.StringType()),
        T.StructField("charset", T.StringType()),
        T.StructField("html_bytes", T.LongType()),
    ]
)


_SPAN_ARROW = None


def _span_arrow_type():
    import pyarrow as pa

    global _SPAN_ARROW
    if _SPAN_ARROW is None:
        _SPAN_ARROW = pa.list_(
            pa.struct(
                [
                    ("span_id", pa.int32()),
                    ("start", pa.int32()),
                    ("end", pa.int32()),
                    ("block_id", pa.int32()),
                    ("kind", pa.string()),
                ]
            )
        )
    return _SPAN_ARROW


def _extract_batches(batches):
    """Iterator-of-Arrow-batches kernel driver (mapInArrow — measured ~17%
    faster than the pandas form: no pandas object-column round trip).
    Per-worker init happens at module import: compiled regexes, frozen
    tables."""
    import pyarrow as pa

    for b in batches:
        urls = b.column(b.schema.get_field_index("url"))
        tss = b.column(b.schema.get_field_index("warc_ts"))
        htmls = b.column(b.schema.get_field_index("html")).to_pylist()
        mt: list[str] = []
        sp: list[list[dict]] = []
        nb: list[int] = []
        ok: list[bool] = []
        err: list[str] = []
        cs: list[str] = []
        hb: list[int] = []
        for raw in htmls:
            res = extract_document(raw)
            mt.append(res.main_text)
            sp.append(
                [
                    {
                        "span_id": s.span_id,
                        "start": s.start,
                        "end": s.end,
                        "block_id": s.block_id,
                        "kind": s.kind,
                    }
                    for s in res.spans
                ]
            )
            nb.append(res.n_blocks)
            ok.append(res.parse_ok)
            err.append(res.err)
            cs.append(res.charset)
            hb.append(len(raw) if raw is not None else 0)
        yield pa.RecordBatch.from_arrays(
            [
                urls,
                tss,
                pa.array(mt, pa.string()),
                pa.array(sp, _span_arrow_type()),
                pa.array(nb, pa.int32()),
                pa.array(ok, pa.bool_()),
                pa.array(err, pa.string()),
                pa.array(cs, pa.string()),
                pa.array(hb, pa.int64()),
            ],
            names=[f.name for f in EXTRACTED_SCHEMA.fields],
        )


# size-aware partitioning targets: raw bytes of html per post-shuffle
# partition (compute skew bound) and per output file
TARGET_PARTITION_BYTES = 64 * 1024 * 1024
PARQUET_COMPRESSION_FACTOR = 3  # observed on-disk -> raw ratio for pages


def estimate_input_bytes(df: DataFrame) -> int:
    """Best-effort raw-byte estimate from the scan's file sizes (local fs;
    0 when unknown). On a cluster the same numbers come from the catalog
    (Iceberg table stats) — this is the parquet-fallback path."""
    import os
    from urllib.parse import urlparse

    total = 0
    try:
        for f in df.inputFiles():
            p = urlparse(f)
            if p.scheme in ("file", ""):
                try:
                    total += os.path.getsize(p.path)
                except OSError:
                    pass
    except Exception:
        return 0
    return total * PARQUET_COMPRESSION_FACTOR


def size_aware_partitions(pages: DataFrame) -> int:
    """Salt-partition count from input size: enough partitions that one
    partition's html fits comfortably in an executor python worker
    (TARGET_PARTITION_BYTES raw), floored at 4x parallelism so the
    scheduler can smooth giant-page stragglers, capped to keep task
    overhead sane on small inputs."""
    parallelism = pages.sparkSession.sparkContext.defaultParallelism
    est = estimate_input_bytes(pages)
    by_size = est // TARGET_PARTITION_BYTES + 1 if est else 0
    return max(4 * parallelism, by_size)


@contextmanager
def capped_scan_splits(spark):
    """Temporarily cap `spark.sql.files.maxPartitionBytes` so FilePartition
    packing cannot merge small row groups into oversized tasks (disk bytes x
    compression ~= raw html per task <= TARGET_PARTITION_BYTES), restoring
    the previous value on exit. Action sites (run_extraction_job, bench,
    the extract CLI) wrap their jobs in this so the cap never leaks into
    unrelated queries on the same session — Spark reads the conf at scan
    execution, so a lazy extract_pages() DataFrame must be *executed*
    inside this context for the cap to apply."""
    key = "spark.sql.files.maxPartitionBytes"
    old = spark.conf.get(key)
    spark.conf.set(
        key, str(TARGET_PARTITION_BYTES // PARQUET_COMPRESSION_FACTOR)
    )
    try:
        yield
    finally:
        spark.conf.set(key, old)


def _packing_bounded(spark) -> bool:
    """True when the session's current maxPartitionBytes keeps split
    packing under TARGET_PARTITION_BYTES of raw html per task."""
    try:
        cap = int(spark.conf.get("spark.sql.files.maxPartitionBytes"))
    except Exception:
        return False
    return cap * PARQUET_COMPRESSION_FACTOR <= TARGET_PARTITION_BYTES


def splits_bound_skew(pages: DataFrame) -> bool:
    """True when the input's parquet row-group structure already bounds
    per-task raw bytes, so byte-proportional compute skew is handled by
    finer scan splits and the salt shuffle of the raw html is unnecessary.

    Measured on this corpus shape the salt shuffle costs ~1.6x end-to-end
    (BENCH/BASELINE.md): shuffling the full html payload and re-feeding
    Arrow from shuffled rows dwarfs the skew it defuses whenever row groups
    are small. Conditions (checked from local parquet footers; on a cluster
    the same numbers come from the table manifest):
      - every row group's uncompressed size <= TARGET_PARTITION_BYTES
        (no row group can force an oversized task), and
      - there are >= 2x parallelism row groups (enough task granularity
        for the scheduler to smooth stragglers).
    Unknown layouts (no local footers, e.g. Iceberg/remote) return False —
    the conservative path keeps the salt shuffle.
    """
    from urllib.parse import urlparse

    try:
        import pyarrow.parquet as pq

        files = pages.inputFiles()
        if not files:
            return False
        n_rg = 0
        max_rg = 0
        for f in files:
            p = urlparse(f)
            if p.scheme not in ("file", ""):
                return False
            md = pq.ParquetFile(p.path).metadata
            n_rg += md.num_row_groups
            for i in range(md.num_row_groups):
                max_rg = max(max_rg, md.row_group(i).total_byte_size)
    except Exception:
        return False
    parallelism = pages.sparkSession.sparkContext.defaultParallelism
    return (
        max_rg <= TARGET_PARTITION_BYTES
        and n_rg >= 2 * parallelism
        # split packing can merge small row groups back into oversized
        # tasks unless the session's maxPartitionBytes is capped — callers
        # opt in via capped_scan_splits() around the job (no session-wide
        # conf mutation here; an uncapped session takes the salted path)
        and _packing_bounded(pages.sparkSession)
    )


def extract_pages(
    pages: DataFrame,
    num_partitions: int | None = None,
    salted: bool | str = "auto",
) -> DataFrame:
    """pages(url, warc_ts, html, ...) -> extracted DataFrame.

    ``salted`` repartitions by url-hash to defuse giant-page compute skew:
      - "auto" (default): salt only when the scan's row-group structure
        cannot bound per-task bytes (splits_bound_skew) — skipping the
        full-payload shuffle is worth ~1.6x when splits already do the job;
      - True/False force either path (True for pathological layouts or
        when the output must cluster by url-hash; False for freshly
        generated evenly-sized input).
    """
    if salted == "auto":
        # unsalted only when row-group structure bounds per-task bytes AND
        # the session's split-packing cap is already in place (see
        # capped_scan_splits) — never mutates session conf itself
        salted = not splits_bound_skew(pages)
    cols = pages.select("url", "warc_ts", "html")  # prune before Arrow
    if salted:
        # size-aware salt count: >=4x overpartitioning (giant pages are
        # UDF-compute skew the scheduler smooths with more, smaller tasks)
        # and at most TARGET_PARTITION_BYTES of raw html per partition
        n = num_partitions or size_aware_partitions(pages)
        cols = cols.repartition(n, F.pmod(F.xxhash64("url"), F.lit(n)))
    return cols.mapInArrow(_extract_batches, schema=EXTRACTED_SCHEMA)


BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("block_id", T.IntegerType()),
        T.StructField("tag", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("text_len", T.IntegerType()),
        T.StructField("link_text_len", T.IntegerType()),
        T.StructField("n_words", T.IntegerType()),
        T.StructField("is_heading", T.BooleanType()),
        T.StructField("in_chrome", T.BooleanType()),
        T.StructField("accepted", T.BooleanType()),
    ]
)


def _block_batches(batches):
    import pyarrow as pa

    from ..kernel.charset import decode_html
    from ..kernel.classify import classify_blocks
    from ..kernel.extract import MAX_HTML_BYTES
    from ..kernel.tokenizer import tokenize_blocks

    for b in batches:
        urls = b.column(b.schema.get_field_index("url")).to_pylist()
        htmls = b.column(b.schema.get_field_index("html")).to_pylist()
        cols: dict[str, list] = {f.name: [] for f in BLOCKS_SCHEMA.fields}
        for url, raw in zip(urls, htmls):
            if raw is None or raw.startswith(b"%PDF-"):
                continue
            try:
                # same truncation guard as kernel/extract.py: the debug
                # surface must describe what production classified, and
                # tokenize cost must stay bounded on multi-MB pages
                if len(raw) > MAX_HTML_BYTES:
                    raw = raw[:MAX_HTML_BYTES]
                text, _cs = decode_html(raw)
                blocks = tokenize_blocks(text)
                flags = classify_blocks(blocks)
            except Exception:
                continue  # undecodable page -> no block rows
            for blk, ok in zip(blocks, flags):
                cols["url"].append(url)
                cols["block_id"].append(blk.block_id)
                cols["tag"].append(blk.tag)
                cols["depth"].append(blk.depth)
                cols["text_len"].append(blk.text_len)
                cols["link_text_len"].append(blk.link_text_len)
                cols["n_words"].append(blk.n_words)
                cols["is_heading"].append(blk.is_heading)
                cols["in_chrome"].append(blk.in_chrome)
                cols["accepted"].append(ok)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(cols["url"], pa.string()),
                pa.array(cols["block_id"], pa.int32()),
                pa.array(cols["tag"], pa.string()),
                pa.array(cols["depth"], pa.int32()),
                pa.array(cols["text_len"], pa.int32()),
                pa.array(cols["link_text_len"], pa.int32()),
                pa.array(cols["n_words"], pa.int32()),
                pa.array(cols["is_heading"], pa.bool_()),
                pa.array(cols["in_chrome"], pa.bool_()),
                pa.array(cols["accepted"], pa.bool_()),
            ],
            names=[f.name for f in BLOCKS_SCHEMA.fields],
        )


def extract_blocks(pages: DataFrame) -> DataFrame:
    """Per-block debugging surface: one row per segmented block with its
    feature vector and the classifier decision — the 'why was this block
    kept/dropped' view (analog of the reference's per-block verbose dumps,
    /root/reference/ai_documents/analysis/cv/document_parsing.py verbose
    paths). Same pruned-column mapInArrow shape as extract_pages."""
    cols = pages.select("url", "html")
    return cols.mapInArrow(_block_batches, schema=BLOCKS_SCHEMA)


def partition_metrics(extracted: DataFrame, run_id: str) -> DataFrame:
    """Per-partition extraction metrics (A10 analog of the reference's
    per-run summary rows, /root/reference/performances.py:271-296)."""
    return (
        extracted.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("html_bytes").alias("bytes"),
            F.sum(F.when(~F.col("parse_ok"), 1).otherwise(0)).alias(
                "parse_failures"
            ),
        )
        .withColumn("run_id", F.lit(run_id))
        .select("run_id", "partition_id", "docs", "bytes", "parse_failures")
    )
