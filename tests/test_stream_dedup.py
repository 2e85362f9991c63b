"""Streaming dedup across micro-batches (dropDuplicatesWithinWatermark):
re-delivered pages are dropped, changed content passes, state is bounded
by the watermark horizon."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from document_ai_spark.streaming.dedup import stream_dedup_pages

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
    ]
)

T0 = dt.datetime(2026, 1, 1, 10, 0, 0)


def _write_batch(dirname: str, name: str, rows, mtime: int):
    path = os.path.join(dirname, name)
    pq.write_table(
        pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "warc_ts": pa.array(
                    [r[1] for r in rows], pa.timestamp("us")
                ),
                "html": pa.array([r[2] for r in rows], pa.binary()),
            }
        ),
        path,
    )
    # distinct mtimes pin the micro-batch ORDER: the file source sorts by
    # modification time, and sub-second writes tie nondeterministically
    os.utime(path, (mtime, mtime))


def _run_stream(spark, src, out_rows, horizon="1 hour", by_content=True):
    pages = (
        spark.readStream.schema(PAGES_SCHEMA).format("parquet")
        .option("maxFilesPerTrigger", "1")  # one micro-batch per file
        .load(src)
    )
    deduped = stream_dedup_pages(pages, horizon=horizon,
                                 by_content=by_content)
    q = (
        deduped.writeStream.format("memory")
        .queryName(out_rows)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {
        (r.url, r.html): r for r in spark.table(out_rows).collect()
    }


@pytest.mark.filterwarnings("ignore")
def test_stream_dedup_drops_refetch_keeps_changed(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    m = dt.timedelta(minutes=1)
    # batch 1: two urls
    _write_batch(src, "b1.parquet", [
        ("u/a", T0, b"<p>alpha</p>"),
        ("u/b", T0 + m, b"<p>beta</p>"),
    ], mtime=1_700_000_000)
    # batch 2 (separate micro-batch): exact re-fetch of u/a (drop),
    # changed content for u/b (keep), fresh url (keep)
    _write_batch(src, "b2.parquet", [
        ("u/a", T0 + 2 * m, b"<p>alpha</p>"),
        ("u/b", T0 + 3 * m, b"<p>beta v2</p>"),
        ("u/c", T0 + 4 * m, b"<p>gamma</p>"),
    ], mtime=1_700_000_100)
    got = _run_stream(spark, src, "dedup_out")
    assert set(got) == {
        ("u/a", b"<p>alpha</p>"),
        ("u/b", b"<p>beta</p>"),
        ("u/b", b"<p>beta v2</p>"),
        ("u/c", b"<p>gamma</p>"),
    }
    # the kept u/a row is the FIRST arrival
    assert got[("u/a", b"<p>alpha</p>")].warc_ts == T0


@pytest.mark.filterwarnings("ignore")
def test_stream_dedup_by_url_only(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    m = dt.timedelta(minutes=1)
    _write_batch(src, "b1.parquet", [("u/a", T0, b"v1")],
                 mtime=1_700_000_000)
    _write_batch(src, "b2.parquet", [("u/a", T0 + m, b"v2")],
                 mtime=1_700_000_100)
    got = _run_stream(spark, src, "dedup_url_out", by_content=False)
    assert list(got) == [("u/a", b"v1")]  # changed content still dropped
