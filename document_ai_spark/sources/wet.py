"""WET sink: extracted text back out in Common Crawl's WET container
(`.warc.wet.gz` — one `WARC-Type: conversion` record per document, one
gzip member per record, so consumers can seek-stream members).

Write protocol (two-phase, the committer contract in miniature):
  1. every TASK writes its partition's records to a staging file named
     with (partitionId, taskAttemptId, uuid) — speculative or retried
     attempts can never collide,
  2. the DRIVER, after the job succeeds, keeps exactly one staged file
     per partition (task success implies any surviving attempt is
     complete), renames it to `part-{partition:05d}.warc.wet.gz`,
     deletes losing attempts, and drops `_SUCCESS`.
Readers therefore never observe a half-written commit — the same
write-then-rename visibility our lineage appender relies on. Local
filesystem only (like the lineage fast path); remote deployments use the
same records through a FileSystem-API writer.
"""

from __future__ import annotations

import gzip
import os
import shutil
import uuid as _uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_STAGE_DIR = "_wet_stage"

_STATS_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("staged_file", T.StringType()),
        T.StructField("records", T.LongType()),
        T.StructField("bytes", T.LongType()),
    ]
)


def _wet_record(url: str, ts, text: str) -> bytes:
    body = text.encode("utf-8")
    headers = (
        b"WARC/1.0\r\n"
        b"WARC-Type: conversion\r\n"
        b"WARC-Target-URI: " + url.encode("utf-8") + b"\r\n"
        b"WARC-Date: "
        + ts.strftime("%Y-%m-%dT%H:%M:%SZ").encode("ascii") + b"\r\n"
        b"Content-Type: text/plain\r\n"
        b"Content-Length: " + str(len(body)).encode("ascii") + b"\r\n"
        b"\r\n"
    )
    return headers + body + b"\r\n\r\n"


def write_wet(extracted: DataFrame, out_dir: str) -> dict:
    """extracted(url, warc_ts, main_text, ...) -> WET files under
    `out_dir`. Returns {files, records, bytes}."""
    os.makedirs(out_dir, exist_ok=True)
    stage = os.path.join(out_dir, _STAGE_DIR)
    os.makedirs(stage, exist_ok=True)

    def gen(it):
        import pyarrow as pa
        from pyspark import TaskContext

        tc = TaskContext.get()
        pid = tc.partitionId() if tc else 0
        attempt = tc.taskAttemptId() if tc else 0
        path = os.path.join(
            stage, f"{pid:05d}-{attempt}-{_uuid.uuid4().hex}.tmp"
        )
        n = 0
        total = 0
        with open(path, "wb") as f:
            for b in it:
                urls = b.column(0).to_pylist()
                tss = b.column(1).to_pylist()
                texts = b.column(2).to_pylist()
                for u, t, x in zip(urls, tss, texts):
                    member = gzip.compress(_wet_record(u, t, x or ""))
                    f.write(member)
                    n += 1
                    total += len(member)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([pid], pa.int32()),
                pa.array([path], pa.string()),
                pa.array([n], pa.int64()),
                pa.array([total], pa.int64()),
            ],
            names=[f_.name for f_ in _STATS_SCHEMA.fields],
        )

    cols = extracted.select("url", "warc_ts", "main_text")
    stats = cols.mapInArrow(gen, schema=_STATS_SCHEMA).collect()

    # driver-side commit: one winner per partition, losers deleted
    by_pid: dict[int, list] = {}
    for r in stats:
        by_pid.setdefault(r.partition_id, []).append(r)
    files = 0
    records = 0
    total_bytes = 0
    for pid, attempts in sorted(by_pid.items()):
        winner = attempts[0]
        final = os.path.join(out_dir, f"part-{pid:05d}.warc.wet.gz")
        os.replace(winner.staged_file, final)
        files += 1
        records += winner.records
        total_bytes += winner.bytes
        for lose in attempts[1:]:
            try:
                os.remove(lose.staged_file)
            except OSError:
                pass
    shutil.rmtree(stage, ignore_errors=True)
    with open(os.path.join(out_dir, "_SUCCESS"), "w") as f:
        f.write("")
    return {"files": files, "records": records, "bytes": total_bytes}


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
