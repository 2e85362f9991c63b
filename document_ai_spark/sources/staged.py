"""Two-phase staged file writer — the committer contract in miniature,
shared by every custom-container sink (WET archives, JSONL shards).

  1. every TASK serializes its partition through `record_fn` and writes
     one staging file named (partitionId, taskAttemptId, uuid) —
     speculative or retried attempts can never collide,
  2. the DRIVER, after the job succeeds, keeps one staged file per
     partition, renames it to `part-{partition:05d}{ext}`, deletes losing
     attempts, and drops `_SUCCESS`.

Readers never observe a half-written commit (write-then-rename
visibility). Local filesystem only — a cluster deployment swaps the
os-level calls for FileSystem-API ones, the protocol is identical.
"""

from __future__ import annotations

import os
import shutil
import uuid as _uuid
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_STAGE_DIR = "_stage"

_STATS_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("staged_file", T.StringType()),
        T.StructField("records", T.LongType()),
        T.StructField("bytes", T.LongType()),
        T.StructField("md5", T.StringType()),
    ]
)


class _HashingFile:
    """File wrapper that md5s every byte written — the shard checksum is
    computed IN the task as it writes (a driver-side re-read of every
    shard would serialize the whole commit through one process)."""

    def __init__(self, f):
        import hashlib

        self._f = f
        self._h = hashlib.md5()

    def write(self, b):
        self._h.update(b)
        return self._f.write(b)

    def flush(self):
        self._f.flush()

    def hexdigest(self) -> str:
        return self._h.hexdigest()


def staged_write(
    df: DataFrame,
    out_dir: str,
    record_fn: Callable,
    ext: str,
    stream_gzip: bool = False,
) -> dict:
    """Write `df` as one file per partition under `out_dir`.

    `record_fn(row_tuple) -> bytes` serializes one row (already framed —
    e.g. a gzip member, a newline-terminated JSON line). With
    `stream_gzip=True` the whole partition file is ONE gzip stream
    (record_fn then returns uncompressed bytes): cross-record compression
    context, no ~25-byte member overhead per record — the shape training
    shards actually use. Returns {files, records, bytes} (bytes = on-disk
    size of the committed files).

    Overwrite semantics: the prior commit survives until THIS job
    succeeds — stage first, then swap winners in, remove stale part files
    from a previous (wider) commit, and only then drop the fresh
    `_SUCCESS`. A failed re-export therefore leaves the previous data
    intact (the old `_SUCCESS` is removed only at swap time, so readers
    that check the marker never observe the mixed state). The staging dir
    is unique per run so concurrent writers to the same directory cannot
    delete each other's staged files (last committer still wins the final
    rename)."""
    os.makedirs(out_dir, exist_ok=True)
    stage = os.path.join(out_dir, f"{_STAGE_DIR}-{_uuid.uuid4().hex}")
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
        with open(path, "wb") as raw0:
            raw = _HashingFile(raw0)
            if stream_gzip:
                import gzip as _gzip

                # mtime=0: deterministic output bytes for a given input
                f = _gzip.GzipFile(fileobj=raw, mode="wb", mtime=0)
            else:
                f = raw
            try:
                for b in it:
                    cols = [
                        b.column(i).to_pylist() for i in range(b.num_columns)
                    ]
                    for row in zip(*cols):
                        f.write(record_fn(row))
                        n += 1
            finally:
                if stream_gzip:
                    f.close()
        total = os.path.getsize(path)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([pid], pa.int32()),
                pa.array([path], pa.string()),
                pa.array([n], pa.int64()),
                pa.array([total], pa.int64()),
                pa.array([raw.hexdigest()], pa.string()),
            ],
            names=[f_.name for f_ in _STATS_SCHEMA.fields],
        )

    try:
        stats = df.mapInArrow(gen, schema=_STATS_SCHEMA).collect()
    except Exception:
        # failed job: its staged files are useless — remove them so
        # re-runs don't accumulate orphan staging dirs (the previous
        # commit is untouched either way)
        shutil.rmtree(stage, ignore_errors=True)
        raise

    by_pid: dict[int, list] = {}
    for r in stats:
        by_pid.setdefault(r.partition_id, []).append(r)
    # the job succeeded: invalidate the old commit marker, swap winners
    # over the old part files, drop stale parts a wider previous commit
    # left behind, and only then write the fresh marker — a crash anywhere
    # before this point leaves the previous commit fully intact
    try:
        os.remove(os.path.join(out_dir, "_SUCCESS"))
    except OSError:
        pass
    files = 0
    records = 0
    total_bytes = 0
    written = set()
    manifest: dict[str, dict] = {}
    for pid, attempts in sorted(by_pid.items()):
        winner = attempts[0]
        final = os.path.join(out_dir, f"part-{pid:05d}{ext}")
        os.replace(winner.staged_file, final)
        written.add(os.path.basename(final))
        manifest[os.path.basename(final)] = {
            "records": winner.records,
            "bytes": winner.bytes,
            "md5": winner.md5,
        }
        files += 1
        records += winner.records
        total_bytes += winner.bytes
        for lose in attempts[1:]:
            try:
                os.remove(lose.staged_file)
            except OSError:
                pass
    for name in os.listdir(out_dir):
        if (
            name.startswith("part-")
            and name.endswith(ext)
            and name not in written
        ):
            try:
                os.remove(os.path.join(out_dir, name))
            except OSError:
                pass
    shutil.rmtree(stage, ignore_errors=True)
    # shard manifest (records/bytes/md5 per file, checksummed in-task):
    # written BEFORE the marker so a committed dir always carries both —
    # training loaders verify shards against it
    import json as _json

    with open(os.path.join(out_dir, "_MANIFEST.json"), "w") as f:
        _json.dump(
            {
                "files": manifest,
                "records": records,
                "bytes": total_bytes,
            },
            f, indent=1, sort_keys=True,
        )
    with open(os.path.join(out_dir, "_SUCCESS"), "w") as f:
        f.write("")
    return {"files": files, "records": records, "bytes": total_bytes}
