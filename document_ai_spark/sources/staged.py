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
    ]
)


def staged_write(
    df: DataFrame,
    out_dir: str,
    record_fn: Callable,
    ext: str,
) -> dict:
    """Write `df` as one file per partition under `out_dir`.

    `record_fn(row_tuple) -> bytes` serializes one row (already framed —
    e.g. a gzip member, a newline-terminated JSON line). Returns
    {files, records, bytes}.

    Overwrite semantics: any prior commit in `out_dir` (part files with
    this extension, `_SUCCESS`) is removed BEFORE writing — a re-export
    with fewer partitions must not leave stale shards from the previous
    run under a fresh commit marker. The staging dir is unique per run so
    concurrent writers to the same directory cannot delete each other's
    staged files (last committer still wins the final rename)."""
    os.makedirs(out_dir, exist_ok=True)
    for name in os.listdir(out_dir):
        if name == "_SUCCESS" or (
            name.startswith("part-") and name.endswith(ext)
        ):
            try:
                os.remove(os.path.join(out_dir, name))
            except OSError:
                pass
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
        total = 0
        with open(path, "wb") as f:
            for b in it:
                cols = [b.column(i).to_pylist() for i in range(b.num_columns)]
                for row in zip(*cols):
                    payload = record_fn(row)
                    f.write(payload)
                    n += 1
                    total += len(payload)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([pid], pa.int32()),
                pa.array([path], pa.string()),
                pa.array([n], pa.int64()),
                pa.array([total], pa.int64()),
            ],
            names=[f_.name for f_ in _STATS_SCHEMA.fields],
        )

    stats = df.mapInArrow(gen, schema=_STATS_SCHEMA).collect()

    by_pid: dict[int, list] = {}
    for r in stats:
        by_pid.setdefault(r.partition_id, []).append(r)
    files = 0
    records = 0
    total_bytes = 0
    for pid, attempts in sorted(by_pid.items()):
        winner = attempts[0]
        final = os.path.join(out_dir, f"part-{pid:05d}{ext}")
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
