"""Stateful streaming sessionization (applyInPandasWithState): state
carries open sessions across micro-batches; a gap closes and emits."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from document_ai_spark.streaming.sessionize import (
    SESSION_GAP_US,
    stream_sessionize,
)

EV_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
    ]
)

T0 = 1_700_000_000_000_000  # us


def _write_batch(dirname: str, name: str, rows: list[tuple[int, int]]):
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts_us": pa.array([r[1] for r in rows], pa.int64()),
            }
        ),
        os.path.join(dirname, name),
    )


@pytest.mark.filterwarnings("ignore")
def test_sessionize_across_microbatches(spark, tmp_path):
    in_dir = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    # batch 1: u1 two events 10 min apart (one open session); u2 one event
    _write_batch(in_dir, "b1.parquet", [
        (1, T0),
        (1, T0 + 600 * 1_000_000),
        (2, T0),
    ])

    out_dir = str(tmp_path / "sessions")

    def run_once():
        events = (
            spark.readStream.schema(EV_SCHEMA).format("parquet").load(in_dir)
        )

        def sink(batch_df, _batch_id):
            # no count() first — that would re-execute the stateful operator
            batch_df.write.mode("append").parquet(out_dir)

        q = (
            stream_sessionize(events)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream did not drain in time"
        q.stop()

    def closed():
        try:
            return spark.read.parquet(out_dir).collect()
        except Exception:
            return []

    run_once()
    # nothing closed yet — both sessions still open in state
    assert closed() == []

    # batch 2: u1 event far beyond the gap -> closes the first session
    _write_batch(in_dir, "b2.parquet", [
        (1, T0 + 600 * 1_000_000 + SESSION_GAP_US + 1_000_000),
    ])
    run_once()
    rows = [r for r in closed() if r.closed_by == "gap"]
    assert len(rows) == 1
    r = rows[0]
    assert r.user_id == 1
    assert r.session_start_us == T0
    assert r.session_end_us == T0 + 600 * 1_000_000
    assert r.n_events == 2


class _FakeState:
    """Minimal GroupState stand-in for unit-testing the group function."""

    def __init__(self):
        self._v = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v = None


def test_sessionize_out_of_order_across_batches():
    # an in-gap straggler older than the stored last-seen (or even the
    # stored start) must widen the open session, never regress it
    import pandas as pd

    from document_ai_spark.streaming.sessionize import _sessionize_group

    st = _FakeState()
    b1 = pd.DataFrame({"ts_us": [T0 + 100_000_000, T0 + 200_000_000]})
    list(_sessionize_group((1,), iter([b1]), st))
    assert st.get == (T0 + 100_000_000, T0 + 200_000_000, 2)
    # batch 2 arrives out of order: one event before start, one mid-session
    b2 = pd.DataFrame({"ts_us": [T0, T0 + 150_000_000]})
    list(_sessionize_group((1,), iter([b2]), st))
    start, last, n = st.get
    assert start == T0            # widened backward
    assert last == T0 + 200_000_000  # NOT regressed
    assert n == 4


@pytest.mark.filterwarnings("ignore")
def test_streaming_session_window_with_watermark(spark, tmp_path):
    """The Spark-native alternative to the custom stateful operator:
    readStream -> withWatermark -> session_window aggregation. Late data
    beyond the watermark is dropped; sessions emit on watermark advance
    (append mode)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    in_dir = str(tmp_path / "swin")
    os.makedirs(in_dir)
    base = T0

    def w(name, rows):
        pq.write_table(
            pa.table({
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [r[1] for r in rows], pa.timestamp("us", tz="UTC")
                ),
            }),
            os.path.join(in_dir, name),
        )

    # u1: two events 10 min apart (one session), then a 2h-later event
    # that closes the first session once the watermark passes
    w("b1.parquet", [(1, base), (1, base + 600 * 1_000_000)])
    w("b2.parquet", [(1, base + 7200 * 1_000_000)])

    events = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .format("parquet").load(in_dir)
    )
    agg = (
        events.withWatermark("ts", "10 minutes")
        .groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    out = []
    q = (
        agg.writeStream.outputMode("append")
        .foreachBatch(lambda df, _id: out.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    closed = [(r.user_id, r.n_events) for r in out]
    # the first session (2 events) must have been emitted and closed by the
    # watermark advancing past base+40min; the trailing session may remain
    # open (append mode emits only finalized sessions)
    assert (1, 2) in closed


@pytest.mark.filterwarnings("ignore")
def test_streaming_dedup_with_watermark(spark, tmp_path):
    """Crawl-ingest dedup: readStream -> withWatermark -> dropDuplicates
    on url keeps exactly the first arrival of each url across
    micro-batches (state-store-backed exactly-once semantics)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    in_dir = str(tmp_path / "dd")
    os.makedirs(in_dir)

    def w(name, rows, mtime):
        path = os.path.join(in_dir, name)
        pq.write_table(
            pa.table({
                "url": pa.array([r[0] for r in rows], pa.string()),
                "ts": pa.array([r[1] for r in rows],
                               pa.timestamp("us", tz="UTC")),
                "rev": pa.array([r[2] for r in rows], pa.int64()),
            }),
            path,
        )
        # distinct mtimes pin micro-batch ORDER (the file source sorts by
        # modification time; sub-second writes tie nondeterministically)
        os.utime(path, (mtime, mtime))

    w("b1.parquet", [("u/a", T0, 1), ("u/b", T0 + 1, 1)], 1_700_000_000)
    w("b2.parquet", [("u/a", T0 + 2, 2), ("u/c", T0 + 3, 1)],
      1_700_000_100)  # dup u/a

    stream = (
        spark.readStream.schema("url string, ts timestamp, rev long")
        .option("maxFilesPerTrigger", "1")
        .format("parquet").load(in_dir)
    )
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicates(["url"])
    out = []
    q = (
        deduped.writeStream.outputMode("append")
        .foreachBatch(lambda df, _id: out.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {r.url: r.rev for r in out}
    assert got == {"u/a": 1, "u/b": 1, "u/c": 1}  # first arrival wins
