"""Regression tests for the round-2 ADVICE findings: session-conf leak
(capped_scan_splits), lineage remote-filesystem gating, _block_batches
truncation parity, and the session-window oracle tiebreak on duplicate
timestamps."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from document_ai_spark.kernel.extract import MAX_HTML_BYTES
from document_ai_spark.operators.extraction import (
    PARQUET_COMPRESSION_FACTOR,
    TARGET_PARTITION_BYTES,
    _block_batches,
    capped_scan_splits,
    extract_pages,
    splits_bound_skew,
)

_MPB = "spark.sql.files.maxPartitionBytes"


def test_capped_scan_splits_sets_and_restores(spark, corpus_dir):
    before = spark.conf.get(_MPB)
    pages = spark.read.parquet(os.path.join(corpus_dir, "pages.parquet"))
    with capped_scan_splits(spark):
        inside = int(spark.conf.get(_MPB))
        # cap keeps packing under the raw-bytes-per-task target
        assert inside * PARQUET_COMPRESSION_FACTOR <= TARGET_PARTITION_BYTES
        # the auto path executes fine under the cap
        assert extract_pages(pages).count() == 200
    assert spark.conf.get(_MPB) == before


def test_capped_scan_splits_restores_on_error(spark):
    before = spark.conf.get(_MPB)
    with pytest.raises(RuntimeError):
        with capped_scan_splits(spark):
            raise RuntimeError("boom")
    assert spark.conf.get(_MPB) == before


def test_extract_pages_auto_never_mutates_session_conf(spark, corpus_dir):
    # ADVICE r2: the auto-unsalted path used to shrink maxPartitionBytes
    # session-wide; now an uncapped session resolves 'auto' to the salted
    # path and the conf is untouched either way
    before = spark.conf.get(_MPB)
    spark.conf.set(_MPB, str(128 * 1024 * 1024))
    try:
        pages = spark.read.parquet(
            os.path.join(corpus_dir, "pages.parquet")
        )
        assert not splits_bound_skew(pages)  # uncapped -> conservative
        assert extract_pages(pages).count() == 200
        assert spark.conf.get(_MPB) == str(128 * 1024 * 1024)
    finally:
        spark.conf.set(_MPB, before)


def test_lineage_remote_scheme_routes_to_spark_writer(spark, monkeypatch):
    # hdfs:// and s3a:// targets must go through the Spark writer, not the
    # driver-local pyarrow fast path (which would write to a literal local
    # directory named 'hdfs:')
    from pyspark.sql import types as T

    from document_ai_spark.operators import lineage as lin

    calls = []
    monkeypatch.setattr(
        lin, "append_rows", lambda df, path: calls.append(path)
    )
    schema = T.StructType([T.StructField("run_id", T.StringType())])
    rows = [("r1",)]
    for target in ("hdfs://nn:8020/out/_lineage", "s3a://bkt/out/_lineage",
                   "lineage_table"):
        lin._append_lineage_rows(spark, rows, schema, target)
    assert calls == ["hdfs://nn:8020/out/_lineage",
                     "s3a://bkt/out/_lineage", "lineage_table"]
    assert not os.path.exists("hdfs:")


def test_lineage_local_path_still_fast_path(spark, tmp_path, monkeypatch):
    from pyspark.sql import types as T

    from document_ai_spark.operators import lineage as lin

    monkeypatch.setattr(
        lin, "append_rows",
        lambda df, path: pytest.fail("local path must not use Spark writer"),
    )
    schema = T.StructType(
        [
            T.StructField("run_id", T.StringType()),
            T.StructField("shard_id", T.IntegerType()),
            T.StructField("docs", T.LongType()),
            T.StructField("bytes", T.LongType()),
            T.StructField("parse_failures", T.LongType()),
            T.StructField("started_ts", T.TimestampType()),
            T.StructField("finished_ts", T.TimestampType()),
            T.StructField("status", T.StringType()),
        ]
    )
    from pyspark.sql import Row

    now = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [Row(run_id="r1", shard_id=0, docs=10, bytes=1000,
                parse_failures=0, started_ts=now, finished_ts=now,
                status="done")]
    target = str(tmp_path / "_lineage")
    lin._append_lineage_rows(spark, rows, schema, target)
    got = spark.read.parquet(target).collect()
    assert len(got) == 1 and got[0].status == "done"


def test_block_batches_truncates_like_production(spark):
    # the per-block debug surface must describe what extract_document
    # actually classified on truncated giant pages (ADVICE r2)
    filler = b"<p>word one two three four five six seven eight nine</p>"
    reps = MAX_HTML_BYTES // len(filler) + 10
    giant = b"<html><body>" + filler * reps
    truncated = giant[:MAX_HTML_BYTES]

    def rows(payload):
        batch = pa.record_batch(
            [pa.array(["u1"], pa.string()), pa.array([payload], pa.binary())],
            names=["url", "html"],
        )
        return sum(b.num_rows for b in _block_batches([batch]))

    assert rows(giant) == rows(truncated)
    # sanity: an untruncated run over the full page would yield more blocks
    assert rows(giant) < reps


def test_session_window_oracle_deterministic_on_tied_timestamps(
    spark, tmp_path
):
    # two events share the exact timestamp at a >=gap boundary: the oracle's
    # islands cumulative sum must use the same (ts, event_id) tiebreak as
    # the marked CTE, or the tied row can land in the wrong session
    import duckdb

    from document_ai_spark.queries import (
        SQL_SESSION_WINDOW_AGG,
        q_session_window_agg,
    )
    from scripts.check_oracle import canon

    t0 = dt.datetime(2026, 1, 1, 10, 0, 0)
    # 31 min > the 30-min gap: a new session starts AT the tied pair, so
    # the islands sum must keep (ts, event_id) order for the tied rows
    boundary = t0 + dt.timedelta(minutes=31)
    rows = []
    for uid in range(20):
        rows.append((uid * 100 + 1, t0, uid))
        rows.append((uid * 100 + 2, boundary, uid))  # tied pair opening
        rows.append((uid * 100 + 3, boundary, uid))  # the second session
        rows.append((uid * 100 + 4, boundary + dt.timedelta(minutes=5), uid))
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    sf_dir = str(tmp_path)
    pq.write_table(tbl, os.path.join(sf_dir, "events.parquet"))

    sdf = q_session_window_agg(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * "
        f"FROM '{sf_dir}/events.parquet'"
    )
    odf = con.execute(SQL_SESSION_WINDOW_AGG).df()
    assert len(sdf) == len(odf) == 40  # two sessions per user
    hs, _ = canon(sdf)
    ho, _ = canon(odf)
    assert hs == ho


def test_session_window_exact_gap_boundary_merges(spark, tmp_path):
    # probed Spark semantics (r3): an event at exactly last + gap MERGES
    # into the open session — the oracle's island rule is diff > gap, not
    # >= gap (latent r2 bug never hit by random data)
    import duckdb

    from document_ai_spark.queries import (
        SQL_SESSION_WINDOW_AGG,
        q_session_window_agg,
    )

    t0 = dt.datetime(2026, 1, 1, 10, 0, 0)
    rows = [(1, t0, 7), (2, t0 + dt.timedelta(minutes=30), 7)]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    sf_dir = str(tmp_path)
    pq.write_table(tbl, os.path.join(sf_dir, "events.parquet"))
    sdf = q_session_window_agg(spark, sf_dir).toPandas()
    assert len(sdf) == 1 and int(sdf.n_events.iloc[0]) == 2
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    odf = con.execute(SQL_SESSION_WINDOW_AGG).df()
    assert len(odf) == 1 and int(odf.n_events.iloc[0]) == 2
