"""Round-6 optimization guards: adaptive scan fan-out (queries_base.
scan_fanout) and the session-creation warmup (session._warm_session)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_ai_spark import queries_base
from document_ai_spark.queries_base import scan_fanout

SF = "/root/testdata/sf0.001"


def test_fanout_triggers_on_single_split_scan(spark):
    """A one-file one-row-group table scans as a single task; fan-out
    must repartition it to FANOUT_FACTOR * parallelism."""
    d = spark.read.parquet(f"{SF}/documents.parquet")
    assert d.rdd.getNumPartitions() == 1
    par = spark.sparkContext.defaultParallelism
    fanned = scan_fanout(d)
    assert (
        fanned.rdd.getNumPartitions()
        == queries_base.FANOUT_FACTOR * par
    )


def test_fanout_noop_on_already_parallel_input(spark):
    """Inputs that already give the scan >= 2x-parallelism granularity
    must NOT pay a repartition."""
    par = spark.sparkContext.defaultParallelism
    wide = spark.range(1000).repartition(2 * par)
    assert scan_fanout(wide, key="id") is wide


def test_fanout_noop_past_byte_cap(spark, monkeypatch):
    """The fan-out is a small-input fix: past the per-core byte cap the
    extra full-data shuffle is skipped (scale-adaptive posture)."""
    monkeypatch.setattr(queries_base, "FANOUT_MAX_BYTES_PER_SLOT", 0)
    d = spark.read.parquet(f"{SF}/documents.parquet")
    assert scan_fanout(d) is d


def test_fanout_preserves_rows(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang"
    )
    base = sorted((r.doc_id, r.lang) for r in d.collect())
    fanned = sorted(
        (r.doc_id, r.lang) for r in scan_fanout(d).collect()
    )
    assert fanned == base


def test_fanout_key_accepts_column_expression(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    fanned = scan_fanout(d, key=F.col("doc_id") % 7)
    assert fanned.count() == d.count()


def test_session_is_warmed_once(spark):
    """get_spark marks the session after the one-time warmup so repeat
    calls (getOrCreate returns the same session) never re-run it."""
    assert getattr(spark, "_das_warmed", False) is True


def test_warm_session_is_nonfatal_on_broken_session(spark):
    """_warm_session must never raise — a failed warmup is a no-op."""
    from document_ai_spark.session import _warm_session

    class Broken:
        @property
        def sparkContext(self):  # pragma: no cover - attribute access
            raise RuntimeError("boom")

    _warm_session(Broken())  # must not raise


@pytest.mark.parametrize("query", ["simhash", "next_right_word_2d"])
def test_rewritten_queries_still_match_duckdb(spark, query):
    """Belt-and-braces on the two restructured headline queries: the
    round-6 rewrites (two-conv simhash bit read, broadcast key-box
    next-right) must stay value-identical to their DuckDB oracles at
    sf0.001 (the full gate runs at sf0.01 via scripts/check_oracle)."""
    import duckdb

    import __spark_entry__ as entrymod
    from scripts.check_oracle import TABLES, canon

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    sdf = entrymod.queries()[query](spark, SF).toPandas()
    odf = con.execute(entrymod.oracle_sql()[query]).df()
    assert len(sdf) == len(odf)
    assert canon(sdf)[0] == canon(odf)[0]
