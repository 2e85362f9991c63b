"""Contract tests for the Iceberg/parquet IO seam (sources/io.py): the
capability probe is mocked BOTH ways, so each branch's dispatch contract
is pinned even though no Iceberg runtime jar ships in this sandbox.

When a real catalog is present the Iceberg branch must route table names
to writeTo(...).overwritePartitions() / .append() and format("iceberg")
reads; when absent, everything must fall back to the parquet layout and
path-like targets must NEVER take the Iceberg branch."""

from __future__ import annotations

from unittest import mock

from document_ai_spark.sources import io as IO


class _WriteToRecorder:
    """Stands in for DataFrameWriterV2."""

    def __init__(self, calls):
        self.calls = calls

    def overwritePartitions(self):
        self.calls.append("overwritePartitions")

    def append(self):
        self.calls.append("append")


def test_probe_false_without_jars(spark):
    # this sandbox genuinely has no Iceberg runtime: the probe must say no
    assert IO.iceberg_available(spark) is False


def test_iceberg_branch_dispatch(spark, tmp_path):
    calls = []
    df = spark.range(3).withColumnRenamed("id", "v")
    with mock.patch.object(IO, "iceberg_available", return_value=True), \
         mock.patch.object(
             type(df), "writeTo",
             lambda self, tgt: calls.append(("writeTo", tgt))
             or _WriteToRecorder(calls),
         ):
        IO.write_extracted(df, "cat.db.extracted")
        IO.write_extracted(df, "cat.db.extracted",
                           overwrite_partitions=False)
        IO.append_rows(df, "cat.db.lineage")
    assert calls == [
        ("writeTo", "cat.db.extracted"), "overwritePartitions",
        ("writeTo", "cat.db.extracted"), "append",
        ("writeTo", "cat.db.lineage"), "append",
    ]


def test_iceberg_read_dispatch(spark):
    loaded = []

    class _Reader:
        def format(self, fmt):
            loaded.append(fmt)
            return self

        def load(self, name):
            loaded.append(name)
            return "SENTINEL"

    with mock.patch.object(IO, "iceberg_available", return_value=True), \
         mock.patch.object(
             type(spark), "read", property(lambda self: _Reader())
         ):
        assert IO.read_pages(spark, "cat.db.pages") == "SENTINEL"
    assert loaded == ["iceberg", "cat.db.pages"]


def test_path_targets_never_take_iceberg_branch(spark, tmp_path):
    """A '/'-containing target is a filesystem path: even with a catalog
    present it must use the parquet fallback."""
    df = spark.range(4).withColumnRenamed("id", "v")
    out = str(tmp_path / "t")
    with mock.patch.object(IO, "iceberg_available", return_value=True):
        IO.write_extracted(df, out, partition_cols=None)
        assert spark.read.parquet(out).count() == 4
        IO.append_rows(df, out)
        assert spark.read.parquet(out).count() == 8


def test_parquet_fallback_when_probe_false(spark, tmp_path):
    df = spark.range(5).withColumnRenamed("id", "v")
    out = str(tmp_path / "fb")
    with mock.patch.object(IO, "iceberg_available", return_value=False):
        IO.write_extracted(df, out)
        assert spark.read.parquet(out).count() == 5
