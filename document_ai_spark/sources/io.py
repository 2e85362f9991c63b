"""Table IO behind one seam: Iceberg when available, parquet otherwise.

The north rule targets Iceberg tables; this sandbox has no Iceberg runtime
jars, so the layer keeps the Iceberg code path (`writeTo(...).append()`,
overwrite-by-filter) behind a capability probe and falls back to a parquet
layout with IDENTICAL schema and the same idempotency property:
dynamic-partition-overwrite on a `shard_id` partition column is the parquet
stand-in for Iceberg's overwrite-by-filter snapshot commit (SURVEY.md §2.11).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True iff an Iceberg catalog is configured and the runtime jar loads."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
    except Exception:
        return False
    return any(
        k.startswith("spark.sql.catalog.")
        for (k, _v) in spark.sparkContext.getConf().getAll()
    )


def read_pages(spark: SparkSession, source: str) -> DataFrame:
    """Read the pages table. `source` is an Iceberg table name (contains no
    '/') or a parquet file/dir path."""
    if "/" not in source and iceberg_available(spark):
        return spark.read.format("iceberg").load(source)
    if os.path.isdir(source) and not any(
        f.endswith(".parquet") for f in os.listdir(source)
    ):
        source = os.path.join(source, "pages.parquet")
    return spark.read.parquet(source)


def write_extracted(
    df: DataFrame,
    target: str,
    partition_cols: list[str] | None = None,
    overwrite_partitions: bool = True,
) -> None:
    """Write/commit the extracted table idempotently.

    Iceberg: ``writeTo(target).overwritePartitions()`` (snapshot-atomic).
    Parquet fallback: dynamic partition overwrite — only partitions present
    in `df` are replaced, so re-running a failed shard never duplicates rows.
    """
    spark = df.sparkSession
    if "/" not in target and iceberg_available(spark):
        w = df.writeTo(target)
        if overwrite_partitions:
            w.overwritePartitions()
        else:
            w.append()
        return
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    # Output-file sizing: the salt partition count is already size-aware
    # (TARGET_PARTITION_BYTES of raw html per task -> ~tens of MB parquet
    # per file); maxRecordsPerFile is the upper guard for pathological rows.
    writer = (
        df.write.mode("overwrite" if overwrite_partitions else "append")
        .option("maxRecordsPerFile", 1_000_000)
    )
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(target)


def append_rows(df: DataFrame, target: str) -> None:
    """Append-only log table (lineage/metrics). Iceberg append or parquet
    append — both are commit-atomic per job (FileOutputCommitter for the
    parquet path: uncommitted task files are never made visible)."""
    spark = df.sparkSession
    if "/" not in target and iceberg_available(spark):
        df.writeTo(target).append()
        return
    df.write.mode("append").parquet(target)
