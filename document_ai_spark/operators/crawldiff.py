"""Crawl snapshot diffing: what changed between two crawls of the same
corpus — the bookkeeping an incremental pipeline runs before deciding
what to re-extract, re-curate and re-shard.

Pure relational: full outer join on url with content-hash comparison.
One shuffle on the (uniform) url key; the text hash is computed on each
side's single scan, so giant text columns never travel twice.

Statuses: 'added' (new url), 'removed' (url gone), 'changed' (content
hash differs), 'unchanged'. `refresh_targets` is the composition every
incremental run wants: the added+changed slice of the NEW snapshot —
exactly the rows worth paying extraction/curation for again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _content_hash(df: DataFrame, content_col: str) -> F.Column:
    """md5 of the content column — string columns encode as UTF-8,
    binary columns (e.g. raw `html`) hash directly; NULL hashes like
    empty."""
    from pyspark.sql import types as T

    if isinstance(df.schema[content_col].dataType, T.BinaryType):
        return F.md5(F.coalesce(F.col(content_col), F.lit(b"")))
    return F.md5(
        F.encode(F.coalesce(F.col(content_col), F.lit("")), "UTF-8")
    )


def crawl_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "url",
    content_col: str = "main_text",
) -> DataFrame:
    """-> (id, status, old_hash, new_hash)."""
    oh = old.select(
        F.col(id_col).alias("_id"),
        _content_hash(old, content_col).alias("old_hash"),
    )
    nh = new.select(
        F.col(id_col).alias("_id"),
        _content_hash(new, content_col).alias("new_hash"),
    )
    status = (
        F.when(F.col("old_hash").isNull(), "added")
        .when(F.col("new_hash").isNull(), "removed")
        .when(F.col("old_hash") != F.col("new_hash"), "changed")
        .otherwise("unchanged")
    )
    return oh.join(nh, "_id", "full_outer").select(
        F.col("_id").alias(id_col),
        status.alias("status"),
        "old_hash",
        "new_hash",
    )


def refresh_targets(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "url",
    content_col: str = "main_text",
) -> DataFrame:
    """Rows of `new` whose content is new or changed since `old` — the
    slice an incremental run re-processes (left-semi against the diff,
    so the new snapshot's columns pass through untouched)."""
    d = crawl_diff(old, new, id_col, content_col)
    keys = d.filter(
        F.col("status").isin("added", "changed")
    ).select(F.col(id_col))
    return new.join(keys, id_col, "left_semi")


def diff_counts(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "url",
    content_col: str = "main_text",
) -> DataFrame:
    """One row per status with counts — the crawl-health dashboard
    number ('this crawl churned 12% of the corpus')."""
    return (
        crawl_diff(old, new, id_col, content_col)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
    )
