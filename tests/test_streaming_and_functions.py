"""Structured-Streaming ingest (incremental, checkpointed) + scalar text
function tests."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from document_ai_spark.datagen import write_corpus
from document_ai_spark.functions.text import nfd_strip_accents
from document_ai_spark.streaming.ingest import stream_extract


def test_stream_extract_incremental(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    # batch 1: 60 docs
    stage = str(tmp_path / "stage1")
    write_corpus(stage, n_docs=60, seed=7)
    shutil.copy(
        os.path.join(stage, "pages.parquet"),
        os.path.join(in_dir, "batch1.parquet"),
    )
    q = stream_extract(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    assert got.count() == 60

    # batch 2 arrives (disjoint urls via index offset): only the new file
    # is processed (checkpoint resume)
    import pyarrow as pa
    import pyarrow.parquet as pq

    from document_ai_spark.datagen import gen_rows

    rows = gen_rows(40, seed=7, start=1000)
    pq.write_table(
        pa.table(
            {
                "url": [r.url for r in rows],
                "warc_ts": pa.array(
                    [r.warc_ts for r in rows],
                    type=pa.timestamp("us", tz="UTC"),
                ),
                "html": pa.array([r.html for r in rows], type=pa.binary()),
                "text": [r.text for r in rows],
                "lang": [r.lang for r in rows],
            }
        ),
        os.path.join(in_dir, "batch2.parquet"),
    )
    q2 = stream_extract(spark, in_dir, out_dir, ckpt)
    q2.awaitTermination(120)
    got2 = spark.read.parquet(out_dir)
    assert got2.count() == 100
    # no url processed twice across the two micro-batch runs
    assert got2.select("url").distinct().count() == 100

    # byte-identical invariant holds on the streamed output too
    golden = spark.read.parquet(os.path.join(stage, "golden_text.parquet"))
    j = got2.join(golden, "url")
    bad = j.filter(
        F.col("expected_text").isNotNull()
        & (F.col("main_text") != F.col("expected_text"))
    ).count()
    assert bad == 0


def test_nfd_strip_accents(spark):
    df = spark.createDataFrame(
        [("Kilométrage",), ("Restitué",), ("plain",), ("naïve çà",)],
        ["s"],
    )
    got = [r.o for r in df.select(nfd_strip_accents("s").alias("o")).collect()]
    assert got == ["Kilometrage", "Restitue", "plain", "naive ca"]
