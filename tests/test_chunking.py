"""Document chunking: exact window math, overlap reconstruction, plan
purity (no Python eval nodes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_ai_spark.operators.chunking import chunk_documents


def test_chunk_exact_windows(spark):
    words = [f"w{i}" for i in range(10)]
    df = spark.createDataFrame([(1, " ".join(words))],
                               "doc_id long, text string")
    got = sorted(
        chunk_documents(df, max_words=4, overlap=1).collect(),
        key=lambda r: r.chunk_no,
    )
    # stride 3, n_chunks = ceil((10-1)/3) = 3
    assert [r.chunk_text.split(" ") for r in got] == [
        words[0:4], words[3:7], words[6:10],
    ]
    assert [r.chunk_words for r in got] == [4, 4, 4]
    assert all(r.n_chunks == 3 for r in got)


def test_chunk_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    got = chunk_documents(df, max_words=512, overlap=64).collect()
    assert len(got) == 1
    assert got[0].chunk_text == "a b c" and got[0].chunk_words == 3


def test_chunk_tail_shorter_and_coverage(spark):
    words = [f"t{i}" for i in range(11)]
    df = spark.createDataFrame([(1, " ".join(words))],
                               "doc_id long, text string")
    got = sorted(
        chunk_documents(df, max_words=4, overlap=0).collect(),
        key=lambda r: r.chunk_no,
    )
    # stride 4: [0:4] [4:8] [8:11] — no word lost, tail shorter
    assert [r.chunk_words for r in got] == [4, 4, 3]
    reassembled = []
    for r in got:
        reassembled.extend(r.chunk_text.split(" "))
    assert reassembled == words


def test_chunk_validation_and_purity(spark):
    with pytest.raises(ValueError):
        chunk_documents(spark.range(1).withColumn("text", F.lit("x")),
                        id_col="id", max_words=4, overlap=4)
    df = spark.createDataFrame([(1, "a b c d e")],
                               "doc_id long, text string")
    plan = (
        chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_chunk_corpus_scale_counts(spark):
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    chunks = chunk_documents(d, max_words=50, overlap=10)
    per_doc = chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("k"), F.first("n_chunks").alias("n")
    )
    assert per_doc.filter("k != n").count() == 0  # emitted == declared
    assert chunks.filter("chunk_words > 50").count() == 0
