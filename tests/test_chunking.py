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


def test_pack_sequences_budget_and_completeness(spark):
    from document_ai_spark.operators.chunking import (
        chunk_documents,
        pack_sequences,
    )

    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(20 + (i * 7) % 90)))
        for i in range(300)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    chunks = chunk_documents(docs, max_words=32, overlap=4)
    packed = pack_sequences(chunks, pack_words=128, n_groups=8)
    got = packed.collect()
    # completeness: every chunk appears exactly once
    assert len(got) == chunks.count()
    assert len({(r.doc_id, r.chunk_no) for r in got}) == len(got)
    # budget: stream-cut bound pack_words + max_chunk - 1
    from collections import defaultdict

    totals = defaultdict(int)
    seqs = defaultdict(list)
    for r in got:
        totals[(r.pack_group, r.pack_no)] += r.chunk_words
        seqs[(r.pack_group, r.pack_no)].append(r.pack_seq)
    assert all(t <= 128 + 32 - 1 for t in totals.values())
    # most packs are well filled (stream-cut leaves only boundary slack)
    filled = [t for t in totals.values()]
    assert sum(f >= 96 for f in filled) > len(filled) * 0.6
    # pack_seq is contiguous from 0 inside each pack
    assert all(sorted(s) == list(range(len(s))) for s in seqs.values())


def test_pack_sequences_deterministic(spark):
    from document_ai_spark.operators.chunking import pack_sequences

    rows = [(i, 10 + i % 23) for i in range(500)]
    chunks = spark.createDataFrame(rows, ["doc_id", "chunk_words"])
    a = sorted(
        (r.doc_id, r.pack_group, r.pack_no, r.pack_seq)
        for r in pack_sequences(chunks, pack_words=64).collect()
    )
    b = sorted(
        (r.doc_id, r.pack_group, r.pack_no, r.pack_seq)
        for r in pack_sequences(chunks, pack_words=64).collect()
    )
    assert a == b


def test_chunk_passthrough_cols_both_units(spark):
    """passthrough_cols (r5) carries per-doc metadata onto every chunk
    row in-plan — the pipeline rides warc_ts through instead of a
    join-back — in BOTH budget units, without touching the default
    (oracle-checked) schema."""
    from document_ai_spark.functions.subword import learn_bpe

    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10)), "t1"),
         (2, "a b c", "t2")],
        "doc_id long, text string, ts string",
    )
    got = chunk_documents(
        df, max_words=4, overlap=1, passthrough_cols=("ts",)
    ).collect()
    assert {(r.doc_id, r.ts) for r in got} == {(1, "t1"), (2, "t2")}
    assert len([r for r in got if r.doc_id == 1]) == 3
    # default schema unchanged
    assert "ts" not in chunk_documents(df, max_words=4, overlap=1).columns
    merges = learn_bpe(df, text_col="text", n_merges=8)
    sub = chunk_documents(
        df, max_words=6, overlap=0, unit="subwords", merges=merges,
        passthrough_cols=("ts",),
    ).collect()
    assert {(r.doc_id, r.ts) for r in sub} == {(1, "t1"), (2, "t2")}
    # same chunk text with and without the passthrough
    base = chunk_documents(
        df, max_words=6, overlap=0, unit="subwords", merges=merges
    ).collect()
    key = lambda rows: sorted((r.doc_id, r.chunk_no, r.chunk_text)
                              for r in rows)
    assert key(sub) == key(base)
