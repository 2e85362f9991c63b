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


def test_lang_id_discriminates_real_text(spark):
    from document_ai_spark.queries_ml import _LANG_PATTERNS  # noqa: F401
    import tempfile, os
    import pyarrow as pa, pyarrow.parquet as pq

    rows = [
        (1, "the cat and the dog sat in the garden of the house", "en"),
        (2, "der Hund und die Katze sind nicht in das Haus gegangen", "de"),
        (3, "le chat et les chiens sont dans une des maisons", "fr"),
        (4, "los gatos y el perro de una casa que ladra por la noche", "es"),
        (5, "这是一个中文句子 有很多汉字在里面", "zh"),
    ]
    td = tempfile.mkdtemp()
    pq.write_table(
        pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": [r[1] for r in rows],
            "lang": [r[2] for r in rows],
            "source": ["t"] * 5,
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }),
        os.path.join(td, "documents.parquet"),
    )
    from document_ai_spark.queries_ml import q_lang_id

    got = {r.doc_id: r.pred_lang for r in q_lang_id(spark, td).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "zh"}


def test_winnow_fingerprint_properties(spark):
    from document_ai_spark.queries_ml import _winnow_np

    def fps(s):
        pos, fp = _winnow_np(s)
        return fp.tolist()

    a = fps("the quick brown fox jumps over the lazy dog")
    b = fps("the quick brown fox jumps over the lazy dog")
    assert a and a == b  # deterministic
    # local change only perturbs nearby fingerprints (winnowing locality)
    c = fps("the quick brown fox jumps over the hazy dog")
    overlap = len(set(a) & set(c)) / len(set(a))
    assert overlap > 0.4
    assert fps("short") == []


def test_curate_rules_selection(spark):
    """kept_filter applies exactly the selected rules and skips rules whose
    flag column is absent (lang without ground truth)."""
    from document_ai_spark.operators.curate import (
        curation_flags,
        funnel_counts,
        kept_filter,
    )

    df = spark.createDataFrame(
        [
            (1, "the data and the words flow to the end of it " * 6),
            (2, "the data and the words flow to the end of it " * 6),  # dup
            (3, "short text"),
        ],
        ["doc_id", "text"],
    )
    flags = curation_flags(df, lang_col=None)
    assert "pass_lang" not in flags.columns
    all_kept = {r.doc_id for r in kept_filter(flags).collect()}
    assert all_kept == {1}  # dup dropped, short doc fails quality/gopher
    dq = {r.doc_id
          for r in kept_filter(flags, ("dedup", "quality")).collect()}
    assert dq == {1}
    d_only = {r.doc_id for r in kept_filter(flags, ("dedup",)).collect()}
    assert d_only == {1, 3}
    row = funnel_counts(flags).collect()[0]
    assert (row.total_docs, row.after_dedup, row.kept) == (3, 2, 1)


def test_stream_extract_with_dedup_horizon(spark, tmp_path):
    """ingest --dedup-horizon: a re-delivered identical page is extracted
    only once; a changed page is re-extracted."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    t0 = dt.datetime(2026, 1, 1, 10, 0, 0, tzinfo=dt.timezone.utc)

    def batch(name, rows, mtime):
        path = os.path.join(in_dir, name)
        pq.write_table(
            pa.table(
                {
                    "url": [r[0] for r in rows],
                    "warc_ts": pa.array(
                        [r[1] for r in rows], pa.timestamp("us", tz="UTC")
                    ),
                    "html": pa.array([r[2] for r in rows], pa.binary()),
                    "text": [""] * len(rows),
                    "lang": ["en"] * len(rows),
                }
            ),
            path,
        )
        os.utime(path, (mtime, mtime))

    html = b"<html><body><p>alpha beta gamma delta epsilon zeta eta " \
           b"theta iota kappa lambda mu</p></body></html>"
    batch("b1.parquet", [("u/a", t0, html)], 1_700_000_000)
    batch("b2.parquet", [
        ("u/a", t0 + dt.timedelta(minutes=1), html),        # re-fetch
        ("u/a", t0 + dt.timedelta(minutes=2), html + b"<p>v2</p>"),
    ], 1_700_000_100)

    q = stream_extract(spark, in_dir, out_dir, ckpt,
                       max_files_per_trigger=1, dedup_horizon="1 hour")
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    assert got.count() == 2  # original + changed, re-fetch dropped
    assert got.select("url").distinct().count() == 1
