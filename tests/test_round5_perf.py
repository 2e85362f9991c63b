"""Round-5 perf-change regression tests: the adaptive recrawl collapse
(identity vs materialized modes + crash-resume reuse) and the MinHash
per-doc shingle dedup (signature invariance vs the old global-distinct
construction)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from document_ai_spark.queries_base import (
    _norm_words,
    _shingles,
    minhash_band_pairs,
)


def test_adaptive_collapse_identity_for_unique_ids(spark, tmp_path):
    """url-unique input must skip the collapse window entirely: mode
    'identity', rows pass through untouched, and nothing is written to
    the materialize dir (the common recrawl-free shard pays zero)."""
    from document_ai_spark.operators.curate import adaptive_collapse

    src = str(tmp_path / "extracted")
    spark.createDataFrame(
        [(f"u{i}", f"2026-01-0{i + 1}", f"text {i}") for i in range(5)],
        "url string, warc_ts string, main_text string",
    ).write.parquet(src)
    mat = str(tmp_path / "collapsed")
    out, mode = adaptive_collapse(spark, src, mat)
    assert mode == "identity"
    assert out.count() == 5
    assert not os.path.exists(mat)


def test_adaptive_collapse_materializes_once_and_resumes(spark, tmp_path):
    """Input WITH recrawls pays the window exactly once: the collapsed
    table lands in the materialize dir with a _SUCCESS commit, keeps
    the NEWEST crawl per url, and a second call (crash-resume between
    the collapse write and the curated write) reuses the files instead
    of recomputing."""
    from document_ai_spark.operators.curate import adaptive_collapse

    src = str(tmp_path / "extracted")
    spark.createDataFrame(
        [
            ("u0", "2026-01-01", "old crawl"),
            ("u0", "2026-01-09", "new crawl"),
            ("u1", "2026-01-02", "only crawl"),
        ],
        "url string, warc_ts string, main_text string",
    ).write.parquet(src)
    mat = str(tmp_path / "collapsed")
    out, mode = adaptive_collapse(spark, src, mat)
    assert mode == "materialized"
    rows = {r.url: r.main_text for r in out.collect()}
    assert rows == {"u0": "new crawl", "u1": "only crawl"}
    marker = os.path.join(mat, "_SUCCESS")
    assert os.path.exists(marker)
    stamp = os.stat(marker).st_mtime_ns
    out2, mode2 = adaptive_collapse(spark, src, mat)
    assert mode2 == "materialized"
    assert os.stat(marker).st_mtime_ns == stamp  # no rewrite
    assert {r.url: r.main_text for r in out2.collect()} == rows


def test_adaptive_collapse_checkpoints_without_workdir(spark, tmp_path):
    """Callers with no workdir (the curate CLI) omit materialize_dir:
    recrawled input still collapses to one newest row per url, paid
    once via localCheckpoint — mode 'checkpointed', nothing on disk."""
    from document_ai_spark.operators.curate import adaptive_collapse

    src = str(tmp_path / "extracted")
    spark.createDataFrame(
        [
            ("u0", "2026-01-01", "old crawl"),
            ("u0", "2026-01-09", "new crawl"),
            ("u1", "2026-01-02", "only crawl"),
        ],
        "url string, warc_ts string, main_text string",
    ).write.parquet(src)
    out, mode = adaptive_collapse(spark, src)
    assert mode == "checkpointed"
    assert {r.url: r.main_text for r in out.collect()} == {
        "u0": "new crawl", "u1": "only crawl"
    }


def test_parquet_rows_directory_glob(spark, tmp_path):
    """_parquet_rows must mirror spark.read.parquet's path semantics for
    globs that match DIRECTORIES (e.g. 'extracted/shard_id=*'), not just
    files — a 0 here silently defeats adaptive_collapse's identity skip
    and corrupts summary counts."""
    import glob as _glob

    from document_ai_spark.pipeline import _parquet_rows

    base = str(tmp_path / "extracted")
    df = spark.createDataFrame(
        [(f"u{i}", i % 2) for i in range(10)], "url string, shard_id int"
    )
    df.write.partitionBy("shard_id").parquet(base)
    pat = os.path.join(base, "shard_id=*")
    assert len(_glob.glob(pat)) == 2  # the glob matches directories
    assert _parquet_rows(pat) == 10
    assert _parquet_rows(base) == 10


def test_pipeline_summary_reports_collapse_mode(spark, corpus_dir, tmp_path):
    """The curate stage summary must say which collapse branch ran —
    'identity' for a url-unique pages table (the datagen corpus)."""
    from document_ai_spark.pipeline import run_pipeline

    pages = str(tmp_path / "pages")
    (
        spark.read.parquet(os.path.join(corpus_dir, "pages.parquet"))
        .orderBy("url").limit(12).write.parquet(pages)
    )
    summary = run_pipeline(
        spark,
        pages,
        str(tmp_path / "wd"),
        str(tmp_path / "out"),
        rules=("dedup", "quality"),
        n_shards=2,
        shards_per_commit=2,
    )
    assert summary["stages"]["curate"]["collapse"] == "identity"
    assert summary["stages"]["curate"]["docs_in"] == 12


def test_minhash_per_doc_distinct_matches_global_distinct(spark):
    """The r5 shuffle cut (array_distinct per doc, no global .distinct()
    on exploded shingle rows) must be value-invariant: MIN over a
    multiset equals MIN over its distinct set. Compare full signatures
    against the OLD construction on docs built to carry heavy repeated
    shingles (both within and across docs)."""
    phrase = "alpha beta gamma delta"
    docs = spark.createDataFrame(
        [
            (1, " ".join([phrase] * 10)),          # self-repeating
            (2, phrase),                            # subset, shared
            (3, phrase + " epsilon " + phrase),     # repeats + extras
            (4, "zeta eta"),                        # < 3 words: no rows
        ],
        "doc_id long, text string",
    )

    def _sigs(sh):
        aggs = [
            F.min(
                F.md5(F.encode(F.concat_ws(":", F.lit(str(j)), "shingle"),
                               "UTF-8"))
            ).alias(f"mh_{j}")
            for j in range(8)
        ]
        return {
            r.doc_id: tuple(r[f"mh_{j}"] for j in range(8))
            for r in sh.groupBy("doc_id").agg(*aggs).collect()
        }

    base = docs.withColumn("words", _norm_words())
    old = _sigs(
        base.select(
            "doc_id", F.explode(_shingles(F.col("words"))).alias("shingle")
        ).distinct()
    )
    new = _sigs(
        base.select(
            "doc_id",
            F.explode(F.array_distinct(_shingles(F.col("words")))).alias(
                "shingle"
            ),
        )
    )
    assert old == new and set(old) == {1, 2, 3}

    pairs = {
        (r.doc_a, r.doc_b)
        for r in minhash_band_pairs(docs).collect()
    }
    assert (1, 2) in pairs  # shared-phrase docs still collide


def test_bucket_pair_generation_matches_join_form(spark):
    """The r5 single-scan pair builder (band-bucket collect_set +
    upper-triangle explode, replacing the aliased self-join that
    re-evaluated the whole signature pipeline per side) must emit the
    IDENTICAL pair set the join form produced, with doc_a < doc_b, on
    string ids (the curate path is url-keyed) and bucket sizes > 2
    (the triangle explode must cover every combination, not just
    adjacent ids)."""
    group = {
        "a": ("red orange yellow green blue indigo violet crimson "
              "amber teal magenta cyan maroon olive navy", 4),
        "b": ("lorem ipsum dolor sit amet consectetur adipiscing elit "
              "sed do eiusmod tempor incididunt ut labore", 3),
        "c": ("solo document with its very own vocabulary nothing "
              "shared anywhere else across the corpus rows", 1),
    }
    rows = [
        (f"{g}-{i:02d}", text)
        for g, (text, k) in group.items()
        for i in range(k)
    ]
    df = spark.createDataFrame(rows, "url string, body string")
    got = {
        (r.doc_a, r.doc_b)
        for r in minhash_band_pairs(
            df, id_col="url", text_col="body"
        ).collect()
    }
    expected = {
        (f"{g}-{i:02d}", f"{g}-{j:02d}")
        for g, (_, k) in group.items()
        for i in range(k)
        for j in range(i + 1, k)
    }
    assert got == expected  # 6 pairs in a, 3 in b, none for c or cross
    assert all(x < y for x, y in got)
