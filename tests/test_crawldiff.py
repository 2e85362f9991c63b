"""Crawl snapshot diffing + the packing property fuzz (both r4
incremental-pipeline bookkeeping ops)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from document_ai_spark.operators.crawldiff import (
    crawl_diff,
    diff_counts,
    refresh_targets,
)


def test_crawl_diff_statuses(spark):
    old = spark.createDataFrame(
        [("u/1", "alpha"), ("u/2", "beta"), ("u/3", "gamma"),
         ("u/4", None)],
        "url string, main_text string",
    )
    new = spark.createDataFrame(
        [("u/2", "beta"), ("u/3", "GAMMA2"), ("u/4", ""), ("u/5", "new")],
        "url string, main_text string",
    )
    d = {r.url: r.status for r in crawl_diff(old, new).collect()}
    assert d == {
        "u/1": "removed",
        "u/2": "unchanged",
        "u/3": "changed",
        "u/4": "unchanged",  # NULL and '' hash alike (coalesce policy)
        "u/5": "added",
    }
    targets = {r.url for r in refresh_targets(old, new).collect()}
    assert targets == {"u/3", "u/5"}
    counts = {r.status: r.n for r in diff_counts(old, new).collect()}
    assert counts == {
        "removed": 1, "unchanged": 2, "changed": 1, "added": 1
    }


def test_crawl_diff_collapses_recrawled_urls(spark):
    """Re-crawled urls (duplicate rows per snapshot) must collapse to
    ONE diff row per url (r4 ADVICE: the raw full-outer join
    cross-paired k_old x k_new rows). Two identical snapshots each
    carrying a url twice report it 'unchanged' exactly once; a url
    whose SET of crawled contents changed reports 'changed' once."""
    old = spark.createDataFrame(
        [("u/1", "a"), ("u/1", "b"), ("u/2", "x"), ("u/2", "y")],
        "url string, main_text string",
    )
    same = spark.createDataFrame(
        # same content sets, different crawl order
        [("u/1", "b"), ("u/1", "a"), ("u/2", "y"), ("u/2", "x")],
        "url string, main_text string",
    )
    rows = crawl_diff(old, same).collect()
    assert len(rows) == 2
    assert {r.url: r.status for r in rows} == {
        "u/1": "unchanged", "u/2": "unchanged"
    }
    new = spark.createDataFrame(
        [("u/1", "a"), ("u/1", "CHANGED"), ("u/2", "x"), ("u/2", "y")],
        "url string, main_text string",
    )
    rows = crawl_diff(old, new).collect()
    assert {r.url: r.status for r in rows} == {
        "u/1": "changed", "u/2": "unchanged"
    }
    counts = {r.status: r.n for r in diff_counts(old, new).collect()}
    assert counts == {"changed": 1, "unchanged": 1}
    # refresh_targets re-extracts EVERY row of a changed url
    assert {(r.url, r.main_text)
            for r in refresh_targets(old, new).collect()} == {
        ("u/1", "a"), ("u/1", "CHANGED")
    }


def test_refresh_targets_passthrough_columns(spark):
    old = spark.createDataFrame(
        [("u/1", "x", 1)], "url string, main_text string, extra int"
    )
    new = spark.createDataFrame(
        [("u/1", "y", 2), ("u/2", "z", 3)],
        "url string, main_text string, extra int",
    )
    rows = refresh_targets(old, new).orderBy("url").collect()
    assert [(r.url, r.main_text, r.extra) for r in rows] == [
        ("u/1", "y", 2), ("u/2", "z", 3)
    ]


def test_diff_cli(spark, tmp_path, capsys):
    import json

    from document_ai_spark.__main__ import main

    old = spark.createDataFrame(
        [("u/1", b"aaa"), ("u/2", b"bbb")], "url string, html binary"
    )
    new = spark.createDataFrame(
        [("u/2", b"BBB"), ("u/3", b"ccc")], "url string, html binary"
    )
    po, pn = str(tmp_path / "old"), str(tmp_path / "new")
    old.write.parquet(po)
    new.write.parquet(pn)
    tgt = str(tmp_path / "targets")
    rc = main(["diff", "--old", po, "--new", pn, "--targets", tgt])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["counts"] == {"removed": 1, "changed": 1, "added": 1}
    assert res["targets"] == 2
    assert {r.url for r in spark.read.parquet(tgt).collect()} == {
        "u/2", "u/3"
    }


@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=40), min_size=1,
             max_size=60),
    st.integers(min_value=16, max_value=64),
)
def test_pack_sequences_invariants_fuzz(spark, chunk_widths, pack_words):
    """For arbitrary chunk widths and budgets: completeness, the
    stream-cut budget bound, and per-pack contiguity all hold."""
    from document_ai_spark.operators.chunking import pack_sequences

    chunks = spark.createDataFrame(
        [(i, w) for i, w in enumerate(chunk_widths)],
        "doc_id long, chunk_words int",
    )
    got = pack_sequences(chunks, pack_words=pack_words, n_groups=4)
    rows = got.collect()
    assert sorted(r.doc_id for r in rows) == sorted(
        range(len(chunk_widths))
    )
    by_pack: dict[tuple, list] = {}
    for r in rows:
        by_pack.setdefault((r.pack_group, r.pack_no), []).append(r)
    bound = pack_words + max(chunk_widths) - 1
    for members in by_pack.values():
        assert sum(m.chunk_words for m in members) <= bound
        assert sorted(m.pack_seq for m in members) == list(
            range(len(members))
        )
