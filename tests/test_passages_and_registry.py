"""Cross-doc shared-passage detection + the 50-entry registry invariant."""

from __future__ import annotations

import pytest


def test_shared_passage_pairs(spark):
    from pyspark.sql import functions as F

    from document_ai_spark.operators.passages import shared_passage_pairs
    from document_ai_spark.queries_text import _winnow_batches

    passage = (
        "the quick brown fox jumps over the lazy dog while the band "
        "plays a slow waltz in the crowded station hall tonight"
    )
    uniq = [
        "completely different text about maritime navigation beacons "
        "and the handling of cargo manifests in winter storms",
        "a third unrelated document describing orchard grafting and "
        "seasonal pruning schedules for quince and medlar trees",
    ]
    rows = [
        (1, "intro words here " + passage + " trailing remarks"),
        (2, "other opening " + passage + " different ending text"),
        (3, uniq[0]),
        (4, uniq[1]),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, t string")
    fps = docs.mapInPandas(
        _winnow_batches,
        schema="doc_id long, pos long, fingerprint long",
    )
    pairs = shared_passage_pairs(fps, min_shared=2).collect()
    assert [(r.doc_a, r.doc_b) for r in pairs] == [(1, 2)]
    assert pairs[0].n_shared >= 2


def test_shared_passage_stop_fingerprints_dropped(spark):
    from document_ai_spark.operators.passages import shared_passage_pairs

    # a fingerprint present in every doc is boilerplate: with
    # max_doc_freq below the corpus size it must not create pairs
    rows = [(d, 999) for d in range(10)] + [(1, 5), (2, 5), (1, 6), (2, 6)]
    fps = spark.createDataFrame(
        [(d, 0, f) for d, f in rows], "doc_id long, pos long, fingerprint long"
    )
    pairs = shared_passage_pairs(fps, min_shared=2, max_doc_freq=5).collect()
    assert [(r.doc_a, r.doc_b, r.n_shared) for r in pairs] == [(1, 2, 2)]


def test_registry_cap_and_full_oracle_coverage():
    """The driver gate records ~50 entries: the registry must stay at
    EXACTLY 50, every entry must have an oracle, and no oracle may be
    orphaned (COVERAGE.md documents the consolidation)."""
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert len(q) == 50, f"registry has {len(q)} entries — keep the cap"
    assert set(o) == set(q), (
        "oracle/registry mismatch: "
        f"missing={sorted(set(q) - set(o))} orphan={sorted(set(o) - set(q))}"
    )
    assert all(callable(fn) for fn in q.values())
    assert all(isinstance(s, str) and s.strip() for s in o.values())
