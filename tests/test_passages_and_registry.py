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


def _mkpassage(seed: str, n: int) -> str:
    """n words of synthetic vocabulary that cannot collide with any
    test prose (hex-ish nonsense words)."""
    import hashlib

    return " ".join(
        hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:7]
        for i in range(n)
    )


def test_excise_shared_passages_byte_exact(spark):
    """The planted passage (plus the byte-identical spaces flanking it)
    is cut EXACTLY from every non-keeper doc: clean_text equals the
    constructed complement byte for byte, and the keeper plus
    unrelated docs pass through untouched."""
    from document_ai_spark.operators.passages import excise_shared_passages

    p = _mkpassage("exact", 12)  # 12*8-1 = 95 chars >> MIN_SPAN
    pre0, post0 = "alpha bravo charlie delta echo", "golf hotel india"
    pre1, post1 = "nine eight seven six five four", "three two one zero"
    rows = [
        (0, f"{pre0} {p} {post0}"),
        (1, f"{pre1} {p} {post1}"),
        (2, "unrelated maritime navigation text with nothing shared"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in excise_shared_passages(docs).collect()}
    # keeper (min id) and the unrelated doc: untouched normalized text
    assert got[0].clean_text == rows[0][1]
    assert got[0].n_spans == 0
    assert got[2].clean_text == rows[2][1]
    # victim: the shared run is ' p ' (both flanking spaces are
    # byte-identical in both docs, the letters beyond differ) — the
    # complement glues the surrounding words, BYTE-exactly
    assert got[1].clean_text == f"{pre1}{post1}"
    assert got[1].n_spans == 1
    assert got[1].chars_removed == len(p) + 2


def test_excise_long_passage_bucket_merge(spark):
    """A passage much longer than MAX_EXTEND: anchors are kept per
    position bucket, each extends a bounded distance, and the
    gap-island union must recover the WHOLE run — clean_text is still
    the exact complement."""
    from document_ai_spark.operators.passages import (
        MAX_EXTEND,
        excise_shared_passages,
    )

    p = _mkpassage("long", 400)  # ~3200 chars >> MAX_EXTEND
    assert len(p) > 2 * MAX_EXTEND
    rows = [
        (0, f"start one {p} finish one"),
        (1, f"begin two {p} ending two"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in excise_shared_passages(docs).collect()}
    assert got[0].clean_text == rows[0][1]
    assert got[1].clean_text == "begin twoending two"
    assert got[1].n_spans == 1
    assert got[1].chars_removed == len(p) + 2


def test_excise_keep_first_chain(spark):
    """Three docs sharing the passage: the minimum id keeps it, both
    higher ids lose it."""
    from document_ai_spark.operators.passages import excise_shared_passages

    p = _mkpassage("chain", 12)
    rows = [
        (7, f"aa bb cc {p} dd ee"),
        (8, f"ff gg hh {p} ii jj"),
        (9, f"kk ll mm {p} nn oo"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in excise_shared_passages(docs).collect()}
    assert got[7].clean_text == rows[0][1] and got[7].n_spans == 0
    assert got[8].clean_text == "ff gg hhii jj"
    assert got[9].clean_text == "kk ll mmnn oo"


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
