"""Deterministic corpus-learned BPE: merge learning, encode, per-doc
counts, and subword-budgeted chunking/packing (r5 — the loader-true
token unit)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_ai_spark.functions.subword import (
    EOW,
    encode_word,
    learn_bpe,
    piece_count,
    subword_token_counts,
)


def test_learn_bpe_deterministic_and_expected(spark):
    df = spark.createDataFrame(
        [(0, "low low low lower lowest")], ["doc_id", "text"]
    )
    m1 = learn_bpe(df, n_merges=5)
    m2 = learn_bpe(df, n_merges=5)
    assert m1 == m2
    # ('l','o') and ('o','w') both occur 5 times; the deterministic
    # tie-break is the lexicographically smallest pair
    assert m1[0] == ("l", "o")
    assert m1[1] == ("lo", "w")
    # after 'low' forms, ('low', EOW) occurs 3 times and wins
    assert m1[2] == ("low", EOW)


def test_encode_word_and_piece_count():
    # no merges: every char is a piece, the bare EOW does not count
    assert piece_count("abc", {}) == 3
    assert piece_count("", {}) == 0
    ranks = {("a", "b"): 0, ("ab", EOW): 1}
    assert encode_word("ab", ranks) == ["ab" + EOW]
    assert piece_count("ab", ranks) == 1
    assert piece_count("abab", ranks) == 2  # 'ab' + 'ab</w>'


def test_subword_token_counts_match_reference(spark):
    rows = [
        (0, "hello hello world"),
        (1, "hello unusualzq"),
        (2, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    merges = learn_bpe(df, n_merges=30)
    ranks = {m: i for i, m in enumerate(merges)}
    got = {
        r.doc_id: (r.n_words, r.n_subwords)
        for r in subword_token_counts(df, merges).collect()
    }
    for doc_id, text in rows:
        words = [w for w in text.split() if w]
        want = sum(piece_count(w, ranks) for w in words)
        assert got[doc_id] == (len(words), want), doc_id
    # frequent words compress below their char count
    assert got[0][1] < len("hello hello world".replace(" ", ""))


def test_chunk_documents_subword_budget_invariants(spark):
    from document_ai_spark.operators.chunking import chunk_documents

    text = "alpha beta gamma delta epsilon zeta eta theta " * 6
    df = spark.createDataFrame(
        [(0, text.strip()), (1, "alpha beta")], ["doc_id", "text"]
    )
    merges = learn_bpe(df, n_merges=40)
    ranks = {m: i for i, m in enumerate(merges)}
    budget = 12
    got = chunk_documents(
        df, max_words=budget, overlap=0, unit="subwords", merges=merges
    ).collect()
    by_doc: dict[int, list] = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    widest = max(
        piece_count(w, ranks) for w in set(text.split())
    )
    for doc_id, rows_ in by_doc.items():
        rows_.sort(key=lambda r: r.chunk_no)
        # contiguous numbering and consistent n_chunks
        assert [r.chunk_no for r in rows_] == list(range(len(rows_)))
        assert all(r.n_chunks == len(rows_) for r in rows_)
        # stream-cut budget bound
        for r in rows_:
            assert r.chunk_subwords <= budget + widest - 1
            want = sum(
                piece_count(w, ranks) for w in r.chunk_text.split(" ")
            )
            assert r.chunk_subwords == want
        # byte-exact roundtrip of the normalized text
        joined = " ".join(r.chunk_text for r in rows_)
        src = {0: text.strip(), 1: "alpha beta"}[doc_id]
        assert joined == src
    # word-unit mode unchanged by the new parameters
    legacy = chunk_documents(df, max_words=8, overlap=2).collect()
    assert all(r.chunk_words <= 8 for r in legacy)


def test_chunk_subword_mode_validations(spark):
    from document_ai_spark.operators.chunking import chunk_documents

    df = spark.createDataFrame([(0, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(df, unit="subwords")  # no merges
    with pytest.raises(ValueError):
        chunk_documents(
            df, unit="subwords", merges=[], overlap=4, max_words=8
        )
    with pytest.raises(ValueError):
        chunk_documents(df, unit="nope")


def test_pack_sequences_subword_budget(spark):
    from document_ai_spark.operators.chunking import (
        chunk_documents,
        pack_sequences,
    )

    rows = [(i, "kappa lambda mu nu xi omicron pi rho " * (1 + i % 4))
            for i in range(24)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    merges = learn_bpe(df, n_merges=40)
    chunks = chunk_documents(
        df, max_words=10, overlap=0, unit="subwords", merges=merges
    )
    packed = pack_sequences(
        chunks, pack_words=32, words_col="chunk_subwords", n_groups=4
    ).collect()
    assert sorted(
        (r.doc_id, r.chunk_no) for r in packed
    ) == sorted(
        (r.doc_id, r.chunk_no) for r in chunks.collect()
    )
    widest = max(r.chunk_subwords for r in packed)
    by_pack: dict[tuple, int] = {}
    for r in packed:
        key = (r.pack_group, r.pack_no)
        by_pack[key] = by_pack.get(key, 0) + r.chunk_subwords
    assert all(v <= 32 + widest - 1 for v in by_pack.values())
