"""Deterministic corpus-learned BPE subword tokenization (r5): training
context windows are budgeted in subword tokens, not whitespace words
(~1.3-1.5 words/token variance by language), so `chunk_documents` /
`pack_sequences` budgets should count what the training loader counts.

No network, no vendored binary vocab: the merge table is LEARNED from
the corpus with the classic BPE procedure (Sennrich et al. 2016,
arXiv:1508.07909) on a bounded word-frequency sample, with every tie
broken deterministically — same corpus, same merges, byte for byte.

Scale shape: learning collects only the BOUNDED top-`max_fit_words`
(word, count) table (the same bounded-fit contract as the IVF
quantizer and the quality classifier); applying computes piece counts
once per DISTINCT word (an Arrow-batched pandas UDF over the
Zipf-bounded distinct-word table, never per corpus row) and joins them
back — the corpus itself is touched only by explode + join + sum.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries_base import _norm_words

EOW = "</w>"  # end-of-word symbol (a multi-char SYMBOL, not text)

N_MERGES = 200
MAX_FIT_WORDS = 10_000


def _merge_pair(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple:
    """Merge every non-overlapping occurrence of `pair`, left to
    right."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if (
            i + 1 < len(syms)
            and syms[i] == pair[0]
            and syms[i + 1] == pair[1]
        ):
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def learn_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = N_MERGES,
    max_fit_words: int = MAX_FIT_WORDS,
) -> list[tuple[str, str]]:
    """Learn a BPE merge table from the corpus. Deterministic: the fit
    sample is the top-`max_fit_words` words by (count desc, word) —
    a bounded collect, like every other model fit in this repo — and
    each round merges the (count-max, then lexicographically smallest)
    adjacent symbol pair."""
    rows = (
        df.select(F.explode(_norm_words(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "word")
        .limit(max_fit_words)
        .collect()
    )
    vocab: dict[tuple, int] = {
        tuple(list(r.word) + [EOW]): r.n for r in rows
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = {_merge_pair(s, best): n for s, n in vocab.items()}
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list:
    """Apply the merge table to one word (greedy lowest-rank pair,
    all occurrences per round — the standard BPE encode loop)."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for a, b in zip(syms, syms[1:]):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (a, b)
        if best_pair is None:
            break
        syms = list(_merge_pair(tuple(syms), best_pair))
    return syms


def piece_count(word: str, ranks: dict) -> int:
    """Subword tokens in `word`: encoded symbols, with a bare trailing
    EOW (no merge reached it) folding into the final real piece —
    an unmerged word of k chars counts k char tokens, never k+1."""
    syms = encode_word(word, ranks)
    return len(syms) - (1 if syms and syms[-1] == EOW else 0)


def _piece_count_udf(merges: list[tuple[str, str]]):
    ranks = {m: i for i, m in enumerate(merges)}

    @F.pandas_udf("int")
    def n_pieces(words: pd.Series) -> pd.Series:
        return words.map(lambda w: piece_count(w or "", ranks))

    return n_pieces


def word_piece_counts(
    words: DataFrame, merges: list[tuple[str, str]],
    word_col: str = "word",
) -> DataFrame:
    """(word,...) -> + n_pieces, computed once per row — callers pass
    the DISTINCT word table, never the exploded corpus."""
    return words.withColumn(
        "n_pieces", _piece_count_udf(merges)(F.col(word_col))
    )


def subword_token_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (id, n_words, n_subwords) per document under the frozen word
    normalization. The BPE encode runs once per DISTINCT word; the
    corpus pays explode + join + one aggregate."""
    # r6 (ADVICE): materialize the VOCABULARY-sized side, not the
    # corpus. The old eager checkpoint of the per-doc words array
    # stored roughly the whole corpus text in executor-local blocks to
    # save a 2x regex-split recompute — the wrong trade at the 100 TB
    # target. Checkpointing the distinct-word piece counts instead
    # keeps the pandas-UDF BPE encode at once per distinct word (its
    # lineage runs exactly once, at materialization) while the word
    # split recomputes a bounded twice (distinct build + join side);
    # the left-join base restoring empty docs needs only ids and reads
    # the pruned scan directly.
    words = df.select(
        F.col(id_col).alias("_id"),
        F.explode(_norm_words(text_col)).alias("word"),
    ).filter(F.col("word") != "")
    wp = word_piece_counts(
        words.select("word").distinct(), merges
    ).localCheckpoint(eager=True)
    per_doc = (
        words.join(wp, "word")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_pieces").cast("long").alias("n_subwords"),
        )
    )
    return (
        df.select(F.col(id_col).alias("_id"))
        .join(per_doc, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_words", F.lit(0)).alias("n_words"),
            F.coalesce("n_subwords", F.lit(0)).alias("n_subwords"),
        )
    )
