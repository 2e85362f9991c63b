"""Document chunking for training-window packing: split long documents
into overlapping fixed-size word windows — the step between a curated
corpus and a tokenizer's context budget.

Pure column expressions (sequence -> transform -> posexplode over the
materialized `words` array): one scan, no UDF, one output row per chunk.
Chunk boundaries are deterministic functions of the word count, so the
operation is reproducible across runs and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries_base import _norm_words


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_words: int = 512,
    overlap: int = 64,
    unit: str = "words",
    merges: list | None = None,
    passthrough_cols: tuple[str, ...] = (),
) -> DataFrame:
    """df(id, text, ...) -> (id, *passthrough_cols, chunk_no, n_chunks,
    chunk_text, chunk_words). Windows of `max_words` BUDGET UNITS
    advancing by (max_words - overlap); the final window may be
    shorter; a document within one budget is one chunk. `overlap` must
    be < max_words.

    `passthrough_cols` (r5): per-document metadata columns carried onto
    every chunk row in-plan — the pipeline rides `warc_ts` through
    instead of re-scanning the curated table and shuffling a
    chunks<->docs join just to recover it. Default empty: the
    oracle-checked registry schema is unchanged.

    unit='words' (default): the budget counts whitespace words —
    the oracle-checked frozen behavior. unit='subwords' (r5): the
    budget counts BPE subword tokens under a learned merge table
    (functions/subword.learn_bpe) — what a training loader's context
    window actually counts. Splitting stays at word granularity:
    chunks are cut stream-wise where the running subword total crosses
    the budget, so a chunk holds at most max_words +
    (widest word's pieces) - 1 subwords (the same bounded-overflow
    contract as pack_sequences); overlap must be 0 in subword mode
    (re-serving trailing words would need a sequential per-chunk
    re-count that no plain window expresses)."""
    if not 0 <= overlap < max_words:
        raise ValueError("need 0 <= overlap < max_words")
    if unit == "subwords":
        if merges is None:
            raise ValueError("unit='subwords' needs a BPE merge table")
        if overlap != 0:
            raise ValueError("subword budgets support overlap=0 only")
        return _chunk_by_subwords(df, id_col, text_col, max_words,
                                  merges, passthrough_cols)
    if unit != "words":
        raise ValueError(f"unknown unit {unit!r}")
    stride = max_words - overlap
    words = _norm_words(text_col)
    d = df.select(
        F.col(id_col), *[F.col(c) for c in passthrough_cols],
        words.alias("_w"), F.size(words).alias("_n")
    )
    n_chunks = F.when(F.col("_n") <= max_words, F.lit(1)).otherwise(
        F.ceil((F.col("_n") - F.lit(overlap)) / F.lit(stride)).cast("int")
    )
    chunks = d.select(
        id_col,
        *passthrough_cols,
        n_chunks.alias("n_chunks"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.slice(
                    F.col("_w"), i * stride + 1, max_words
                ),
            )
        ).alias("chunk_no", "_cw"),
    )
    return chunks.select(
        id_col,
        *passthrough_cols,
        "chunk_no",
        "n_chunks",
        F.concat_ws(" ", "_cw").alias("chunk_text"),
        F.size("_cw").alias("chunk_words"),
    )


def _chunk_by_subwords(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget: int,
    merges: list,
    passthrough_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Stream-cut word grouping under a subword budget: per-word piece
    counts come from ONE BPE encode per distinct word (joined back),
    a per-doc running total assigns each word to the chunk its last
    piece lands in, and chunk ids are dense-renumbered (a single word
    wider than the budget owns its own chunk without leaving a gap).
    Output adds chunk_subwords next to the word-mode schema."""
    from pyspark.sql.window import Window as W

    from ..functions.subword import word_piece_counts

    # r6 (ADVICE): checkpoint the VOCABULARY-sized piece-count table,
    # not the corpus-sized words array — the old eager checkpoint of
    # the per-doc `_w` arrays stored ~the whole corpus text in
    # executor-local blocks to save a 2x regex recompute; the bounded
    # recompute (distinct build + join side) is the right trade at the
    # 100 TB target, and the pandas-UDF BPE encode still runs exactly
    # once per distinct word (its lineage materializes here)
    words = df.select(
        F.col(id_col),
        *[F.col(c) for c in passthrough_cols],
        F.posexplode(_norm_words(text_col)).alias("pos", "word"),
    )
    wp = word_piece_counts(
        words.select("word").distinct(), merges
    ).localCheckpoint(eager=True)
    ww = words.join(wp, "word")
    wdoc = W.partitionBy(id_col).orderBy("pos")
    cum = F.sum("n_pieces").over(
        wdoc.rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cut = ((cum - 1) / budget).cast("int")
    ww = ww.withColumn(
        "_chunk", F.greatest(cut, F.lit(0))
    ).withColumn(
        "chunk_no",
        F.dense_rank().over(W.partitionBy(id_col).orderBy("_chunk")) - 1,
    )
    # words re-join with single spaces (the normalization the word
    # split came from), ordered by their in-doc position
    # passthrough cols are constant per document, so grouping by them
    # alongside the id changes nothing but carries them through
    chunks = ww.groupBy(id_col, *passthrough_cols, "chunk_no").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "word"))),
                lambda x: x["word"],
            ),
        ).alias("chunk_text"),
        F.count(F.lit(1)).alias("chunk_words"),
        F.sum("n_pieces").cast("long").alias("chunk_subwords"),
    )
    wn = W.partitionBy(id_col)
    return chunks.withColumn(
        "n_chunks", F.max(F.col("chunk_no") + 1).over(wn)
    ).select(
        id_col, *passthrough_cols, "chunk_no", "n_chunks", "chunk_text",
        "chunk_words", "chunk_subwords",
    )


N_PACK_GROUPS = 1024


def pack_sequences(
    chunks: DataFrame,
    pack_words: int = 2048,
    id_col: str = "doc_id",
    words_col: str = "chunk_words",
    n_groups: int = N_PACK_GROUPS,
    seed: int = 0,
) -> DataFrame:
    """Assign chunks to fixed-budget training packs (the
    concat-and-chunk packing every pretraining loader runs so short
    documents don't waste context): -> input columns +
    (pack_group, pack_no, pack_seq) where (pack_group, pack_no) is the
    pack identity and pack_seq orders members inside it.

    Distributed shape: rows hash into `n_groups` independent streams
    (content-hash of the id — deterministic, never rand()); inside a
    group a running word total (one window cumsum) cuts packs greedily
    at the `pack_words` boundary. Each group's window is a separate
    partition, so packing 10^12 chunks is n_groups-way parallel with
    exactly one shuffle; no global sort, no driver state. A chunk wider
    than `pack_words` becomes its own (oversized) pack — callers chunk
    first, pack second.

    The budget counts whatever `words_col` counts: pass
    chunk_subwords from chunk_documents(unit='subwords') and the packs
    are budgeted in BPE tokens — the loader-true unit (r5) — with no
    change here.

    Packing semantics (stream-cut, bounded overflow): a chunk belongs
    to the pack its last word lands in when the running total is cut
    every `pack_words`, so a pack holds at most
    pack_words + max_chunk_words - 1 words and at least one chunk.
    Exact capacity enforcement would need a sequential reset per group
    (no plain window expresses it); with pack_words >> chunk width the
    overflow is a few percent, and training loaders truncate/pad the
    tail anyway. Greedy-by-hash-order also trades a few percent of fill
    efficiency against first-fit-decreasing — both are the standard
    trades at corpus scale."""
    from pyspark.sql.window import Window as W

    if pack_words < 1:
        raise ValueError(f"pack_words must be >= 1, got {pack_words}")
    g = F.pmod(
        F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)),
        F.lit(n_groups),
    ).cast("int")
    o = F.xxhash64(
        F.col(id_col).cast("string"),
        F.coalesce(F.col("chunk_no"), F.lit(0)).cast("string")
        if "chunk_no" in chunks.columns
        else F.lit("0"),
        F.lit(seed + 1),
    )
    d = chunks.withColumn("_g", g).withColumn("_o", o)
    w = W.partitionBy("_g").orderBy("_o")
    cum = F.sum(words_col).over(
        w.rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # pack boundary: a chunk belongs to the pack its LAST word lands in
    # when cutting the running total at pack_words; an oversized chunk
    # still gets exactly one pack this way
    d = d.withColumn("_cum", cum).withColumn(
        "pack_no",
        ((F.col("_cum") - 1) / pack_words).cast("int"),
    )
    wp = W.partitionBy("_g", "pack_no").orderBy("_o")
    return (
        d.withColumn("pack_seq", F.row_number().over(wp) - 1)
        .withColumnRenamed("_g", "pack_group")
        .drop("_o", "_cum")
    )
