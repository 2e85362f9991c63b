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
) -> DataFrame:
    """df(id, text, ...) -> (id, chunk_no, n_chunks, chunk_text,
    chunk_words). Windows of `max_words` words advancing by
    (max_words - overlap); the final window may be shorter; a document
    of <= max_words words is one chunk. `overlap` must be < max_words."""
    if not 0 <= overlap < max_words:
        raise ValueError("need 0 <= overlap < max_words")
    stride = max_words - overlap
    words = _norm_words(text_col)
    d = df.select(
        F.col(id_col), words.alias("_w"), F.size(words).alias("_n")
    )
    n_chunks = F.when(F.col("_n") <= max_words, F.lit(1)).otherwise(
        F.ceil((F.col("_n") - F.lit(overlap)) / F.lit(stride)).cast("int")
    )
    chunks = d.select(
        id_col,
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
        "chunk_no",
        "n_chunks",
        F.concat_ws(" ", "_cw").alias("chunk_text"),
        F.size("_cw").alias("chunk_words"),
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
