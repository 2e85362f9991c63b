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
