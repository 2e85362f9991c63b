"""In-kernel 2-D nearest-right word search: the fused per-page variant of
queries_spatial's relational form.

Mirrors the reference kernel loop (/root/reference/ai_documents/analysis/
cv/document_parsing.py:132-198) but vectorized: one applyInPandas pass per
page computes, for every key, the y-overlap gate (_has_overlap, :79-84),
the x-right gate, and the Euclidean center argmin (compute_box_distance,
:102-129) as numpy array ops over all boxes at once — no per-box Python
loop, no box self-join, no shuffle beyond the groupBy(doc_id).

Use this form when the pipeline is already grouped per document (e.g.
inside the extraction stage); use the relational form when the optimizer
should see the join (column pruning, AQE) or the oracle must check it.
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

NR_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("key", T.StringType()),
        T.StructField("next_word", T.StringType()),
        T.StructField("dist", T.DoubleType()),
    ]
)


def _levenshtein(a: str, b: str) -> int:
    """Plain DP edit distance — matches Spark's levenshtein() and DuckDB's
    levenshtein() (unit costs, no transposition)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def next_right_in_page(
    pdf: pd.DataFrame,
    keys: Iterable[str],
    fuzzy_margin: int | None = None,
    min_overlap: int = 10,
    max_dist: float = 200.0,
) -> pd.DataFrame:
    """One page of boxes (doc_id, i, word, x_min, x_max, y_min, y_max),
    sorted or not -> one row per key with the reference sentinels."""
    pdf = pdf.sort_values("i")
    words = pdf["word"].to_numpy()
    low = np.array([w.lower() for w in words])
    x_min = pdf["x_min"].to_numpy(np.float64)
    x_max = pdf["x_max"].to_numpy(np.float64)
    y_min = pdf["y_min"].to_numpy(np.float64)
    y_max = pdf["y_max"].to_numpy(np.float64)
    cx = (x_min + x_max) / 2
    cy = (y_min + y_max) / 2
    doc_id = int(pdf["doc_id"].iloc[0])
    out = []
    for key in keys:
        if fuzzy_margin is None:
            hits = np.flatnonzero(low == key)
        else:
            # levenshtein only on the (tiny) unique vocabulary of the page
            uniq, inv = np.unique(low, return_inverse=True)
            ok = np.array(
                [_levenshtein(u, key) <= fuzzy_margin for u in uniq]
            )
            hits = np.flatnonzero(ok[inv])
        if len(hits) == 0:
            out.append((doc_id, key, "<NOT_FOUND>", None))
            continue
        k = hits[0]  # first match in reading order
        overlap = (
            np.minimum(y_max[k], y_max) - np.maximum(y_min[k], y_min)
            - min_overlap
        )
        cand = (overlap > 0) & (x_min > x_min[k])
        dist = np.round(
            np.sqrt((cx[k] - cx) ** 2 + (cy[k] - cy) ** 2), 6
        )
        cand &= dist < max_dist
        if not cand.any():
            out.append((doc_id, key, "<EMPTY>", None))
            continue
        # argmin by (dist, i): np.argmin returns the first (lowest i) min
        masked = np.where(cand, dist, np.inf)
        j = int(np.argmin(masked))
        out.append((doc_id, key, words[j], float(dist[j])))
    return pd.DataFrame(
        out, columns=["doc_id", "key", "next_word", "dist"]
    )


def next_right_word_kernel(
    boxes: DataFrame,
    keys: list[str],
    fuzzy_margin: int | None = None,
) -> DataFrame:
    """boxes DataFrame -> (doc_id, key, next_word, dist): one fused
    applyInPandas pass per page."""
    keys = list(keys)

    def _apply(pdf: pd.DataFrame) -> pd.DataFrame:
        return next_right_in_page(pdf, keys, fuzzy_margin)

    return boxes.groupBy("doc_id").applyInPandas(_apply, schema=NR_SCHEMA)
