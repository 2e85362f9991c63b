"""Cross-document shared-passage detection (the ExactSubstr family of
"Deduplicating Training Data Makes Language Models Better", Lee et al.
2022, arXiv:2107.06499 — approximated relationally): two documents
sharing >= `min_shared` winnowing fingerprints contain near-verbatim
common passages (winnowing guarantees any shared run of >= window+k-1
characters contributes at least one common fingerprint).

The distributed shape is the one that survives 100 TB: per-doc
fingerprints (the existing numpy winnowing kernel, one Arrow pass) ->
self-join bucketed BY FINGERPRINT (never all-pairs; a fingerprint shared
by f docs contributes f*(f-1)/2 candidate pairs, and `max_doc_freq`
drops stop-passage fingerprints the way heavy-hitter shingles are
dropped from MinHash bands) -> per-pair shared counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shared_passage_pairs(
    fingerprints: DataFrame,
    min_shared: int = 2,
    max_doc_freq: int = 100,
) -> DataFrame:
    """fingerprints(doc_id, pos, fingerprint) — e.g. the output of
    queries_text.q_winnow_fingerprint — -> (doc_a, doc_b, n_shared)
    for pairs sharing >= min_shared distinct fingerprints.

    `max_doc_freq` excludes fingerprints present in more than that many
    documents (boilerplate passages; they would otherwise explode the
    candidate join quadratically and flag everything against
    everything)."""
    fp = fingerprints.select("doc_id", "fingerprint").distinct()
    freq = fp.groupBy("fingerprint").agg(
        F.count(F.lit(1)).alias("_df")
    )
    kept = fp.join(
        freq.filter(F.col("_df") <= max_doc_freq).select("fingerprint"),
        "fingerprint",
    )
    a = kept.select(F.col("doc_id").alias("doc_a"), "fingerprint")
    b = kept.select(F.col("doc_id").alias("doc_b"), "fingerprint")
    return (
        a.join(b, "fingerprint")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
