"""Round-4 additions: parameterized MinHash banding, bounded
connected-components rounds, suite branches for passages/chunking."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_ai_spark.queries_base import minhash_band_pairs

BASE = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu "
    "nu xi omicron pi rho sigma tau upsilon phi chi psi omega one two "
    "three four five six seven eight nine ten eleven twelve thirteen"
)
OTHER = (
    "completely different vocabulary nothing shared here at all zero "
    "overlap whatsoever distinct tokens everywhere in this document "
    "spanning enough words to carry many shingles of its very own"
)


@pytest.fixture(scope="module")
def planted(spark):
    rows = [
        (1, BASE),
        (2, BASE),                          # identical -> Jaccard 1.0
        (3, BASE + " tail words appended"),  # near-dup, high Jaccard
        (4, OTHER),                          # unrelated
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_minhash_banding_default_curve(planted):
    pairs = {
        (r.doc_a, r.doc_b) for r in minhash_band_pairs(planted).collect()
    }
    assert (1, 2) in pairs and (1, 3) in pairs and (2, 3) in pairs
    assert not any(4 in p for p in pairs)


def test_minhash_banding_steep_curve_16_4_4(planted):
    pairs = {
        (r.doc_a, r.doc_b)
        for r in minhash_band_pairs(
            planted, n_hashes=16, n_bands=4, rows_per_band=4
        ).collect()
    }
    # threshold ~ (1/4)^(1/4) ~ 0.71: the planted near-dups survive, the
    # unrelated doc still never collides
    assert (1, 2) in pairs and (1, 3) in pairs
    assert not any(4 in p for p in pairs)


def test_minhash_banding_rejects_inconsistent_params(planted):
    with pytest.raises(ValueError):
        minhash_band_pairs(planted, n_hashes=16, n_bands=5, rows_per_band=4)


def test_connected_components_log_rounds_on_chain(spark):
    """30-hop chain (diameter 30): pointer jumping must converge in
    O(log d) rounds, not O(d) — the bound that keeps curation_funnel's
    iteration tail flat at corpus scale (r3 verdict item 7)."""
    from document_ai_spark.operators.similarity import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], ["src", "dst"]
    )
    labels, rounds = connected_components(edges, with_rounds=True)
    assert rounds <= 6, rounds
    got = labels.agg(
        F.countDistinct("component").alias("c"),
        F.min("component").alias("m"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert (got.c, got.m, got.n) == (1, 0, 31)


def test_minhash_banding_rows_per_band_inferred(planted):
    # (12, 3) infers r=4; distinct high-sim candidates only
    pairs = {
        (r.doc_a, r.doc_b)
        for r in minhash_band_pairs(
            planted, n_hashes=12, n_bands=3
        ).collect()
    }
    assert (1, 2) in pairs
    assert not any(4 in p for p in pairs)
