"""Regression tests for the round-5 self-review (code-review skill)
findings: the empty-vocab LM fallback, `_parquet_rows` path semantics
(lineage skip / file / glob), honest funnel predecessor-count names,
and the shared winnowing position-cap constant."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F


def test_lm_all_hapax_vocab_cut_falls_back(spark):
    """A triggered max_vocab cut over an all-hapax vocabulary (every
    count ties at 1) must NOT empty the model: the strict count>cut
    filter would null-score every doc and bucket the whole corpus
    'tail'; the fallback keeps the deterministic top-N instead."""
    from document_ai_spark.operators.quality_lm import lm_quality_scores

    docs = spark.createDataFrame(
        [(i, f"uniq{i}a uniq{i}b uniq{i}c") for i in range(12)],
        "doc_id long, text string",
    )
    scored = lm_quality_scores(docs, max_vocab=5).collect()
    assert len(scored) == 12
    # the model survived: every doc has real (non-null) bits, and not
    # everything collapsed into the tail bucket
    assert all(r.bits_per_word is not None for r in scored)
    assert {r.lm_bucket for r in scored} != {"tail"}


def test_parquet_rows_skips_lineage_and_handles_files(tmp_path):
    """_parquet_rows must mirror the Spark reader: '_'-prefixed dirs
    (the extract stage's `_lineage` bookkeeping) are metadata, not
    data; single-file and glob inputs count like spark.read.parquet
    accepts them (the old os.walk returned 0 for both)."""
    from document_ai_spark.pipeline import _parquet_rows

    d = tmp_path / "extracted"
    (d / "_lineage").mkdir(parents=True)
    tbl = pa.table({"x": list(range(7))})
    pq.write_table(tbl, str(d / "part-0.parquet"))
    pq.write_table(tbl, str(d / "part-1.parquet"))
    pq.write_table(pa.table({"shard": [1, 2, 3]}),
                   str(d / "_lineage" / "rows.parquet"))
    assert _parquet_rows(str(d)) == 14  # not 17
    assert _parquet_rows(str(d / "part-0.parquet")) == 7
    assert _parquet_rows(str(d / "part-*.parquet")) == 14


def test_funnel_clf_without_lm_reports_into_clf(spark):
    """A funnel with clf but NO lm must not print a phantom LM rung:
    the count entering the classifier is named into_clf (and there is
    no into_lm column at all when the lm stage never ran)."""
    from document_ai_spark.operators.curate import funnel_counts

    flags = spark.createDataFrame(
        [(1, True, True, True, True, True, 10),
         (2, True, True, True, True, False, 10),
         (3, True, False, True, True, True, 10)],
        "doc_id long, pass_dedup boolean, pass_quality boolean, "
        "pass_gopher boolean, pass_lang boolean, pass_clf boolean, "
        "n_tokens long",
    )
    row = funnel_counts(flags).collect()[0]
    cols = set(funnel_counts(flags).columns)
    assert "into_clf" in cols and "into_lm" not in cols
    assert "after_lm" not in cols and "after_lang" not in cols
    assert row.into_clf == 2  # docs 1, 2 reach the classifier
    assert row.kept == 1


def test_funnel_counts_respects_rule_subset(spark):
    """funnel_counts(flags, rules) must agree with kept_filter under the
    same rule subset: curation_flags always emits quality/gopher, so an
    unrestricted funnel for `--rules dedup,quality` would conjoin
    gopher anyway and print kept < written."""
    from document_ai_spark.operators.curate import (
        funnel_counts,
        kept_filter,
    )

    flags = spark.createDataFrame(
        [(1, True, True, False, 10),
         (2, True, True, True, 10),
         (3, True, False, True, 10)],
        "doc_id long, pass_dedup boolean, pass_quality boolean, "
        "pass_gopher boolean, n_tokens long",
    )
    rules = ("dedup", "quality")
    row = funnel_counts(flags, rules).collect()[0]
    assert row.kept == kept_filter(flags, rules).count() == 2
    cols = set(funnel_counts(flags, rules).columns)
    assert "after_gopher" not in cols  # unselected stage: no rung
    # default (rules=None) keeps the frozen oracle-checked shape
    full = funnel_counts(flags).collect()[0]
    assert full.after_gopher == 1 and full.kept == 1


def test_excision_cap_shares_pos_bits():
    """The excision normalization cap and the winnowing (hash, pos)
    key layout must be the SAME constant — a drifted copy would
    desynchronize span offsets from the text they index into."""
    import inspect

    from document_ai_spark.operators import passages
    from document_ai_spark.queries_text import _POS_BITS

    src = inspect.getsource(passages._norm_text)
    assert "_POS_BITS" in src and "1 << 24" not in src
    assert _POS_BITS == 24  # the packed-key layout the spans assume


def test_baseline_md_generator_has_no_dated_narrative():
    """write_baseline_md must not bake a past round's dated cross-run
    story into every future regeneration — the r5 host-noise analysis
    lives in BENCH/HOST_NOISE_R5.md, the generator only points at it."""
    import inspect

    import bench

    src = inspect.getsource(bench.write_baseline_md)
    assert "r5_run1" not in src
    assert "Four full bench runs" not in src
    assert "HOST_NOISE_R5.md" in src
    repo = os.path.dirname(os.path.abspath(bench.__file__))
    assert os.path.exists(os.path.join(repo, "BENCH", "HOST_NOISE_R5.md"))
