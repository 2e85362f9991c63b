"""Classifier-threshold sweep harness: one corpus pass evaluates every
config; best-per-metric selection picks the frozen policy on the golden
corpus (it is the policy the goldens were constructed for)."""

from __future__ import annotations

import os

from document_ai_spark.kernel.classify import ClassifierConfig
from document_ai_spark.operators.tuning import (
    DEFAULT_GRID,
    best_config_per_metric,
    config_grid_df,
    sweep_extractions,
    sweep_log,
)


def test_sweep_selects_frozen_config(spark, corpus_dir):
    pages = spark.read.parquet(os.path.join(corpus_dir, "pages.parquet"))
    golden = spark.read.parquet(
        os.path.join(corpus_dir, "golden_text.parquet")
    )
    assert DEFAULT_GRID[0] == ClassifierConfig()  # config 0 is frozen
    swept = sweep_extractions(pages)
    grid = config_grid_df(spark, DEFAULT_GRID)
    log = sweep_log(swept, golden, grid)
    rows = {r.config_id: r for r in log.collect()}
    assert len(rows) == len(DEFAULT_GRID)
    # the frozen config reproduces the goldens exactly on html pages
    assert rows[0].content_accuracy == 1.0
    # at least one competing config must actually disagree, or the sweep
    # proves nothing
    assert any(r.content_accuracy < 1.0 for r in rows.values())

    best = {r.metric: r for r in
            best_config_per_metric(log, ["content_accuracy"]).collect()}
    assert best["content_accuracy"].config_id == 0
    assert best["content_accuracy"].value == 1.0


def test_sweep_single_pass_row_shape(spark, corpus_dir):
    pages = spark.read.parquet(os.path.join(corpus_dir, "pages.parquet"))
    grid = [ClassifierConfig(), ClassifierConfig(w_min=5)]
    swept = sweep_extractions(pages, grid)
    n_html = swept.filter("config_id = 0").count()
    assert swept.count() == 2 * n_html  # every config per html page
