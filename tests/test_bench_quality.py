"""Bench window-quality metrics, --render arg strictness, and the
fresh-run lineage fast path (r5 self-review findings: the noise flags
every future artifact's 'noisy' verdict depends on were untested, the
--render CLI silently dropped a typo'd --scaling-from, and nothing
asserted the cmd_extract fast-path totals equal the lineage table)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def _artifact(name):
    p = os.path.join(REPO, "BENCH", name)
    if not os.path.exists(p):
        pytest.skip(f"committed artifact {name} missing")
    with open(p) as f:
        return json.load(f)


def test_window_quality_flags_committed_noisy_runs():
    # run6: 2c trials 434-885 under flat probes + MP control inversion
    d = _artifact("bench_r5_run6.json")
    q = bench.window_quality(d["extraction_scaling"], d["mp_control"])
    assert q["noisy"] and q["mp_inverted"] and q["trial_spread_lo"] > 1.5


def test_window_quality_passes_committed_clean_retry():
    # retry2: tight trials and probes, no MP section (scaling-only)
    d = _artifact("bench_r5_scaling_retry2.json")
    q = bench.window_quality(d["extraction_scaling"])
    assert not q["noisy"]
    assert q["trial_spread_lo"] <= 1.5
    assert "mp_inverted" not in q


def test_window_quality_mp_inversion_needs_margin():
    scaling = {"trials_docs_per_sec": {"2": [100.0, 100.0]},
               "cpu_probe_docs_per_sec": [1000.0]}
    # 5% dip at the wide width is jitter, not an inversion
    mp_ok = {"mp_docs_per_sec@8p": 1000.0, "mp_docs_per_sec@32p": 950.0}
    assert not bench.window_quality(scaling, mp_ok)["mp_inverted"]
    mp_bad = {"mp_docs_per_sec@8p": 1000.0, "mp_docs_per_sec@32p": 800.0}
    q = bench.window_quality(scaling, mp_bad)
    assert q["mp_inverted"] and q["noisy"]


def test_window_quality_empty_inputs():
    q = bench.window_quality({})
    assert q == {"noisy": False}


def test_capacity_probe_flags_inversion(monkeypatch):
    """capacity_probe (r5: retry-mode artifacts self-flag noisy windows
    the way full runs do) derives mp_inverted with the same >=10%
    margin window_quality uses — and never from the single-thread
    probe, which capacity noise does not touch."""
    calls = iter([
        {"mp_docs_per_sec@8p": 12000.0, "mp_docs_per_sec@32p": 14000.0},
        {"mp_docs_per_sec@8p": 12000.0, "mp_docs_per_sec@32p": 7400.0},
        {"mp_docs_per_sec@8p": 12000.0, "mp_docs_per_sec@32p": 11500.0},
    ])
    monkeypatch.setattr(bench, "mp_control", lambda c, p: next(calls))
    monkeypatch.setattr(bench, "_cpu_probe", lambda c: 2200.0)
    quiet = bench.capacity_probe("unused")
    assert not quiet["mp_inverted"] and quiet["cpu_probe"] == 2200.0
    assert bench.capacity_probe("unused")["mp_inverted"]  # collapsed wide
    assert not bench.capacity_probe("unused")["mp_inverted"]  # 4% jitter


def test_render_rejects_malformed_scaling_from(tmp_path):
    """A typo'd/half-given --scaling-from must ERROR, never silently
    render without the overlay (it would publish the noisy base
    artifact's scaling numbers as if intended)."""
    base = os.path.join(REPO, "BENCH", "bench_r5_run5.json")
    if not os.path.exists(base):
        pytest.skip("committed artifact missing")
    for argv in (
        ["--render", base, "--scaling-from"],            # missing operand
        ["--render", base, "--scaling_from", base],      # typo'd flag
        ["--render", base, "extra"],                     # stray operand
        ["--render", base, "--ab-from"],                 # missing operand
        ["--render", base, "--ab-from", base,
         "--ab-from", base],                             # duplicate flag
        ["--render", base, "--scaling-from", base,
         "--ab_from", base],                             # typo'd 2nd flag
    ):
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), *argv],
            capture_output=True, text=True, timeout=120,
        )
        assert r.returncode == 2, (argv, r.returncode, r.stderr[-300:])
        assert "usage:" in r.stderr


def test_fresh_run_summary_totals_match_lineage_table(
    spark, corpus_dir, tmp_path
):
    """The cmd_extract fast path trusts run_extraction_job's accumulated
    totals on fresh runs instead of re-reading _lineage — the two must
    be the same numbers."""
    from pyspark.sql import functions as F

    from document_ai_spark.operators.lineage import run_extraction_job

    out = str(tmp_path / "ex")
    pages = spark.read.parquet(os.path.join(corpus_dir, "pages.parquet"))
    summary = run_extraction_job(
        pages, out, n_shards=4, shards_per_commit=2
    )
    assert summary["shards_done_prior"] == 0
    lin = spark.read.parquet(os.path.join(out, "_lineage"))
    agg = lin.agg(
        F.sum("docs").alias("docs"),
        F.sum("bytes").alias("bytes"),
        F.sum("parse_failures").alias("parse_failures"),
    ).collect()[0]
    assert summary["docs"] == agg.docs == 200
    assert summary["bytes"] == agg.bytes > 0
    assert summary["parse_failures"] == agg.parse_failures
