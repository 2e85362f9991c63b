"""Gopher repetition signals (operators/repetition): duplicate-line /
duplicate-paragraph fractions by count and char mass, plus the `rep`
funnel rule wired through curate/pipeline."""

from __future__ import annotations

from document_ai_spark.operators.repetition import (
    DUP_LINE_FRAC_MAX,
    rep_flags,
    repetition_metrics,
)


def _metrics(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return repetition_metrics(df).collect()[0]


def test_clean_document_has_zero_fractions(spark):
    r = _metrics(spark, "alpha beta\ngamma delta\n\nepsilon zeta")
    assert r.n_lines == 3 and r.n_paras == 2
    assert r.dup_line_frac == 0.0 and r.dup_line_char_frac == 0.0
    assert r.dup_para_frac == 0.0 and r.dup_para_char_frac == 0.0


def test_duplicate_lines_counted_beyond_first(spark):
    # 4 lines, 'cookie banner' x3 -> 2 duplicate copies beyond the first
    r = _metrics(
        spark, "cookie banner\nreal content\ncookie banner\ncookie banner"
    )
    assert r.n_lines == 4
    assert r.dup_line_frac == 0.5  # 2 of 4
    # chars: 3*13 + 12 = 51 total, dup copies = 2*13 = 26
    assert r.dup_line_char_frac == round(26 / 51, 6)


def test_duplicate_paragraphs_and_their_lines(spark):
    p = "nav home\nnav about"
    r = _metrics(spark, p + "\n\nbody text here\n\n" + p)
    assert r.n_paras == 3 and r.dup_para_frac == round(1 / 3, 6)
    # the repeated paragraph's lines are duplicate lines too
    assert r.n_lines == 5 and r.dup_line_frac == 0.4


def test_blank_lines_and_whitespace_dropped(spark):
    r = _metrics(spark, "a b\n\n\n  \n a b \nc d")
    # segments trim then drop empties: 'a b', 'a b', 'c d'
    assert r.n_lines == 3 and r.dup_line_frac == round(1 / 3, 6)


def test_no_line_structure_passes_trivially(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(1, "just one flat line of words"), (2, None)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.pass_rep for r in rep_flags(df).collect()}
    assert rows == {1: True, 2: True}
    m = repetition_metrics(df).filter(F.col("doc_id") == 2).collect()[0]
    assert m.n_lines == 0 and m.dup_line_frac == 0.0


def test_rep_flags_threshold(spark):
    # 10 lines, 4 duplicate copies -> 0.4 > DUP_LINE_FRAC_MAX fails;
    # 2 copies -> 0.2 passes
    assert DUP_LINE_FRAC_MAX == 0.30
    bad = "\n".join(["x y"] * 5 + [f"line {i} unique" for i in range(5)])
    ok = "\n".join(["x y"] * 3 + [f"line {i} unique" for i in range(7)])
    df = spark.createDataFrame(
        [(1, bad), (2, ok)], "doc_id long, text string"
    )
    rows = {r.doc_id: r.pass_rep for r in rep_flags(df).collect()}
    assert rows == {1: False, 2: True}


def test_bullet_and_ellipsis_line_fractions(spark):
    r = _metrics(
        spark,
        "- item one\n* item two\nplain prose line\ntruncated line...\n"
        "unicode ellipsis…",
    )
    assert r.n_lines == 5
    assert r.bullet_line_frac == 0.4  # '-' and '*'
    assert r.ellipsis_line_frac == 0.4  # '...' and '…'


def test_rep_flags_bullet_threshold(spark):
    # 10 lines all bullets -> 1.0 > 0.9 fails; 8/10 passes
    all_b = "\n".join(f"- item {i}" for i in range(10))
    most_b = "\n".join(
        [f"- item {i}" for i in range(8)] + ["prose one", "prose two"]
    )
    df = spark.createDataFrame(
        [(1, all_b), (2, most_b)], "doc_id long, text string"
    )
    rows = {r.doc_id: r.pass_rep for r in rep_flags(df).collect()}
    assert rows == {1: False, 2: True}


def _py_reference(text):
    """Straight-line Python reference for the metric definitions.
    NOTE trim is SPACE-only (Spark trim == DuckDB trim): a paragraph
    piece like ' \\n alpha' keeps its inner/edge newlines in the char
    counts — Python's .strip() would disagree with both engines."""
    def segs(parts):
        return [
            p.strip(" ") for p in parts if p.strip(" ") != ""
        ]

    import re

    ls = segs(text.split("\n"))
    ps = segs(re.split(r"\n\n+", text))
    out = {}
    for name, ss in (("line", ls), ("para", ps)):
        n = len(ss)
        nd = len(set(ss))
        c = sum(len(s) for s in ss)
        cd = sum(len(s) for s in set(ss))
        out[f"n_{name}s"] = n
        out[f"dup_{name}_frac"] = round((n - nd) / n, 6) if n else 0.0
        out[f"dup_{name}_char_frac"] = (
            round((c - cd) / c, 6) if c else 0.0
        )
    n = len(ls)
    out["bullet_line_frac"] = (
        round(sum(s.startswith(("-", "*", "•")) for s in ls) / n, 6)
        if n else 0.0
    )
    out["ellipsis_line_frac"] = (
        round(sum(s.endswith(("...", "…")) for s in ls) / n, 6)
        if n else 0.0
    )
    return out


def test_metrics_fuzz_vs_python_reference(spark):
    """Property cross-check: the columnar metrics equal a straight-line
    Python implementation over pseudo-random structured texts."""
    import random

    rng = random.Random(1234)
    vocab = ["alpha", "beta", "- dash", "* star", "dots...", "x…", ""]
    docs = []
    for i in range(60):
        n = rng.randint(0, 12)
        lines = [
            " ".join(rng.choices(vocab, k=rng.randint(0, 4)))
            for _ in range(n)
        ]
        sep = ["\n", "\n\n", "\n\n\n", " \n "]
        text = ""
        for j, ln in enumerate(lines):
            text += ln
            if j < n - 1:
                text += rng.choice(sep)
        docs.append((i, text))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.asDict() for r in repetition_metrics(df).collect()}
    for i, text in docs:
        want = _py_reference(text)
        have = got[i]
        for k2, v in want.items():
            assert have[k2] == v, (i, k2, v, have[k2], text)


def test_pipeline_rep_rule(spark, corpus_dir, tmp_path):
    """The pipeline verb accepts `rep` in rules and survives end-to-end:
    the extracted datagen articles are line-structured but not
    repetitive, so the rule must not nuke the corpus."""
    import os

    from document_ai_spark.pipeline import run_pipeline

    pages = str(tmp_path / "pages")
    (
        spark.read.parquet(os.path.join(corpus_dir, "pages.parquet"))
        .orderBy("url").limit(12).write.parquet(pages)
    )
    summary = run_pipeline(
        spark,
        pages,
        str(tmp_path / "wd"),
        str(tmp_path / "out"),
        rules=("dedup", "quality", "rep"),
        n_shards=2,
        shards_per_commit=2,
    )
    assert summary["stages"]["curate"]["docs_kept"] > 0


def test_include_rep_is_single_scan_no_join(spark, tmp_path):
    """The rep flag must ride curation_flags' one scan: the physical
    plan for include_rep=True has exactly one parquet scan and no join
    (the first wiring paid a second main_text scan + url shuffle-join —
    this pins the fix)."""
    import os

    from document_ai_spark.operators.curate import curation_flags

    src = str(tmp_path / "t")
    spark.createDataFrame(
        [("u1", "a b\nc d"), ("u2", "x y\nx y")],
        "url string, main_text string",
    ).write.parquet(src)
    fl = curation_flags(
        spark.read.parquet(src), id_col="url", text_col="main_text",
        lang_col=None, include_rep=True,
    )
    plan = fl._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert os.path.basename(src) in plan  # it is OUR scan


def test_funnel_rep_rung_and_kept(spark):
    from pyspark.sql import functions as F

    from document_ai_spark.operators.curate import (
        curation_flags,
        funnel_counts,
        kept_filter,
    )

    body = " ".join(f"word{i} text" for i in range(15))
    clean = body + "\nsecond line of the body here"
    reps = "\n".join(["repeated boilerplate line"] * 6 + [body])
    df = spark.createDataFrame(
        [("u1", clean), ("u2", reps)], "url string, main_text string"
    )
    flags = curation_flags(
        df, id_col="url", text_col="main_text", lang_col=None
    ).join(rep_flags(df, id_col="url", text_col="main_text"), "url")
    rules = ("dedup", "quality", "rep")
    row = funnel_counts(flags, rules).collect()[0]
    assert row.after_rep == 1 and row.kept == 1
    kept = kept_filter(flags, rules).select("url").collect()
    assert [r.url for r in kept] == ["u1"]
    assert (
        flags.filter(~F.col("pass_rep")).select("url").collect()[0].url
        == "u2"
    )
