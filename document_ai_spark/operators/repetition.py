"""Gopher-style repetition signals: duplicate-line / duplicate-paragraph
fractions, by count and by character mass (Rae et al. 2021's rule-pack
family; RefinedWeb and Dolma ship the same filters). Complements the
n-gram duplication ratio text_metrics already carries — pages whose
boilerplate survives extraction repeat whole LINES (nav strips, cookie
banners), which word-shingle ratios under-weight.

Spark-first shape: every metric is a pure column expression over one
scan — split to a segment array, trim/drop empties, then compare the
array against its distinct form (counts AND character sums via
higher-order functions). No explode, no shuffle, no UDF: the signals
ride along any other one-scan flag computation at 100 TB.

Reference analog: the boilerplate/density classification this engine's
kernel does per page (`kernel/classify.py`); these signals catch what
survives it, corpus-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Gopher rule-pack thresholds: a document fails when MORE than this
# fraction of its lines/paragraphs (or their characters) are duplicate
# copies beyond the first occurrence.
DUP_LINE_FRAC_MAX = 0.30
DUP_PARA_FRAC_MAX = 0.30
DUP_LINE_CHAR_FRAC_MAX = 0.20
DUP_PARA_CHAR_FRAC_MAX = 0.20
# ... and the line-SHAPE caps from the same pack: mostly-bullet and
# mostly-ellipsis documents are listings/truncation artifacts, not prose
BULLET_LINE_FRAC_MAX = 0.90
ELLIPSIS_LINE_FRAC_MAX = 0.30
_BULLET_PREFIXES = ("-", "*", "•")  # -, *, •
_ELLIPSIS_SUFFIXES = ("...", "…")  # ..., …


def _segments(text: Column, sep_regex: str) -> Column:
    """Split on the separator regex, trim each piece, drop empties —
    the segment definition BOTH engines implement identically (the
    oracle twin uses string_split / string_split_regex + trim)."""
    parts = F.split(text, sep_regex)
    return F.filter(
        F.transform(parts, lambda p: F.trim(p)),
        lambda p: p != F.lit(""),
    )


def _char_sum(segs: Column) -> Column:
    return F.aggregate(
        F.transform(segs, lambda s: F.length(s).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _dup_metrics(segs: Column) -> tuple[Column, Column, Column]:
    """(n_segments, dup_frac, dup_char_frac): duplicates are the copies
    beyond the first occurrence (n - n_distinct), char mass likewise
    (total chars - chars of the distinct set). Zero segments -> 0.0
    fractions (no signal)."""
    dist = F.array_distinct(segs)
    n = F.size(segs).cast("long")
    nd = F.size(dist).cast("long")
    chars = _char_sum(segs)
    chars_d = _char_sum(dist)
    frac = F.round(
        F.when(n > 0, (n - nd).cast("double") / n).otherwise(0.0), 6
    )
    cfrac = F.round(
        F.when(chars > 0, (chars - chars_d).cast("double") / chars)
        .otherwise(0.0),
        6,
    )
    return n, frac, cfrac


def _shape_fracs(segs: Column) -> tuple[Column, Column]:
    """(bullet_line_frac, ellipsis_line_frac): fraction of lines that
    START with a bullet marker / END with an ellipsis. Zero lines ->
    0.0 (no signal)."""
    n = F.size(segs).cast("long")

    def frac_of(pred) -> Column:
        return F.round(
            F.when(
                n > 0,
                F.size(F.filter(segs, pred)).cast("double") / n,
            ).otherwise(0.0),
            6,
        )

    def is_bullet(s: Column) -> Column:
        c = F.lit(False)
        for p in _BULLET_PREFIXES:
            c = c | s.startswith(p)
        return c

    def is_ellipsis(s: Column) -> Column:
        c = F.lit(False)
        for p in _ELLIPSIS_SUFFIXES:
            c = c | s.endswith(p)
        return c

    return frac_of(is_bullet), frac_of(is_ellipsis)


def _metric_exprs(text: Column) -> dict[str, Column]:
    """All nine signal expressions over the raw text — the ONE
    construction both repetition_metrics and rep_pass_expr consume, so
    a signal added to the metrics cannot silently miss the flag."""
    t = F.coalesce(text, F.lit(""))
    lines = _segments(t, r"\n")
    ln, lf, lcf = _dup_metrics(lines)
    pn, pf, pcf = _dup_metrics(_segments(t, r"\n\n+"))
    bf, ef = _shape_fracs(lines)
    return {
        "n_lines": ln,
        "dup_line_frac": lf,
        "dup_line_char_frac": lcf,
        "n_paras": pn,
        "dup_para_frac": pf,
        "dup_para_char_frac": pcf,
        "bullet_line_frac": bf,
        "ellipsis_line_frac": ef,
    }


def repetition_metrics(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (id, n_lines, dup_line_frac, dup_line_char_frac, n_paras,
    dup_para_frac, dup_para_char_frac, bullet_line_frac,
    ellipsis_line_frac). Lines split on single newlines, paragraphs on
    blank-line runs; NULL text degrades to the empty document (the
    repo-wide posture)."""
    m = _metric_exprs(F.col(text_col))
    return df.select(
        F.col(id_col), *[c.alias(name) for name, c in m.items()]
    )


def rep_pass_expr(text: Column) -> Column:
    """pass_rep as ONE column expression over the raw text — so the
    funnel verbs can ride it along curation_flags' single scan instead
    of paying a second main_text scan + url join (every signal is
    select-only, unlike neardup/lm/clf which need their own jobs)."""
    m = _metric_exprs(text)
    return (
        (m["dup_line_frac"] <= DUP_LINE_FRAC_MAX)
        & (m["dup_para_frac"] <= DUP_PARA_FRAC_MAX)
        & (m["dup_line_char_frac"] <= DUP_LINE_CHAR_FRAC_MAX)
        & (m["dup_para_char_frac"] <= DUP_PARA_CHAR_FRAC_MAX)
        & (m["bullet_line_frac"] <= BULLET_LINE_FRAC_MAX)
        & (m["ellipsis_line_frac"] <= ELLIPSIS_LINE_FRAC_MAX)
    )


def rep_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Funnel stage: (id, pass_rep) — true when every repetition signal
    is under its Gopher threshold. Documents with no line structure at
    all pass trivially (every fraction is 0)."""
    return df.select(
        F.col(id_col),
        rep_pass_expr(F.col(text_col)).alias("pass_rep"),
    )
