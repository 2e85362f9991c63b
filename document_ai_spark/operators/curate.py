"""Corpus curation over any (id, text[, lang]) frame: the dedup / quality /
Gopher / language flags as one single-scan plan, reusable against the
driver's documents table (queries_ml.q_training_mix, oracle-checked) and
against a freshly extracted table (the `curate` CLI) — extract -> curate is
the end-to-end training-data story.

Scale shape: every flag is a column expression over ONE scan; the only
shuffle is the window for the exact-dedup keeper (hash-partition on
md5(text), uniform key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

LANG_PATTERNS = {
    "en": r"\b(the|and|of|to|in|is)\b",
    "de": r"\b(der|die|und|das|ist|nicht)\b",
    "fr": r"\b(le|la|les|et|des|une)\b",
    "es": r"\b(el|los|que|de|una|por)\b",
}


def curation_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str | None = "lang",
) -> DataFrame:
    """One scan -> (id, n_tokens, pass_dedup, pass_quality, pass_gopher
    [, pass_lang]). pass_lang (language-ID agreement) is emitted only when
    a ground-truth lang column is available."""
    t = F.col(text_col)
    words = F.split(F.regexp_replace(F.trim(t), r"\s+", " "), " ")
    n_tokens = F.size(words).cast("long")
    n_punct = F.size(
        F.regexp_extract_all(t, F.lit(r"([.,;:!?])"), F.lit(1))
    )
    pass_quality = (
        (n_tokens >= 20) & (n_tokens <= 100000)
        & (n_punct * 10 <= n_tokens * 3)
    )
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("^[A-Za-z]+$")))
    mean_wl = (
        F.length(F.regexp_replace(t, r"\s", "")).cast("double") / n_tokens
    )
    n_sym = F.size(
        F.regexp_extract_all(t, F.lit(r"([#@\[\]{}<>|~^])"), F.lit(1))
    )
    n_stop = F.size(
        F.regexp_extract_all(
            F.lower(t), F.lit(r"\b(the|be|to|of|and|that|have|with)\b"),
            F.lit(1),
        )
    )
    pass_gopher = (
        (n_tokens >= 50) & (mean_wl >= 3.0) & (mean_wl <= 10.0)
        & (n_alpha * 10 >= n_tokens * 8) & (n_sym * 10 <= n_tokens)
        & (n_stop >= 2)
    )
    cols = [
        F.col(id_col),
        F.md5(F.encode(t, "UTF-8")).alias("_text_hash"),
        n_tokens.alias("n_tokens"),
        pass_quality.alias("pass_quality"),
        pass_gopher.alias("pass_gopher"),
    ]
    if lang_col is not None:
        low = F.lower(t)
        s = {
            k: F.size(F.regexp_extract_all(low, F.lit(pat), F.lit(1)))
            for k, pat in LANG_PATTERNS.items()
        }
        s_zh = F.size(
            F.regexp_extract_all(
                t, F.lit(r"([\x{4e00}-\x{9fff}])"), F.lit(1)
            )
        )
        pred_lang = (
            F.when(
                (s_zh > s["en"]) & (s_zh > s["de"]) & (s_zh > s["fr"])
                & (s_zh > s["es"]), "zh")
            .when((s["en"] >= s["de"]) & (s["en"] >= s["fr"])
                  & (s["en"] >= s["es"]), "en")
            .when((s["de"] >= s["fr"]) & (s["de"] >= s["es"]), "de")
            .when(s["fr"] >= s["es"], "fr")
            .otherwise("es")
        )
        cols.append((pred_lang == F.col(lang_col)).alias("pass_lang"))
    flags = df.select(*cols)
    w = W.partitionBy("_text_hash")
    return flags.withColumn(
        "pass_dedup", F.col(id_col) == F.min(id_col).over(w)
    ).drop("_text_hash")


ALL_RULES = ("dedup", "quality", "gopher", "lang")


def kept_filter(
    flags: DataFrame, rules: tuple[str, ...] = ALL_RULES
) -> DataFrame:
    """Keep rows passing every selected rule (a rule is skipped when its
    flag column is absent, e.g. `lang` without ground truth)."""
    cond = F.lit(True)
    for r in rules:
        col = f"pass_{r}"
        if col in flags.columns:
            cond = cond & F.col(col)
    return flags.filter(cond)


def funnel_counts(flags: DataFrame) -> DataFrame:
    """One aggregation row: survivors at each stage + kept token total."""
    has_lang = "pass_lang" in flags.columns
    after_gopher = (
        F.col("pass_dedup") & F.col("pass_quality") & F.col("pass_gopher")
    )
    kept = after_gopher & F.col("pass_lang") if has_lang else after_gopher
    aggs = [
        F.count(F.lit(1)).alias("total_docs"),
        F.sum(F.col("pass_dedup").cast("long")).alias("after_dedup"),
        F.sum((F.col("pass_dedup") & F.col("pass_quality")).cast("long"))
        .alias("after_quality"),
        F.sum(after_gopher.cast("long")).alias("after_gopher"),
        F.sum(kept.cast("long")).alias("kept"),
        F.sum(F.when(kept, F.col("n_tokens"))).alias("kept_tokens"),
    ]
    return flags.agg(*aggs)
