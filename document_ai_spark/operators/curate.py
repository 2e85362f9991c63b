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
    include_rep: bool = False,
) -> DataFrame:
    """One scan -> (id, n_tokens, pass_dedup, pass_quality, pass_gopher
    [, pass_lang][, pass_rep]). pass_lang (language-ID agreement) is
    emitted only when a ground-truth lang column is available.
    include_rep=True appends the Gopher repetition flag (r5) IN the same
    scan — it is a pure column expression, so the funnel verbs ask for
    it here instead of paying a second text scan + id join."""
    from ..queries_base import scan_fanout

    # r6: the flag pack is a dozen regexes per row — fan out scans whose
    # file layout under-parallelizes them (guide §2.5; no-op otherwise)
    df = scan_fanout(df, key=id_col)
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
    if include_rep:
        from .repetition import rep_pass_expr

        cols.append(rep_pass_expr(t).alias("pass_rep"))
    flags = df.select(*cols)
    w = W.partitionBy("_text_hash")
    return flags.withColumn(
        "pass_dedup", F.col(id_col) == F.min(id_col).over(w)
    ).drop("_text_hash")


def neardup_keeper_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fuzzy-dedup stage (r3): MinHash signatures -> LSH band buckets ->
    candidate pairs -> connected components -> keeper = min id per cluster.
    Returns (id, pass_neardup) for EVERY input row (docs in no cluster
    pass). Production funnels dedup fuzzily, not just exactly — this is
    the cluster-keeper composition as a funnel stage.

    The pair generator is the SHARED builder (queries_base.
    minhash_band_pairs): the funnel's DuckDB oracle composes
    _sql_minhash_core, so one Spark-side construction must back both the
    documents-table queries and this engine or the oracles silently
    drift. Components converge in O(log diameter) rounds of hash joins
    (operators/similarity.connected_components)."""
    from ..queries_base import minhash_band_pairs
    from .similarity import dedup_clusters

    pairs = minhash_band_pairs(df, id_col=id_col, text_col=text_col)
    clusters = dedup_clusters(pairs)
    nd = clusters.select(
        F.col("doc_id").alias("_id"), F.col("is_keeper")
    )
    return (
        df.select(F.col(id_col).alias("_id"))
        .join(nd, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("is_keeper", F.lit(True)).alias("pass_neardup"),
        )
    )


def collapse_recrawls(
    df: DataFrame,
    id_col: str = "url",
    ts_col: str = "warc_ts",
    tiebreak_cols: tuple[str, ...] = ("main_text",),
) -> DataFrame:
    """Keep ONE row per id (latest ts): re-crawled urls otherwise sail
    through the id-keyed exact-dedup flag (same id = same keeper) and
    every flag join multiplies — 2 crawl rows x neardup x lm = 8 flag
    rows per url. Every curation entry point runs this first.

    Equal timestamps (WARC-Date is second-granular) break ties on the
    content columns in `tiebreak_cols` (those present in df), so the
    winner is a pure function of the data — never of partition order."""
    order = [F.col(ts_col).desc()] + [
        F.col(c).asc_nulls_first()
        for c in tiebreak_cols
        if c in df.columns
    ]
    w = W.partitionBy(id_col).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def adaptive_collapse(
    spark,
    extracted_path: str,
    materialize_dir: str | None = None,
    id_col: str = "url",
    ts_col: str = "warc_ts",
) -> tuple[DataFrame, str]:
    """Adaptive recrawl collapse for a curation entry point (r5 pair,
    same philosophy as extraction's salted='auto'): returns
    (collapsed_frame, mode).

    The collapse window is consumed by EVERY downstream flag stage plus
    the final semi-join write; left as lazy lineage it re-runs a
    full-row shuffle per consumer (measured 72-200 s vs 19 s for the
    neardup stage alone on the 16k bench slice). So:

    - id-unique inputs (the common recrawl-free shard) skip the window
      entirely — mode 'identity', flags read pruned parquet scans;
    - inputs WITH recrawls pay the window exactly once: the collapsed
      table is written to `materialize_dir` (idempotent _SUCCESS
      commit, so a crash between this write and the curated output
      resumes without recomputing) — mode 'materialized'. Callers with
      no workdir (the `curate` CLI verb) pass materialize_dir=None and
      get a localCheckpoint instead — mode 'checkpointed' (same
      run-once guarantee, executor-local storage, no resume).

    The uniqueness probe is a countDistinct over the id column only
    (column-pruned scan); the row count comes from parquet footers
    (driver-side metadata, no job)."""
    import os

    from ..pipeline import _parquet_rows

    raw = spark.read.parquet(extracted_path)
    n_rows = _parquet_rows(extracted_path)
    n_ids = raw.select(id_col).distinct().count()
    if n_ids == n_rows:
        return raw, "identity"
    if materialize_dir is None:
        return (
            collapse_recrawls(raw, id_col=id_col, ts_col=ts_col)
            .localCheckpoint(),
            "checkpointed",
        )
    if not os.path.exists(os.path.join(materialize_dir, "_SUCCESS")):
        collapse_recrawls(raw, id_col=id_col, ts_col=ts_col).write.mode(
            "overwrite"
        ).parquet(materialize_dir)
    return spark.read.parquet(materialize_dir), "materialized"


def lm_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab: DataFrame | None = None,
) -> DataFrame:
    """CCNet-style LM stage (r4): (id, pass_lm) where pass_lm is true
    for docs outside the worst perplexity bucket (lm_bucket != 'tail')
    under operators/quality_lm's unigram scorer — self-scored by
    default, or against a reference (word, count) vocab."""
    from .quality_lm import lm_quality_scores

    s = lm_quality_scores(df, vocab=vocab, id_col=id_col,
                          text_col=text_col)
    return s.select(
        F.col(id_col), (F.col("lm_bucket") != "tail").alias("pass_lm")
    )


def clf_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    labels: DataFrame | None = None,
    keep_threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Learned-classifier stage (r5): (id, pass_clf) from the
    reference-vs-crawl LR in operators/quality_clf. Training labels:
    `labels` (id, label BOOLEAN) when the caller has a reference
    corpus; otherwise BOOTSTRAPPED from the frozen heuristic rule
    packs (label = pass_quality AND pass_gopher) — the
    GPT-3/fastText-style trick of training the learned filter against
    a trusted signal, which then generalizes past the hard
    thresholds. The fit runs on a bounded deterministic sample
    (quality_clf.N_FIT_SAMPLE, fixed seed); scoring is one codegen'd
    scan. Degenerate label sets (everything one class) skip the fit
    and pass every row — no signal is no filter."""
    from .quality_clf import score_quality, train_quality_classifier

    if labels is None:
        cf = curation_flags(df, id_col, text_col, lang_col=None)
        labels = cf.select(
            F.col(id_col),
            (F.col("pass_quality") & F.col("pass_gopher")).alias("label"),
        )
    # the label lineage is consumed by several actions (two emptiness
    # probes + the bounded fit sample) and callers stack heavy plans
    # under it (the curate verbs bootstrap labels from the already-
    # joined flag frame, whose lineage includes the LSH pipeline):
    # checkpoint the two tiny columns so that plan runs exactly once
    labels = labels.select(F.col(id_col), "label").localCheckpoint()
    lab = df.select(F.col(id_col), F.col(text_col)).join(labels, id_col)
    pos = lab.filter(F.col("label")).select(text_col)
    neg = lab.filter(~F.col("label")).select(text_col)
    # bounded emptiness probes (limit(1) short-circuits the scan)
    if pos.limit(1).count() == 0 or neg.limit(1).count() == 0:
        return df.select(
            F.col(id_col), F.lit(True).alias("pass_clf")
        )
    model = train_quality_classifier(pos, neg, text_col=text_col,
                                     seed=seed)
    scored = score_quality(
        model, df.select(F.col(id_col), F.col(text_col)),
        text_col=text_col, keep_threshold=keep_threshold,
    )
    return scored.select(F.col(id_col), "pass_clf")


ALL_RULES = (
    "dedup", "neardup", "quality", "gopher", "rep", "lang", "lm", "clf"
)


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


def funnel_counts(
    flags: DataFrame, rules: tuple[str, ...] | None = None
) -> DataFrame:
    """One aggregation row: survivors at each stage + kept token total.
    Stage order: exact dedup -> near-dup cluster keeper -> quality ->
    gopher -> language -> LM bucket -> learned classifier. A stage
    appears only when its flag column is present AND (when `rules` is
    given) its rule is selected — curation_flags always emits
    quality/gopher, so a `curate --rules dedup,clf` run would otherwise
    print a funnel whose `kept` disagrees with what kept_filter wrote.
    Default rules=None counts every present flag (the oracle-checked
    curation_funnel shape). The LM and classifier stages additionally
    report the count ENTERING them (`into_lm`/`into_clf`) — named for
    the stage they feed, not for whichever optional stage happens to
    precede them (a funnel with clf but no lm would otherwise print a
    phantom LM rung)."""
    def on(rule: str) -> bool:
        return (f"pass_{rule}" in flags.columns) and (
            rules is None or rule in rules
        )

    cum = F.lit(True)
    aggs = [F.count(F.lit(1)).alias("total_docs")]
    for rule, rung in (
        ("dedup", "after_dedup"),
        ("neardup", "after_neardup"),
        ("quality", "after_quality"),
        ("gopher", "after_gopher"),
        ("rep", "after_rep"),
        ("lang", None),  # feeds the chain; no rung of its own (frozen
        #                  oracle-checked curation_funnel schema)
        ("lm", "into_lm"),
        ("clf", "into_clf"),
    ):
        if not on(rule):
            continue
        if rung is not None and rung.startswith("into_"):
            # count entering the stage (cum BEFORE conjoining its flag)
            aggs.append(F.sum(cum.cast("long")).alias(rung))
            cum = cum & F.col(f"pass_{rule}")
        else:
            cum = cum & F.col(f"pass_{rule}")
            if rung is not None:
                aggs.append(F.sum(cum.cast("long")).alias(rung))
    aggs += [
        F.sum(cum.cast("long")).alias("kept"),
        F.sum(F.when(cum, F.col("n_tokens"))).alias("kept_tokens"),
    ]
    return flags.agg(*aggs)
