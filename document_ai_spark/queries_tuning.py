"""A7 proper: config-sweep log + best-config-per-metric selection, oracle-
checked on the driver tables.

The reference's tuner samples hyperparameter configs, evaluates each over
the corpus into a results log, then keeps the max-value config per metric
(/root/reference/ai_documents/analysis/cv/tuning.py:291-345, :347-397).
Here the same shape runs as one relational plan: a deterministic config
grid (LCG arithmetic — engine-portable "random search") is broadcast
against per-document features computed in ONE corpus pass, aggregated into
a sweep log (one row per config x metrics), melted, and ranked per metric
with ties broken toward the lowest config_id. The kernel-threshold analog
(real extraction sweep over the golden corpus) is operators/tuning.py;
this query is its oracle-checkable twin over the driver's documents table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .queries import _t
from .queries_ml import _SQL_WORDS, _norm_words

N_CONFIGS = 12
METRICS = ["pass_rate", "agree_rate", "mean_tokens_pass"]


def q_best_config_per_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    n_tokens = F.size(_norm_words()).cast("long")
    n_punct = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(r"([.,;:!?])"), F.lit(1))
    ).cast("long")
    base = d.select(
        n_tokens.alias("n_tokens"), n_punct.alias("n_punct")
    )
    grid = F.broadcast(
        spark.range(N_CONFIGS).select(
            F.col("id").cast("int").alias("config_id"),
            (5 + (F.col("id") * 17) % 60).cast("int").alias("min_tok"),
            (1 + (F.col("id") * 5) % 7).cast("int").alias("max_p"),
        )
    )
    j = base.crossJoin(grid)
    cfg_pass = (F.col("n_tokens") >= F.col("min_tok")) & (
        F.col("n_punct") * 10 <= F.col("n_tokens") * F.col("max_p")
    )
    frozen_pass = (
        (F.col("n_tokens") >= 20)
        & (F.col("n_tokens") <= 100000)
        & (F.col("n_punct") * 10 <= F.col("n_tokens") * 3)
    )
    log = j.groupBy("config_id", "min_tok", "max_p").agg(
        F.round(F.avg(cfg_pass.cast("int")), 6).alias("pass_rate"),
        F.round(
            F.avg((cfg_pass == frozen_pass).cast("int")), 6
        ).alias("agree_rate"),
        F.round(
            F.coalesce(F.avg(F.when(cfg_pass, F.col("n_tokens"))),
                       F.lit(0.0)),
            6,
        ).alias("mean_tokens_pass"),
    )
    # melt via stack(): a per-metric union re-plans the whole sweep
    # aggregation (and its corpus scan) once per metric
    stack_args = ", ".join(f"'{m}', {m}" for m in METRICS)
    melted = log.select(
        F.expr(f"stack({len(METRICS)}, {stack_args}) AS (metric, value)"),
        "config_id", "min_tok", "max_p",
    )
    win = W.partitionBy("metric").orderBy(
        F.col("value").desc(), F.col("config_id")
    )
    return (
        melted.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") == 1)
        .select("metric", "value", "config_id", "min_tok", "max_p")
    )


SQL_BEST_CONFIG_PER_METRIC = rf"""
WITH base AS (
  SELECT len({_SQL_WORDS}) AS n_tokens,
         len(regexp_extract_all(text, '([.,;:!?])', 1)) AS n_punct
  FROM documents),
grid AS (
  SELECT CAST(i AS INT) AS config_id,
         CAST(5 + (i * 17) % 60 AS INT) AS min_tok,
         CAST(1 + (i * 5) % 7 AS INT) AS max_p
  FROM (SELECT unnest(range(0, {N_CONFIGS})) AS i)),
j AS (
  SELECT *,
         n_tokens >= min_tok AND n_punct * 10 <= n_tokens * max_p
             AS cfg_pass,
         n_tokens >= 20 AND n_tokens <= 100000
             AND n_punct * 10 <= n_tokens * 3 AS frozen_pass
  FROM base, grid),
log AS (
  SELECT config_id, min_tok, max_p,
         round(avg(CAST(cfg_pass AS INT)), 6) AS pass_rate,
         round(avg(CAST(cfg_pass = frozen_pass AS INT)), 6) AS agree_rate,
         round(COALESCE(avg(n_tokens) FILTER (cfg_pass), 0.0), 6)
             AS mean_tokens_pass
  FROM j GROUP BY config_id, min_tok, max_p),
melted AS (
  SELECT 'pass_rate' AS metric, pass_rate AS value,
         config_id, min_tok, max_p FROM log
  UNION ALL
  SELECT 'agree_rate', agree_rate, config_id, min_tok, max_p FROM log
  UNION ALL
  SELECT 'mean_tokens_pass', mean_tokens_pass, config_id, min_tok, max_p
  FROM log)
SELECT metric, value, config_id, min_tok, max_p
FROM melted
QUALIFY row_number() OVER (PARTITION BY metric
                           ORDER BY value DESC, config_id) = 1
"""


def q_best_config_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tuner's sectioned selection (parse_random_search_results keeps
    the max-value config separately for by_file / by_block / by_key,
    tuning.py:347-397): here the grouping dimension is the document
    language — best config per (metric, lang)."""
    d = _t(spark, sf_dir, "documents")
    n_tokens = F.size(_norm_words()).cast("long")
    n_punct = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(r"([.,;:!?])"), F.lit(1))
    ).cast("long")
    base = d.select(
        "lang", n_tokens.alias("n_tokens"), n_punct.alias("n_punct")
    )
    grid = F.broadcast(
        spark.range(N_CONFIGS).select(
            F.col("id").cast("int").alias("config_id"),
            (5 + (F.col("id") * 17) % 60).cast("int").alias("min_tok"),
            (1 + (F.col("id") * 5) % 7).cast("int").alias("max_p"),
        )
    )
    j = base.crossJoin(grid)
    cfg_pass = (F.col("n_tokens") >= F.col("min_tok")) & (
        F.col("n_punct") * 10 <= F.col("n_tokens") * F.col("max_p")
    )
    log = j.groupBy("lang", "config_id", "min_tok", "max_p").agg(
        F.round(F.avg(cfg_pass.cast("int")), 6).alias("pass_rate"),
        F.round(
            F.coalesce(F.avg(F.when(cfg_pass, F.col("n_tokens"))),
                       F.lit(0.0)), 6,
        ).alias("mean_tokens_pass"),
    )
    ms = ("pass_rate", "mean_tokens_pass")
    stack_args = ", ".join(f"'{m}', {m}" for m in ms)
    melted = log.select(
        "lang",
        F.expr(f"stack({len(ms)}, {stack_args}) AS (metric, value)"),
        "config_id", "min_tok", "max_p",
    )
    win = W.partitionBy("lang", "metric").orderBy(
        F.col("value").desc(), F.col("config_id")
    )
    return (
        melted.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") == 1)
        .select("lang", "metric", "value", "config_id", "min_tok", "max_p")
    )


SQL_BEST_CONFIG_BY_LANG = rf"""
WITH base AS (
  SELECT lang,
         len({_SQL_WORDS}) AS n_tokens,
         len(regexp_extract_all(text, '([.,;:!?])', 1)) AS n_punct
  FROM documents),
grid AS (
  SELECT CAST(i AS INT) AS config_id,
         CAST(5 + (i * 17) % 60 AS INT) AS min_tok,
         CAST(1 + (i * 5) % 7 AS INT) AS max_p
  FROM (SELECT unnest(range(0, {N_CONFIGS})) AS i)),
j AS (
  SELECT *, n_tokens >= min_tok AND n_punct * 10 <= n_tokens * max_p
            AS cfg_pass
  FROM base, grid),
log AS (
  SELECT lang, config_id, min_tok, max_p,
         round(avg(CAST(cfg_pass AS INT)), 6) AS pass_rate,
         round(COALESCE(avg(n_tokens) FILTER (cfg_pass), 0.0), 6)
             AS mean_tokens_pass
  FROM j GROUP BY lang, config_id, min_tok, max_p),
melted AS (
  SELECT lang, 'pass_rate' AS metric, pass_rate AS value,
         config_id, min_tok, max_p FROM log
  UNION ALL
  SELECT lang, 'mean_tokens_pass', mean_tokens_pass, config_id, min_tok,
         max_p FROM log)
SELECT lang, metric, value, config_id, min_tok, max_p
FROM melted
QUALIFY row_number() OVER (PARTITION BY lang, metric
                           ORDER BY value DESC, config_id) = 1
"""
