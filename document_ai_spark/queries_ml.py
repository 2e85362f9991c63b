"""Training-data pipeline operators over documents/embeddings: dedup
(exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding cosine), similarity
search (brute-force + LSH-bucketed ANN), text analysis (lang-id, quality,
token counts, fingerprints).

Oracle-parity tricks:
  - Hashing uses md5 hex strings (identical in Spark and DuckDB); MinHash
    takes the lexicographic MIN of md5(seed||':'||shingle) so no cross-engine
    integer conversion is needed.
  - Shingles come from the same frozen normalization in both engines:
    split(regexp_replace(trim(text), '\\s+', ' '), ' ').
  - Cosine/Jaccard are rounded to 6 dp in both engines and ranked on the
    rounded value.
SimHash and the LSH-bucketed ANN are Spark-only (rows-only driver check):
their bit-level math has no cheap ANSI-SQL twin.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .queries import _t

N_MINHASH = 8
N_BANDS = 4  # 2 hashes per band
SHINGLE_W = 3


def _norm_words(col: str = "text") -> F.Column:
    return F.split(
        F.regexp_replace(F.trim(F.col(col)), r"\s+", " "), " "
    )


def _shingles(words: F.Column) -> F.Column:
    """Word 3-gram shingles; empty array for docs with < 3 words."""
    n = F.size(words)
    return F.when(
        n >= SHINGLE_W,
        F.transform(
            F.sequence(F.lit(0), n - SHINGLE_W),
            lambda i: F.concat_ws(
                " ", words[i], words[i + 1], words[i + 2]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


_SQL_WORDS = "str_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')"
# words materialized once per row in a CTE — inlining the split into every
# element access is O(words^2) per doc in DuckDB too
_SQL_WORDS_CTE = f"SELECT doc_id, {_SQL_WORDS} AS words FROM documents"
_SQL_SHINGLES_FROM_WORDS = """
    CASE WHEN len(words) >= 3 THEN
      list_transform(range(1, len(words) - 1),
        i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
    ELSE [] END
"""


# --------------------------------------------------------------------------
# Exact dedup: md5-hash groupBy, keeper = min doc_id per hash
# --------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    from pyspark.sql.window import Window as W

    h = d.withColumn("text_hash", F.md5(F.encode("text", "UTF-8")))
    w = W.partitionBy("text_hash")
    return h.withColumn(
        "is_keeper", F.col("doc_id") == F.min("doc_id").over(w)
    ).select("doc_id", "text_hash", "is_keeper")


SQL_DEDUP_EXACT = """
SELECT doc_id, md5(text) AS text_hash,
       doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_keeper
FROM documents
"""


# --------------------------------------------------------------------------
# MinHash signatures + LSH band keys (md5-hex min — engine-portable)
# --------------------------------------------------------------------------

def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    # materialize `words` once per row — inlining the split() inside the
    # transform() lambda re-evaluates it per element (O(words^2) per doc)
    sh = d.withColumn("words", _norm_words()).select(
        "doc_id", F.explode(_shingles(F.col("words"))).alias("shingle")
    ).distinct()
    aggs = [
        F.min(F.md5(F.encode(F.concat_ws(":", F.lit(str(j)), "shingle"),
                             "UTF-8"))).alias(f"mh_{j}")
        for j in range(N_MINHASH)
    ]
    sig = sh.groupBy("doc_id").agg(*aggs)
    for b in range(N_BANDS):
        sig = sig.withColumn(
            f"band_{b}", F.concat(F.col(f"mh_{2 * b}"), F.col(f"mh_{2 * b + 1}"))
        )
    return sig


def _sql_minhash_core() -> str:
    mins = ",\n".join(
        f"MIN(md5('{j}' || ':' || shingle)) AS mh_{j}"
        for j in range(N_MINHASH)
    )
    return f"""
  SELECT doc_id, {mins}
  FROM (SELECT DISTINCT doc_id,
               unnest({_SQL_SHINGLES_FROM_WORDS}) AS shingle
        FROM ({_SQL_WORDS_CTE}))
  GROUP BY doc_id
"""


SQL_MINHASH_SIGNATURES = f"""
SELECT doc_id, mh_0, mh_1, mh_2, mh_3, mh_4, mh_5, mh_6, mh_7,
       mh_0 || mh_1 AS band_0, mh_2 || mh_3 AS band_1,
       mh_4 || mh_5 AS band_2, mh_6 || mh_7 AS band_3
FROM ({_sql_minhash_core()})
"""


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any LSH band bucket."""
    sig = q_minhash_signatures(spark, sf_dir)
    bands = None
    for b in range(N_BANDS):
        part = sig.select(
            "doc_id", F.lit(b).alias("band_no"),
            F.col(f"band_{b}").alias("band_key"),
        )
        bands = part if bands is None else bands.union(part)
    a = bands.select(
        F.col("doc_id").alias("doc_a"), "band_no", "band_key"
    )
    bb = bands.select(
        F.col("doc_id").alias("doc_b"), "band_no", "band_key"
    )
    return (
        a.join(bb, ["band_no", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


SQL_MINHASH_LSH_PAIRS = f"""
WITH sig AS ({_sql_minhash_core()}),
bands AS (
  SELECT doc_id, 0 AS band_no, mh_0 || mh_1 AS band_key FROM sig
  UNION ALL SELECT doc_id, 1, mh_2 || mh_3 FROM sig
  UNION ALL SELECT doc_id, 2, mh_4 || mh_5 FROM sig
  UNION ALL SELECT doc_id, 3, mh_6 || mh_7 FROM sig)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band_no = b.band_no AND a.band_key = b.band_key
 AND a.doc_id < b.doc_id
"""


# --------------------------------------------------------------------------
# n-gram Jaccard similarity vs a probe document (doc_id 0)
# --------------------------------------------------------------------------

def q_ngram_jaccard_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    sh = d.withColumn("words", _norm_words()).select(
        "doc_id", F.array_distinct(_shingles(F.col("words"))).alias("sh")
    )
    probe = sh.filter(F.col("doc_id") == 0).select(
        F.col("sh").alias("probe_sh")
    )
    j = sh.crossJoin(F.broadcast(probe))
    inter = F.size(F.array_intersect("sh", "probe_sh"))
    union = F.size("sh") + F.size("probe_sh") - inter
    return j.select(
        "doc_id",
        F.round(
            F.when(union > 0, inter.cast("double") / union).otherwise(0.0), 6
        ).alias("jaccard"),
    )


SQL_NGRAM_JACCARD_PROBE = f"""
WITH sh AS (SELECT doc_id, list_distinct({_SQL_SHINGLES_FROM_WORDS}) AS sh
            FROM ({_SQL_WORDS_CTE})),
probe AS (SELECT sh AS probe_sh FROM sh WHERE doc_id = 0)
SELECT doc_id,
       round(CASE WHEN len(sh) + len(probe_sh)
                       - len(list_intersect(sh, probe_sh)) > 0
             THEN CAST(len(list_intersect(sh, probe_sh)) AS DOUBLE)
                  / (len(sh) + len(probe_sh)
                     - len(list_intersect(sh, probe_sh)))
             ELSE 0.0 END, 6) AS jaccard
FROM sh, probe
"""


# --------------------------------------------------------------------------
# Embedding cosine: brute-force top-k vs probe vector (vec_id 0)
# --------------------------------------------------------------------------

def _cosine_to_probe(e: DataFrame, probe: DataFrame) -> DataFrame:
    dv = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    pv = F.transform(F.col("probe_vec"), lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(dv, pv, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(dv, F.lit(0.0), lambda acc, v: acc + v * v)
    )
    nb = F.sqrt(
        F.aggregate(pv, F.lit(0.0), lambda acc, v: acc + v * v)
    )
    return e.crossJoin(F.broadcast(probe)).select(
        "vec_id", F.round(dot / (na * nb), 6).alias("cosine")
    )


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    probe = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("probe_vec")
    )
    cos = _cosine_to_probe(e, probe)
    return (
        cos.filter(F.col("vec_id") != 0)
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(20)
    )


SQL_ANN_COSINE_TOPK = """
WITH probe AS (SELECT embedding AS probe_vec FROM embeddings
               WHERE vec_id = 0),
cos AS (
  SELECT vec_id,
         round(
           list_sum(list_transform(list_zip(
             list_transform(embedding, x -> CAST(x AS DOUBLE)),
             list_transform(probe_vec, x -> CAST(x AS DOUBLE))),
             p -> p[1] * p[2]))
           / (sqrt(list_sum(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
              * sqrt(list_sum(list_transform(probe_vec,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)
             AS cosine
  FROM embeddings, probe)
SELECT vec_id, cosine FROM cos WHERE vec_id <> 0
ORDER BY cosine DESC, vec_id LIMIT 20
"""


# --------------------------------------------------------------------------
# Embedding near-dup pairs above a cosine threshold (small-N exact;
# the LSH-bucketed variant below is the 10^12-scale path)
# --------------------------------------------------------------------------

def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    lab = e.select("vec_id", "label", "embedding")
    a = lab.select(
        F.col("vec_id").alias("id_a"), F.col("label").alias("lab_a"),
        F.col("embedding").alias("emb_a"),
    )
    b = lab.select(
        F.col("vec_id").alias("id_b"), F.col("label").alias("lab_b"),
        F.col("embedding").alias("emb_b"),
    )
    # block on label to bound the pair explosion (the scale-out analog
    # buckets by LSH signature instead)
    da = F.transform(F.col("emb_a"), lambda x: x.cast("double"))
    db = F.transform(F.col("emb_b"), lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(da, db, lambda x, y: x * y), F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(da, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(db, F.lit(0.0), lambda acc, v: acc + v * v))
    return (
        a.join(b, (F.col("lab_a") == F.col("lab_b"))
               & (F.col("id_a") < F.col("id_b")))
        .withColumn("cosine", F.round(dot / (na * nb), 6))
        .filter(F.col("cosine") > 0.95)
        .select("id_a", "id_b", "cosine")
    )


SQL_EMBEDDING_NEAR_DUPS = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(
         list_sum(list_transform(list_zip(
           list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
           list_transform(b.embedding, x -> CAST(x AS DOUBLE))),
           p -> p[1] * p[2]))
         / (sqrt(list_sum(list_transform(a.embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * sqrt(list_sum(list_transform(b.embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS cosine
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(
         list_sum(list_transform(list_zip(
           list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
           list_transform(b.embedding, x -> CAST(x AS DOUBLE))),
           p -> p[1] * p[2]))
         / (sqrt(list_sum(list_transform(a.embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * sqrt(list_sum(list_transform(b.embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) > 0.95
"""


# --------------------------------------------------------------------------
# SimHash (Spark-only, rows-only driver check): vectorized pandas UDF
# --------------------------------------------------------------------------

_SIMHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("simhash", T.LongType()),
    ]
)


def _simhash_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import hashlib

    for pdf in it:
        out_ids, out_hashes = [], []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            tokens = (text or "").split()
            acc = np.zeros(64, dtype=np.int64)
            for tok in tokens:
                h = np.uint64(int.from_bytes(
                    hashlib.md5(tok.encode()).digest()[:8], "big"
                ))
                bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                acc += np.where(bits == np.uint64(1), 1, -1)
            sh = int(((acc > 0).astype(np.uint64)
                      << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))
            out_ids.append(doc_id)
            out_hashes.append(sh - (1 << 64) if sh >= (1 << 63) else sh)
        yield pd.DataFrame({"doc_id": out_ids, "simhash": out_hashes})


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInPandas(_simhash_batches, schema=_SIMHASH_SCHEMA)


# --------------------------------------------------------------------------
# LSH-bucketed ANN (Spark-only): random-hyperplane signs, deterministic
# planes seeded from the dimension index — the 10^12-scale similarity path
# --------------------------------------------------------------------------

_ANN_BUCKET_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("bucket", T.IntegerType()),
    ]
)

N_PLANES = 8


def _plane_matrix(dim: int) -> np.ndarray:
    rng = np.random.RandomState(1234)
    return rng.standard_normal((N_PLANES, dim))


def _ann_bucket_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    planes = None
    for pdf in it:
        mat = np.stack(pdf["embedding"].to_numpy())
        if planes is None:
            planes = _plane_matrix(mat.shape[1])
        signs = (mat @ planes.T) > 0
        buckets = signs.dot(1 << np.arange(N_PLANES)).astype(np.int32)
        yield pd.DataFrame(
            {"vec_id": pdf["vec_id"], "bucket": buckets}
        )


def q_ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return e.mapInPandas(_ann_bucket_batches, schema=_ANN_BUCKET_SCHEMA)


# --------------------------------------------------------------------------
# Text analysis: language-ID heuristic, quality score, token counts,
# min-k fingerprint
# --------------------------------------------------------------------------

_LANG_PATTERNS = {
    "en": r"\b(the|and|of|to|in|is)\b",
    "de": r"\b(der|die|und|das|ist|nicht)\b",
    "fr": r"\b(le|la|les|et|des|une)\b",
    "es": r"\b(el|los|que|de|una|por)\b",
}


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    scores = {
        k: F.size(F.regexp_extract_all(low, F.lit(pat), F.lit(1)))
        for k, pat in _LANG_PATTERNS.items()
    }
    zh = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(r"([\x{4e00}-\x{9fff}])"),
                             F.lit(1))
    )
    d2 = d.select(
        "doc_id", "lang",
        scores["en"].cast("long").alias("s_en"),
        scores["de"].cast("long").alias("s_de"),
        scores["fr"].cast("long").alias("s_fr"),
        scores["es"].cast("long").alias("s_es"),
        zh.cast("long").alias("s_zh"),
    )
    best = (
        F.when(
            (F.col("s_zh") > F.col("s_en")) & (F.col("s_zh") > F.col("s_de"))
            & (F.col("s_zh") > F.col("s_fr")) & (F.col("s_zh") > F.col("s_es")),
            "zh",
        )
        .when(
            (F.col("s_en") >= F.col("s_de")) & (F.col("s_en") >= F.col("s_fr"))
            & (F.col("s_en") >= F.col("s_es")),
            "en",
        )
        .when(
            (F.col("s_de") >= F.col("s_fr")) & (F.col("s_de") >= F.col("s_es")),
            "de",
        )
        .when(F.col("s_fr") >= F.col("s_es"), "fr")
        .otherwise("es")
    )
    return d2.select(
        "doc_id", "lang", F.col("s_en"), F.col("s_de"), F.col("s_fr"),
        F.col("s_es"), F.col("s_zh"), best.alias("pred_lang"),
    )


SQL_LANG_ID = r"""
WITH s AS (
  SELECT doc_id, lang,
    len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is)\b', 1))
        AS s_en,
    len(regexp_extract_all(lower(text), '\b(der|die|und|das|ist|nicht)\b', 1))
        AS s_de,
    len(regexp_extract_all(lower(text), '\b(le|la|les|et|des|une)\b', 1))
        AS s_fr,
    len(regexp_extract_all(lower(text), '\b(el|los|que|de|una|por)\b', 1))
        AS s_es,
    len(regexp_extract_all(text, '([\x{4e00}-\x{9fff}])', 1)) AS s_zh
  FROM documents)
SELECT doc_id, lang, s_en, s_de, s_fr, s_es, s_zh,
  CASE
    WHEN s_zh > s_en AND s_zh > s_de AND s_zh > s_fr AND s_zh > s_es THEN 'zh'
    WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
    WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
    WHEN s_fr >= s_es THEN 'fr'
    ELSE 'es' END AS pred_lang
FROM s
"""


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    words = _norm_words()
    n_tokens = F.size(words)
    stop_hits = F.size(
        F.regexp_extract_all(
            F.lower("text"), F.lit(r"\b(the|a|of|and|to|in|is)\b"), F.lit(1)
        )
    )
    punct = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(r"([.,;:!?])"), F.lit(1))
    )
    return d.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        punct.cast("long").alias("n_punct"),
        stop_hits.cast("long").alias("n_stopwords"),
        F.round(stop_hits.cast("double") / n_tokens, 6).alias(
            "stopword_ratio"
        ),
        F.round(
            F.length(F.regexp_replace("text", r"\s", "")).cast("double")
            / n_tokens,
            6,
        ).alias("avg_word_len"),
        (
            (n_tokens >= 20)
            & (n_tokens <= 100000)
            & (punct * 10 <= n_tokens * 3)
        ).alias("quality_ok"),
    )


SQL_QUALITY_SCORE = rf"""
WITH b AS (
  SELECT doc_id,
    len({_SQL_WORDS}) AS n_tokens,
    len(regexp_extract_all(text, '([.,;:!?])', 1)) AS n_punct,
    len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is)\b', 1))
        AS n_stopwords,
    length(regexp_replace(text, '\s', '', 'g')) AS n_nonspace
  FROM documents)
SELECT doc_id, n_tokens, n_punct, n_stopwords,
       round(CAST(n_stopwords AS DOUBLE) / n_tokens, 6) AS stopword_ratio,
       round(CAST(n_nonspace AS DOUBLE) / n_tokens, 6) AS avg_word_len,
       n_tokens >= 20 AND n_tokens <= 100000 AND n_punct * 10 <= n_tokens * 3
           AS quality_ok
FROM b
"""


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    ws_tokens = F.size(_norm_words())
    bpe_ish = F.size(
        F.regexp_extract_all(
            F.lower("text"), F.lit(r"([a-z]+|[0-9]+|[^a-z0-9\s])"), F.lit(1)
        )
    )
    return d.select(
        "doc_id",
        ws_tokens.cast("long").alias("ws_tokens"),
        bpe_ish.cast("long").alias("bpe_tokens"),
    )


SQL_TOKEN_COUNT = rf"""
SELECT doc_id,
       len({_SQL_WORDS}) AS ws_tokens,
       len(regexp_extract_all(lower(text), '([a-z]+|[0-9]+|[^a-z0-9\s])', 1))
           AS bpe_tokens
FROM documents
"""


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-k (k=5) document fingerprint over shingle hashes, as a joined
    string (engine-portable)."""
    d = _t(spark, sf_dir, "documents")
    sh = d.withColumn("words", _norm_words()).select(
        "doc_id", F.explode(_shingles(F.col("words"))).alias("shingle")
    )
    hashed = sh.select(
        "doc_id", F.md5(F.encode("shingle", "UTF-8")).alias("h")
    ).distinct()
    return hashed.groupBy("doc_id").agg(
        F.concat_ws(
            ",", F.slice(F.array_sort(F.collect_set("h")), 1, 5)
        ).alias("fingerprint")
    )


SQL_FINGERPRINT = f"""
SELECT doc_id,
       array_to_string(list_sort(list(DISTINCT md5(shingle)))[1:5], ',')
           AS fingerprint
FROM (SELECT DISTINCT doc_id,
             unnest({_SQL_SHINGLES_FROM_WORDS}) AS shingle
      FROM ({_SQL_WORDS_CTE}))
GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# Scale-path similarity (rows-only driver checks: KMeans / iterative CC)
# --------------------------------------------------------------------------

def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k vs probe vec 0 (coarse KMeans quantizer +
    nprobe nearest lists — the 10^12-scale ANN path)."""
    from .operators.similarity import ivf_topk

    e = _t(spark, sf_dir, "embeddings")
    return ivf_topk(e, probe_vec_id=0, k=10)


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash/LSH candidate pairs -> duplicate clusters via iterative
    min-label propagation with pointer jumping (O(log diameter) rounds)."""
    from .operators.similarity import dedup_clusters

    pairs = q_minhash_lsh_pairs(spark, sf_dir)
    return dedup_clusters(pairs)


# --------------------------------------------------------------------------
# "Find next right word" in 1-D text (the reference's signature geometric
# KV query, document_parsing.py:132-198, flattened to text order): for each
# occurrence of a key, the word immediately after it.
# --------------------------------------------------------------------------

_KV_KEYS = ["spark", "window", "batch"]


def q_next_word_after_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    # Spark's regexp_extract needs a foldable pattern -> one branch per key,
    # unioned (3 keys; Catalyst still reads the table once per branch but
    # pushes the projection)
    parts = None
    for key in _KV_KEYS:
        nxt = F.regexp_extract(
            F.col("text"), rf"\b{key}\s+([a-z]+)", 1
        )
        part = d.select(
            "doc_id",
            F.lit(key).alias("key"),
            F.when(nxt == "", F.lit("<NOT_FOUND>")).otherwise(nxt).alias(
                "next_word"
            ),
        )
        parts = part if parts is None else parts.unionAll(part)
    return parts


SQL_NEXT_WORD_AFTER_KEY = r"""
SELECT doc_id, key,
       CASE WHEN v = '' OR v IS NULL THEN '<NOT_FOUND>' ELSE v END
           AS next_word
FROM (
  SELECT doc_id, key,
         regexp_extract(text, '\b' || key || '\s+([a-z]+)', 1) AS v
  FROM documents,
       (SELECT unnest(['spark','window','batch']) AS key))
"""


# --------------------------------------------------------------------------
# Winnowing fingerprint (rolling Rabin-Karp hash + window minima) — the
# classic local document fingerprint (Schleimer et al., "Winnowing").
# Vectorized pandas UDF; rows-only driver check (bit-level hashing).
# --------------------------------------------------------------------------

_WINNOW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("fingerprints", T.ArrayType(T.LongType())),
    ]
)

_RK_BASE = 257
_RK_MOD = (1 << 61) - 1
_KGRAM = 8
_WINDOW = 5


def _winnow_one(text: str) -> list[int]:
    s = " ".join((text or "").split()).lower()
    n = len(s)
    if n < _KGRAM:
        return []
    # rolling Rabin-Karp over k-grams
    base_k = pow(_RK_BASE, _KGRAM - 1, _RK_MOD)
    h = 0
    hashes = []
    for i, ch in enumerate(s):
        h = (h * _RK_BASE + ord(ch)) % _RK_MOD
        if i >= _KGRAM - 1:
            hashes.append(h)
            h = (h - ord(s[i - _KGRAM + 1]) * base_k) % _RK_MOD
    # winnowing: minimum per window, recorded once per run
    out = []
    last = -1
    for w in range(len(hashes) - _WINDOW + 1):
        window = hashes[w : w + _WINDOW]
        m = min(range(_WINDOW), key=lambda j: (window[j], j)) + w
        if m != last:
            out.append(hashes[m])
            last = m
    return out


def _winnow_batches(it):
    for pdf in it:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "fingerprints": [
                    _winnow_one(t) for t in pdf["text"]
                ],
            }
        )


def q_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInPandas(_winnow_batches, schema=_WINNOW_SCHEMA)


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing demo over driver tables: documents' text bytes as
    opaque image payloads -> feature extraction via the stubbed decoder
    (operators/multimodal.py). Rows-only driver check."""
    from .operators.multimodal import MEDIA_SCHEMA, image_features

    d = _t(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("image/x-fake").alias("mime"),
        F.struct(
            F.lit(16).alias("width"),
            F.lit(16).alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )
    assert [f.name for f in MEDIA_SCHEMA.fields] == [
        "media_id", "kind", "payload", "mime", "meta"
    ]
    return image_features(media)
