"""URL canonicalization — pure column expressions (JVM-side, codegen'd;
no Python in the hot path), the normalization a crawl pipeline applies
before url-keyed dedup/partitioning.

Policy (deterministic, documented):
  1. scheme and host lowercase; userinfo stripped
  2. default ports stripped (:80 for http, :443 for https)
  3. fragment stripped
  4. tracking query params removed (utm_*, gclid, fbclid); a now-empty
     query string drops its '?'
  5. duplicate slashes in the path collapsed; trailing '/' kept (it is
     semantically significant)

`url_host` extracts the host; `registered_domain_psl` computes the real
eTLD+1 against the BUNDLED Public Suffix List snapshot
(data/public_suffix_snapshot.dat — a curated subset of
publicsuffix.org; swap in the canonical file on deployment) as a
broadcast join over distinct hosts. `registered_domain` stays as the
zero-join column-expression approximation (two labels, or three when
the suffix is a known two-level one like co.uk) — it is also the
fallback for hosts matching no PSL rule.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# known two-level public suffixes for the zero-join heuristic (the
# bundled PSL snapshot is the real path; this backstops hosts that
# match no PSL rule, and deployments that deleted the snapshot file)
TWO_LEVEL_SUFFIXES = (
    "co.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx",
)

_PSL_RESOURCE = "data/public_suffix_snapshot.dat"


def load_psl_suffixes() -> list[str]:
    """Plain rules from the bundled PSL snapshot (wildcard '*.' and
    exception '!' rules are not modeled — documented in the snapshot
    header). Empty list when the resource is missing (the callers then
    fall back to the heuristic)."""
    from importlib import resources

    try:
        text = (
            resources.files("document_ai_spark")
            .joinpath(_PSL_RESOURCE)
            .read_text("utf-8")
        )
    except Exception:
        return []
    out = []
    for line in text.splitlines():
        line = line.split("//", 1)[0].strip().lower()
        if not line or line.startswith(("*", "!")):
            continue
        out.append(line)
    return out


def psl_table(spark):
    """The bundled snapshot as a (suffix STRING) DataFrame (broadcast by
    every consumer — a few hundred rows), or None when unavailable."""
    suffixes = load_psl_suffixes()
    if not suffixes:
        return None
    return spark.createDataFrame([(s,) for s in suffixes], ["suffix"])


def url_host(url: Column) -> Column:
    """Lowercased host (no scheme, userinfo, port, path)."""
    host = F.regexp_extract(
        url, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://(?:[^/@]*@)?([^/:?#]+)", 1
    )
    return F.lower(host)


def registered_domain(url: Column) -> Column:
    """eTLD+1 approximation: last two host labels, or three when the
    suffix is a known two-level one (co.uk etc.)."""
    host = url_host(url)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", parts[n - 2], parts[n - 1])
    last3 = F.concat_ws(".", parts[n - 3], parts[n - 2], parts[n - 1])
    is_two_level = last2.isin(*TWO_LEVEL_SUFFIXES)
    return (
        F.when(n <= 2, host)
        .when(is_two_level & (n >= 3), last3)
        .otherwise(last2)
    )


def with_url_columns(df, url_col: str = "url"):
    """Attach (url_norm, host, domain) — the standard crawl-table
    enrichment before url-keyed operations. Requires no UDF."""
    # materialize intermediates as real columns so expr() references hold
    u = F.trim(F.col(url_col))
    scheme = F.lower(
        F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://", 1)
    )
    rest = F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://", "")
    rest = F.regexp_replace(rest, r"^[^/@]*@", "")
    out = (
        df.withColumn("_scheme", scheme)
        .withColumn("_rest", rest)
        .withColumn(
            "_authority", F.regexp_extract("_rest", r"^([^/?#]*)", 1)
        )
        .withColumn(
            "_tail",
            F.expr(
                "substring(_rest, length(_authority) + 1)"
            ),
        )
        .withColumn(
            "_authority",
            F.when(
                (F.col("_scheme") == "http")
                & F.col("_authority").endswith(":80"),
                F.expr("substring(_authority, 1, length(_authority) - 3)"),
            )
            .when(
                (F.col("_scheme") == "https")
                & F.col("_authority").endswith(":443"),
                F.expr("substring(_authority, 1, length(_authority) - 4)"),
            )
            .otherwise(F.col("_authority")),
        )
        .withColumn("_tail", F.regexp_replace("_tail", r"#.*$", ""))
        .withColumn("_path", F.regexp_extract("_tail", r"^([^?]*)", 1))
        .withColumn(
            "_query", F.expr("substring(_tail, length(_path) + 1)")
        )
        # tracking-param strip applies to the QUERY only: '&' is a legal
        # path-segment character, and matching over the whole tail let a
        # literal '&utm_...=' inside the path swallow the rest of the url
        .withColumn(
            "_query",
            F.regexp_replace(
                "_query", r"([?&])(utm_[^=&]*|gclid|fbclid)=[^&]*", r"$1"
            ),
        )
        .withColumn("_query", F.regexp_replace("_query", r"\?&+", "?"))
        .withColumn("_query", F.regexp_replace("_query", r"&&+", "&"))
        .withColumn("_query", F.regexp_replace("_query", r"[?&]+$", ""))
        .withColumn("_path", F.regexp_replace("_path", r"//+", "/"))
        .withColumn(
            "url_norm",
            F.concat(
                "_scheme", F.lit("://"), F.lower("_authority"), "_path",
                "_query",
            ),
        )
        .withColumn("host", url_host(F.col(url_col)))
        .withColumn("domain", registered_domain(F.col(url_col)))
    )
    return out.drop(
        "_scheme", "_rest", "_authority", "_tail", "_path", "_query"
    )


def registered_domain_psl(df, psl=None, url_col: str = "url",
                          out_col: str = "domain"):
    """eTLD+1 with a REAL public-suffix list: `psl(suffix STRING)` is
    broadcast, the LONGEST matching label-tail wins, and the registered
    domain is that suffix plus one label. `psl=None` loads the bundled
    snapshot (psl_table); when that is unavailable too, the whole column
    falls back to the heuristic. Hosts matching no suffix fall back to
    the two-label heuristic. Wildcard/exception PSL rules are not
    modeled (document before use).

    Scale shape: the mapping is computed on DISTINCT hosts (domain
    cardinality, tiny next to the row count), each host explodes its
    <= 5 candidate tails against the broadcast suffix table, and rows
    join the mapping back on host — the production pattern the heuristic
    `registered_domain` approximates, no UDF anywhere."""
    if psl is None:
        psl = psl_table(df.sparkSession)
        if psl is None:
            return df.withColumn(
                out_col, registered_domain(F.col(url_col))
            )
    base = df.withColumn("_host", url_host(F.col(url_col)))
    hosts = base.select("_host").distinct()
    parts = F.split(F.col("_host"), r"\.")
    n = F.size(parts)
    cand = hosts.select(
        "_host",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.least(n - 1, F.lit(5)),
                                                F.lit(1))),
                lambda k: F.struct(
                    F.concat_ws(".", F.slice(parts, n - k + 1, k)).alias(
                        "suffix"
                    ),
                    k.alias("slen"),
                ),
            )
        ).alias("_cand"),
    ).select(
        "_host",
        F.col("_cand.suffix").alias("suffix"),
        F.col("_cand.slen").alias("_slen"),
    )
    hit = (
        cand.join(F.broadcast(psl.select("suffix")), "suffix")
        .groupBy("_host")
        .agg(F.max_by("suffix", "_slen").alias("_suffix"),
             F.max("_slen").alias("_slen"))
    )
    hp = F.split(F.col("_host"), r"\.")
    mapping = hosts.join(hit, "_host", "left").select(
        "_host",
        F.when(
            F.col("_suffix").isNotNull()
            & (F.size(hp) > F.col("_slen")),
            F.concat_ws(
                ".", hp[F.size(hp) - F.col("_slen") - 1], F.col("_suffix")
            ),
        ).alias("_psl_domain"),
    )
    out = base.join(F.broadcast(mapping), "_host", "left").withColumn(
        out_col,
        F.coalesce(
            F.col("_psl_domain"), registered_domain(F.col(url_col))
        ),
    )
    return out.drop("_host", "_psl_domain")


def host_metrics(extracted, url_col: str = "url", psl=None):
    """Per-registered-domain crawl stats over an extracted table: docs,
    raw bytes, parse failures — the rollup an operator watches for a
    misbehaving host. Domains are true eTLD+1 via the bundled PSL
    snapshot (broadcast over distinct hosts); one scan + one uniform-key
    aggregation."""
    e = registered_domain_psl(extracted, psl, url_col=url_col)
    return e.groupBy("domain").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("html_bytes").alias("bytes"),
        F.sum(F.when(~F.col("parse_ok"), 1).otherwise(0)).alias(
            "parse_failures"
        ),
    )
