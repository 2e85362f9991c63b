"""Training-mix composition: deterministic per-domain sampling weights —
the step that turns a curated corpus into the mixture a training run
actually consumes (e.g. upsample wikipedia 3x, downsample common-crawl
to 0.6).

Everything is content-hash thresholded (never rand()): the keep/copy
decision for a row is a pure function of (id, seed), so the mixture is
reproducible across runs, partitionings and engines — the same property
the train/val/test split relies on (CLAUDE.md oracle-parity rules).

Scale shape: one scan; weights are a broadcast map (domain cardinality);
upsampling materializes copies via explode(sequence()) — no shuffle at
all unless the caller repartitions afterwards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 5 md5 hex nibbles -> uniform [0, 16^5). md5, not xxhash64, so an
# engine without xxhash64 (the DuckDB oracle twin) computes the
# IDENTICAL threshold decision — the md5-nibble trick from the repo's
# oracle-parity rules.
_DENOM = 16**5


def _id_hash(id_col: str, seed: int) -> F.Column:
    return F.conv(
        F.substring(
            F.md5(
                F.encode(
                    F.concat_ws(
                        ":", F.col(id_col).cast("string"), F.lit(str(seed))
                    ),
                    "UTF-8",
                )
            ),
            1, 5,
        ),
        16, 10,
    ).cast("long")


def domain_mixture(
    df: DataFrame,
    weights: dict[str, float],
    domain_col: str = "domain",
    id_col: str = "doc_id",
    default_weight: float = 1.0,
    seed: int = 0,
) -> DataFrame:
    """Sample/upsample rows per domain to the given weights.

    weight w < 1: keep a row iff the md5-nibble hash of (id, seed) in
    [0, 16^5) is < w * 16^5 (deterministic w-fraction, identical in any
    engine with md5). weight w >= 1: every row gets floor(w)
    copies, plus one more for the hash-selected frac(w) fraction. Output
    adds `copy_no` (0-based; 0 for every surviving original). Domains
    absent from `weights` get `default_weight`.

    The weights dict becomes a literal map expression — right for the
    usual dozens-of-domains mixture. A weight TABLE with millions of
    keys (e.g. per-registered-domain weights) should broadcast-join a
    (domain, weight) frame instead of inflating the plan; the hash
    threshold logic is identical."""
    if not all(w >= 0 for w in weights.values()):
        raise ValueError("mixture weights must be >= 0")
    if weights:
        wmap = F.create_map(
            *[F.lit(x) for kv in weights.items() for x in kv]
        )
        w = F.coalesce(
            wmap[F.col(domain_col)], F.lit(float(default_weight))
        )
    else:
        # F.create_map() with no args is map<void,void> and the string
        # lookup type-errors (r4 ADVICE) — an empty mixture means
        # default_weight everywhere
        w = F.lit(float(default_weight))
    h = _id_hash(id_col, seed)
    frac_keep = h < (w - F.floor(w)) * _DENOM
    n_copies = (F.floor(w).cast("int")
                + F.when(frac_keep, 1).otherwise(0))
    out = df.withColumn("_n_copies", n_copies).filter(
        F.col("_n_copies") > 0
    )
    return out.select(
        "*",
        F.explode(
            F.sequence(F.lit(0), F.col("_n_copies") - 1)
        ).alias("copy_no"),
    ).drop("_n_copies")
