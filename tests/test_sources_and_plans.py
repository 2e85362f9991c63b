"""Source-format coverage (S7 JSON / S8 CSV fixtures read with explicit
schemas) and physical-plan regression checks (pushdown, broadcast)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from document_ai_spark import queries as Q


from document_ai_spark.plans.audit import formatted_plan as _plan


def test_csv_golden_roundtrip(spark, corpus_dir, tmp_path):
    """S8: golden fixtures as CSV, read back with header+schema."""
    import pandas as pd

    golden = spark.read.parquet(
        os.path.join(corpus_dir, "golden_text.parquet")
    )
    csv_path = str(tmp_path / "golden.csv")
    golden.toPandas().to_csv(csv_path, index=False)
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("expected_text", T.StringType()),
            T.StructField("expected_parse_ok", T.BooleanType()),
        ]
    )
    back = spark.read.csv(csv_path, header=True, schema=schema,
                          multiLine=True, escape='"')
    assert back.count() == golden.count()
    # join-compare the parse_ok flags (text survives quoting round-trip)
    j = golden.alias("g").join(back.alias("b"), "url")
    assert j.filter(
        F.col("g.expected_parse_ok") != F.col("b.expected_parse_ok")
    ).count() == 0


def test_json_fixture_read(spark, corpus_dir, tmp_path):
    """S7: verdict fixtures as JSON-lines, read with explicit schema."""
    verdict = spark.read.parquet(
        os.path.join(corpus_dir, "verdict_truth.parquet")
    )
    json_dir = str(tmp_path / "verdict_json")
    verdict.write.json(json_dir)
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("validated", T.BooleanType()),
            T.StructField("causes", T.ArrayType(T.StringType())),
        ]
    )
    back = spark.read.json(json_dir, schema=schema)
    assert back.count() == verdict.count()
    j = verdict.alias("v").join(back.alias("b"), "url")
    assert j.filter(
        F.col("v.validated") != F.col("b.validated")
    ).count() == 0


def test_pricing_summary_pushdown(spark):
    plan = _plan(Q.q_pricing_summary(spark, "/root/testdata/sf0.001"))
    assert "LessThan(l_quantity,50.0)" in plan  # predicate reached the scan
    assert "l_shipdate" not in plan.split("ReadSchema")[1].split("\n")[0]


def test_region_revenue_broadcasts_dims(spark):
    plan = _plan(Q.q_region_revenue(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # all dims broadcast at this scale


def test_extraction_is_size_aware(spark, corpus_dir):
    from document_ai_spark.operators.extraction import (
        estimate_input_bytes,
        size_aware_partitions,
    )

    pages = spark.read.parquet(os.path.join(corpus_dir, "pages.parquet"))
    est = estimate_input_bytes(pages)
    assert est > 0
    n = size_aware_partitions(pages)
    assert n >= 4 * spark.sparkContext.defaultParallelism


def test_aqe_splits_skewed_join(spark):
    """Skew posture, runtime half: a hot join key concentrating ~99% of the
    fact rows is split by AQE at execution (SortMergeJoin(skew=true) +
    AQEShuffleRead skewed) — the engine-side complement to the explicit
    size-aware salting of UDF-compute skew in operators/extraction.py.
    Thresholds are lowered test-side: the defaults only fire at 256MB
    partitions, far beyond fixture scale."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "65536",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32768",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    s = spark
    fact = s.range(200_000).select(
        F.when(F.col("id") % 100 < 99, F.lit(7))
        .otherwise(F.col("id") % 13).alias("k"),
        F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("v"),
    )
    dim = s.range(13).select(
        F.col("id").alias("k"),
        F.concat(F.lit("d"), F.col("id").cast("string")).alias("d"),
    )
    j = fact.join(dim, "k")
    assert len(j.collect()) == 200_000
    plan = j._jdf.queryExecution().executedPlan().toString()
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)
    assert "skew=true" in plan
    assert "AQEShuffleRead skewed" in plan
