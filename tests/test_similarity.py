"""IVF ANN recall vs brute force; connected-components dedup clustering."""

from __future__ import annotations

from pyspark.sql import functions as F

from document_ai_spark.operators.similarity import (
    connected_components,
    dedup_clusters,
    ivf_topk,
)
from document_ai_spark.queries_ml import q_ann_cosine_topk

SF = "/root/testdata/sf0.001"


def test_ivf_recall_vs_brute_force(spark):
    brute = {r.vec_id for r in q_ann_cosine_topk(spark, SF).collect()[:10]}
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    approx = {r.vec_id for r in ivf_topk(emb, probe_vec_id=0, k=10).collect()}
    recall = len(brute & approx) / 10
    assert recall >= 0.5, f"IVF recall {recall} too low"


def test_connected_components_known_graph(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)],
        ["src", "dst"],
    )
    cc = {r.node: r.component for r in connected_components(edges).collect()}
    assert cc[1] == cc[2] == cc[3] == 1
    assert cc[10] == cc[11] == 10
    assert cc[20] == cc[21] == cc[22] == 20
    assert len(set(cc.values())) == 3


def test_connected_components_long_chain(spark):
    # diameter > 1 exercises multiple propagation rounds
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], ["src", "dst"]
    )
    cc = connected_components(edges)
    assert cc.select("component").distinct().count() == 1
    assert cc.agg(F.min("component")).collect()[0][0] == 0
    assert cc.count() == 31


def test_dedup_clusters_keeper_policy(spark):
    pairs = spark.createDataFrame(
        [(5, 9), (9, 7), (100, 101)], ["doc_a", "doc_b"]
    )
    rows = {r.doc_id: r for r in dedup_clusters(pairs).collect()}
    assert rows[5].is_keeper and rows[5].cluster_id == 5
    assert not rows[9].is_keeper and rows[9].cluster_id == 5
    assert not rows[7].is_keeper and rows[7].cluster_id == 5
    assert rows[100].is_keeper and not rows[101].is_keeper
