"""Hard-negative mining (operators/mining.py)."""

import pytest
from pyspark.sql import functions as F

from gofaiss_spark.operators.mining import mine_hard_negatives


def test_triplets_on_constructed_fixture(spark):
    # label 0 cluster near origin, label 1 cluster near (10, 0);
    # query 0 is in cluster 0 → positive from cluster 0, hard
    # negatives = nearest cluster-1 points
    vectors = spark.createDataFrame(
        [
            (0, [0.0, 0.0], 0),
            (1, [0.2, 0.0], 0),
            (2, [0.4, 0.0], 0),
            (10, [10.0, 0.0], 1),
            (11, [10.2, 0.0], 1),
            (12, [10.4, 0.0], 1),
        ],
        "id long, vec array<float>, label int",
    )
    q = spark.createDataFrame(
        [(0, [0.0, 0.0])], "query_id long, qvec array<float>"
    )
    ql = spark.createDataFrame([(0, 0)], "query_id long, label int")
    rows = mine_hard_negatives(
        vectors, q, ql, k_pool=5, n_negatives=2
    ).collect()
    assert {r["pos_id"] for r in rows} == {1}  # nearest same-label, not self
    negs = {r["neg_rank"]: r["neg_id"] for r in rows}
    assert negs == {1: 10, 2: 11}  # nearest different-label in order


def test_no_rows_when_pool_lacks_positive(spark):
    vectors = spark.createDataFrame(
        [(0, [0.0, 0.0], 0), (10, [1.0, 0.0], 1), (11, [2.0, 0.0], 1)],
        "id long, vec array<float>, label int",
    )
    q = spark.createDataFrame([(0, [0.0, 0.0])], "query_id long, qvec array<float>")
    ql = spark.createDataFrame([(0, 0)], "query_id long, label int")
    # only candidate labels are 1 → no positive → no triplets
    assert mine_hard_negatives(vectors, q, ql, k_pool=5).count() == 0


def test_driver_corpus_shape(spark, embeddings):
    vectors = embeddings.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec"), "label"
    )
    q = embeddings.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    ql = embeddings.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "label"
    )
    rows = mine_hard_negatives(vectors, q, ql, k_pool=20, n_negatives=3).collect()
    by_q = {}
    for r in rows:
        assert r["pos_id"] != r["query_id"]
        assert r["neg_id"] != r["query_id"]
        assert r["pos_id"] != r["neg_id"]
        by_q.setdefault(r["query_id"], []).append(r["neg_rank"])
    for qid, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3
