"""Quality classifier (operators/classify.py) + vocabulary builder
(operators/curation.py build_vocab)."""

import pytest
from pyspark.sql import functions as F

from gofaiss_spark.operators.classify import (
    score_quality,
    train_quality_classifier,
)
from gofaiss_spark.operators.curation import build_vocab


def test_classifier_fits_weak_labels(spark, documents):
    qm = train_quality_classifier(documents, threshold=0.6, seed=42)
    assert qm.train_accuracy >= 0.85
    s = qm.stats()
    assert s["index_type"] == "quality_classifier"
    assert s["threshold"] == 0.6


def test_score_quality_shape_and_agreement(spark, documents):
    qm = train_quality_classifier(documents, threshold=0.6, seed=42)
    scored = score_quality(qm, documents)
    assert set(scored.columns) == {"doc_id", "keep", "agrees_with_heuristic"}
    n = documents.count()
    assert scored.count() == n
    agree = scored.agg(
        F.avg(F.col("agrees_with_heuristic").cast("double")).alias("a")
    ).collect()[0]["a"]
    assert agree >= 0.85


def test_classifier_train_fraction_subsamples(spark, documents):
    qm = train_quality_classifier(
        documents, threshold=0.6, train_fraction=0.5, seed=42
    )
    # still scores the full corpus
    assert score_quality(qm, documents).count() == documents.count()


def test_build_vocab_counts_and_ranks(spark):
    docs = spark.createDataFrame(
        [(0, "a b b c c c"), (1, "c a")],
        "doc_id long, text string",
    )
    rows = {r["token"]: r for r in build_vocab(docs).collect()}
    assert rows["c"]["count"] == 4 and rows["c"]["token_id"] == 0
    # a and b tie at 2 → alphabetical tiebreak
    assert rows["a"]["count"] == 2 and rows["a"]["token_id"] == 1
    assert rows["b"]["count"] == 2 and rows["b"]["token_id"] == 2


def test_build_vocab_tie_order_and_caps(spark):
    docs = spark.createDataFrame(
        [(0, "x y x y z")], "doc_id long, text string"
    )
    rows = sorted(
        build_vocab(docs, max_size=2).collect(), key=lambda r: r["token_id"]
    )
    # x and y tie at 2 → alphabetical; z cut by max_size
    assert [r["token"] for r in rows] == ["x", "y"]


def test_build_vocab_min_count(spark):
    docs = spark.createDataFrame(
        [(0, "p p q")], "doc_id long, text string"
    )
    toks = {r["token"] for r in build_vocab(docs, min_count=2).collect()}
    assert toks == {"p"}
