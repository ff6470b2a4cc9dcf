"""Curation operators: chunking, deterministic sampling, group top-k
(no reference analogue — the training-data pipeline surface)."""

import pytest
from pyspark.sql import functions as F

from gofaiss_spark.operators.curation import (
    chunk_documents,
    hash_bucket,
    hash_sample,
    top_k_by_group,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "a b c d e f g"),          # 7 tokens
        (1, "  x   y  "),              # whitespace runs → 2 tokens
        (2, ""),                       # empty → no chunks
        (3, "only"),                   # 1 token
    ]
    return spark.createDataFrame(rows, schema="doc_id long, text string")


def test_chunk_windows_exact(docs):
    got = {
        (r.doc_id, r.chunk_idx): (r.n_chunk_tokens, r.chunk_text)
        for r in chunk_documents(docs, chunk_tokens=4, overlap=2).collect()
    }
    assert got == {
        (0, 0): (4, "a b c d"),
        (0, 1): (4, "c d e f"),
        (0, 2): (3, "e f g"),
        (0, 3): (1, "g"),
        (1, 0): (2, "x y"),
        (3, 0): (1, "only"),
    }


def test_chunk_rejects_bad_overlap(docs):
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_tokens=4, overlap=4)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_tokens=4, overlap=-1)


def test_hash_sample_deterministic_and_bounded(spark):
    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    s1 = {r.doc_id for r in hash_sample(df, pct=10).collect()}
    s2 = {r.doc_id for r in hash_sample(df, pct=10).collect()}
    assert s1 == s2  # reproducible
    assert 40 <= len(s1) <= 180  # ~10% of 1000
    # monotone: a bigger sample contains the smaller one
    s3 = {r.doc_id for r in hash_sample(df, pct=25).collect()}
    assert s1 <= s3
    buckets = [r.bucket for r in df.select(hash_bucket("doc_id")).collect()]
    assert all(0 <= b < 100 for b in buckets)
    with pytest.raises(ValueError, match="pct"):
        hash_sample(df, pct=101)


def test_top_k_by_group_ties_deterministic(spark):
    rows = [
        ("en", 1, 0.9), ("en", 2, 0.9), ("en", 3, 0.5),
        ("de", 4, 0.7), ("de", 5, 0.8),
    ]
    df = spark.createDataFrame(rows, schema="lang string, doc_id long, q double")
    got = {
        (r.lang, r.group_rank): r.doc_id
        for r in top_k_by_group(df, "lang", "q", 2, tiebreak_col="doc_id").collect()
    }
    # tie at q=0.9 broken by lower doc_id first
    assert got == {("en", 1): 1, ("en", 2): 2, ("de", 1): 5, ("de", 2): 4}
