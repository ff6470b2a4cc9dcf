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


class TestVocabDrift:
    def test_exact_kl_terms(self, spark):
        import math

        from gofaiss_spark.operators.curation import vocab_drift

        a = spark.createDataFrame([(0, "x x y")], ["doc_id", "text"])
        b = spark.createDataFrame([(1, "x z")], ["doc_id", "text"])
        rows = {r["word"]: r for r in vocab_drift(a, b).collect()}
        # union vocab {x, y, z}: V=3, Na=3, Nb=2
        assert set(rows) == {"x", "y", "z"}
        pax = (2 + 0.5) / (3 + 0.5 * 3)
        pbx = (1 + 0.5) / (2 + 0.5 * 3)
        assert rows["x"]["cnt_a"] == 2 and rows["x"]["cnt_b"] == 1
        assert rows["x"]["p_a"] == pytest.approx(round(pax, 6))
        assert rows["x"]["kl_term"] == pytest.approx(
            round(pax * math.log(pax / pbx), 6)
        )
        # y absent from B: positive drift; z absent from A: negative
        assert rows["y"]["kl_term"] > 0
        assert rows["z"]["kl_term"] < 0

    def test_identical_snapshots_zero_drift(self, spark):
        from gofaiss_spark.operators.curation import vocab_drift

        d = spark.createDataFrame([(0, "a b c a")], ["doc_id", "text"])
        rows = vocab_drift(d, d).collect()
        assert all(r["kl_term"] == 0.0 for r in rows)

    def test_smoothing_validation(self, spark):
        from gofaiss_spark.operators.curation import vocab_drift

        d = spark.createDataFrame([(0, "a")], ["doc_id", "text"])
        with pytest.raises(ValueError):
            vocab_drift(d, d, smoothing=0)
