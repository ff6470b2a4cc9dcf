"""SemDeDup (operators/semdedup.py) and the round-3 text-dup/LM ops."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gofaiss_spark.operators.semdedup import semdedup


def _planted(spark, n=200, dim=16, n_dup=20, seed=7):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, dim))
    # plant near-duplicates: copies of the first n_dup rows + tiny noise
    dups = base[:n_dup] + rng.normal(scale=1e-4, size=(n_dup, dim))
    data = np.concatenate([base, dups]).astype(np.float32)
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(data)]
    return spark.createDataFrame(rows, "id long, vec array<float>"), n, n_dup


def test_semdedup_drops_planted_duplicates(spark):
    df, n, n_dup = _planted(spark)
    res = semdedup(df, n_clusters=4, threshold=0.999, seed=42).cache()
    assert res.count() == n + n_dup
    dropped = res.filter(~F.col("keep")).collect()
    # every planted duplicate pair shares a cell with its original only
    # if k-means put them together — with threshold 0.999 and tiny
    # noise that is near-certain (identical vectors share argmin)
    assert len(dropped) >= n_dup * 0.9
    kept_ids = {r["id"] for r in res.filter(F.col("keep")).collect()}
    for r in dropped:
        assert r["dup_of"] in kept_ids
        assert r["dup_of"] < r["id"]  # lowest-id-wins greedy
        assert r["cos_sim"] >= 0.999 - 1e-9


def test_semdedup_no_false_positives_on_spread_data(spark):
    rng = np.random.default_rng(3)
    data = rng.normal(size=(100, 32)).astype(np.float32)
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(data)]
    df = spark.createDataFrame(rows, "id long, vec array<float>")
    res = semdedup(df, n_clusters=2, threshold=0.999, seed=42)
    assert res.filter(~F.col("keep")).count() == 0


def test_semdedup_deterministic(spark):
    df, _, _ = _planted(spark)
    a = sorted(map(tuple, semdedup(df, n_clusters=4, threshold=0.999).collect()))
    b = sorted(map(tuple, semdedup(df, n_clusters=4, threshold=0.999).collect()))
    assert a == b


def test_substring_dup_flags_shared_spans(spark):
    from gofaiss_spark.operators.dedup import substring_dup_spans

    shared = "x" * 10 + "the quick brown fox jumps over the lazy dog" * 2
    rows = [
        (0, shared + " unique tail zero"),
        (1, shared + " another ending entirely different here"),
        (2, "completely unrelated text " * 5),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in substring_dup_spans(df).collect()}
    assert out[0]["n_dup_shingles"] > 0
    assert out[1]["n_dup_shingles"] > 0
    assert out[2]["n_dup_shingles"] == 0
    assert 0 < out[0]["dup_fraction"] <= 1.0


def test_substring_dup_short_docs_excluded(spark):
    from gofaiss_spark.operators.dedup import substring_dup_spans

    df = spark.createDataFrame(
        [(0, "short"), (1, "y" * 80)], "doc_id long, text string"
    )
    rows = {r["doc_id"] for r in substring_dup_spans(df).collect()}
    assert rows == {1}


def test_bigram_perplexity_values(spark):
    from gofaiss_spark.functions.lm import bigram_perplexity

    # corpus: "a b a b" and "a b c" — hand-checkable counts
    df = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b c")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in bigram_perplexity(df).collect()}
    # bigrams: doc0: (a,b),(b,a),(a,b); doc1: (a,b),(b,c)
    # c(a,b)=3, c(b,a)=1, c(b,c)=1; ctx c(a)=3, c(b)=2; V=3
    import math

    p_ab = (3 + 1) / (3 + 3)
    p_ba = (1 + 1) / (2 + 3)
    p_bc = (1 + 1) / (2 + 3)
    bits0 = -(2 * math.log2(p_ab) + math.log2(p_ba)) / 3
    bits1 = -(math.log2(p_ab) + math.log2(p_bc)) / 2
    assert out[0]["n_bigrams"] == 3
    assert abs(out[0]["bits_per_bigram"] - round(bits0, 6)) < 1e-9
    assert out[1]["n_bigrams"] == 2
    assert abs(out[1]["bits_per_bigram"] - round(bits1, 6)) < 1e-9
    assert abs(out[1]["perplexity"] - round(2 ** bits1, 6)) < 1e-6


def test_bigram_perplexity_single_token_docs_excluded(spark):
    from gofaiss_spark.functions.lm import bigram_perplexity

    df = spark.createDataFrame(
        [(0, "solo"), (1, ""), (2, "two words")], "doc_id long, text string"
    )
    assert {r["doc_id"] for r in bigram_perplexity(df).collect()} == {2}


def test_lm_and_substring_plans_stay_jvm_side(spark):
    """Neither operator may fall back to row-at-a-time Python — the
    whole pipeline is split/slice/substring column expressions plus
    keyed aggregations (SCALE.md §4 policy)."""
    from gofaiss_spark.functions.lm import bigram_perplexity
    from gofaiss_spark.operators.dedup import substring_dup_spans

    df = spark.createDataFrame(
        [(0, "alpha beta gamma delta " * 20), (1, "beta gamma delta epsilon " * 20)],
        "doc_id long, text string",
    )
    for out in (bigram_perplexity(df), substring_dup_spans(df)):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan  # no Python UDFs anywhere


def test_semdedup_single_shuffle_per_stage(spark):
    """The per-cell greedy is ONE applyInPandas keyed on the cell id:
    exactly one Exchange in the post-assignment plan (the groupBy
    list_id), never an O(n^2) join."""
    df, _, _ = _planted(spark)
    res = semdedup(df, n_clusters=4, threshold=0.999, seed=42)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
