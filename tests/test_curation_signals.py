"""Repetition quality signals and contamination scan — exact values
on hand-built documents (no reference analogue; phase-E pipeline
surface, SURVEY.md §7)."""

import pytest
from pyspark.sql import functions as F

from gofaiss_spark.operators.curation import (
    contamination_check,
    repetition_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # 0: "a b a b a b" — tokens 6, distinct 2; bigrams [ab,ba,ab,ba,ab]
        #    top bigram "a b" 3/5; trigrams 4, distinct 2
        (0, "a b a b a b"),
        # 1: all-distinct tokens, no repeats anywhere
        (1, "one two three four five"),
        # 2: single token — no bigrams/trigrams
        (2, "solo"),
        # 3: empty text
        (3, "   "),
        # 4: same token repeated — every ngram identical
        (4, "x x x x"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_repetition_exact_values(docs):
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    r0 = got[0]
    assert r0["n_tokens"] == 6
    assert r0["dup_token_ratio"] == pytest.approx(1 - 2 / 6, abs=1e-6)
    assert r0["top_bigram_frac"] == pytest.approx(3 / 5, abs=1e-6)
    assert r0["dup_trigram_frac"] == pytest.approx(1 - 2 / 4, abs=1e-6)
    r1 = got[1]
    assert r1["dup_token_ratio"] == 0.0
    assert r1["dup_trigram_frac"] == 0.0
    assert r1["top_bigram_frac"] == pytest.approx(1 / 4, abs=1e-6)
    assert got[2]["n_tokens"] == 1 and got[2]["top_bigram_frac"] == 0.0
    assert got[3]["n_tokens"] == 0 and got[3]["dup_token_ratio"] == 0.0
    r4 = got[4]
    assert r4["dup_token_ratio"] == pytest.approx(0.75, abs=1e-6)
    assert r4["top_bigram_frac"] == 1.0
    assert r4["dup_trigram_frac"] == pytest.approx(0.5, abs=1e-6)


def test_contamination_finds_planted_overlap(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "totally unrelated words here nothing shared at all"),
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [(100, "quick brown fox jumps high")], ["doc_id", "text"]
    )
    out = contamination_check(train, ev, n=4).collect()
    assert len(out) == 1
    row = out[0]
    assert (row["train_doc_id"], row["eval_doc_id"]) == (1, 100)
    # shared 4-gram: "quick brown fox jumps"; eval has 2 distinct 4-grams
    assert row["n_shared_ngrams"] == 1
    assert row["containment"] == pytest.approx(0.5, abs=1e-6)


def test_contamination_self_clean(spark):
    ev = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], ["doc_id", "text"]
    )
    train = spark.createDataFrame(
        [(1, "zeta eta theta iota kappa")], ["doc_id", "text"]
    )
    assert contamination_check(train, ev, n=4).count() == 0


def test_repetition_plan_is_shuffle_free(docs):
    plan = repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
