"""BM25 / TF-IDF retrieval invariants (operators/retrieval.py).

Mirrors the reference's test style (exact expected values on tiny
fixtures + result-shape invariants, internal/math/distance_test.go):
hand-checkable corpus, scores verified against a NumPy re-derivation,
ranking invariants on the driver corpus.
"""

import math

import pytest
from pyspark.sql import functions as F

from gofaiss_spark.operators.retrieval import (
    build_text_index,
    search_bm25,
    tfidf_top_terms,
)


@pytest.fixture(scope="module")
def tiny_index(spark):
    docs = spark.createDataFrame(
        [
            (0, "apple banana apple"),
            (1, "banana cherry"),
            (2, "cherry cherry cherry date"),
            (3, "apple date"),
        ],
        "doc_id long, text string",
    )
    return build_text_index(docs)


def test_corpus_stats(tiny_index):
    assert tiny_index.n_docs == 4
    # lengths 3, 2, 4, 2 → avgdl 2.75
    assert tiny_index.avgdl == pytest.approx(2.75)
    assert tiny_index.stats()["index_type"] == "text_bm25"


def test_postings_tf(tiny_index):
    rows = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in tiny_index.postings.collect()
    }
    assert rows[(0, "apple")] == 2
    assert rows[(2, "cherry")] == 3
    assert (1, "apple") not in rows


def test_bm25_exact_score(spark, tiny_index):
    """Single-term query: score must equal the hand-computed BM25
    (k1=1.2, b=0.75, Lucene idf)."""
    q = spark.createDataFrame([(0, "apple")], "query_id long, query_text string")
    res = {
        r["doc_id"]: r["score"]
        for r in search_bm25(tiny_index, q, k=10).collect()
    }
    # df(apple)=2, N=4 → idf = ln((4-2+0.5)/(2+0.5)+1) = ln(2)
    idf = math.log(2.0)

    def bm25(tf, dl):
        return idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 2.75))

    assert res[0] == pytest.approx(round(bm25(2, 3), 6), abs=1e-6)
    assert res[3] == pytest.approx(round(bm25(1, 2), 6), abs=1e-6)
    assert set(res) == {0, 3}  # only docs containing the term


def test_bm25_rank_order_and_shape(spark, tiny_index):
    q = spark.createDataFrame(
        [(0, "cherry date"), (1, "banana")],
        "query_id long, query_text string",
    )
    res = search_bm25(tiny_index, q, k=2)
    rows = res.collect()
    assert set(res.columns) == {"query_id", "doc_id", "score", "rank"}
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        scores = [r["score"] for r in rs]
        assert scores == sorted(scores, reverse=True)
        assert len(rs) <= 2
    # doc 2 (cherry×3 + date) must beat doc 3 (date only) for query 0
    assert by_q[0][0]["doc_id"] == 2


def test_bm25_duplicate_query_terms_count_once(spark, tiny_index):
    q1 = spark.createDataFrame([(0, "apple")], "query_id long, query_text string")
    q2 = spark.createDataFrame(
        [(0, "apple apple apple")], "query_id long, query_text string"
    )
    r1 = sorted(
        (r["doc_id"], r["score"]) for r in search_bm25(tiny_index, q1).collect()
    )
    r2 = sorted(
        (r["doc_id"], r["score"]) for r in search_bm25(tiny_index, q2).collect()
    )
    assert r1 == r2


def test_bm25_unknown_term_no_rows(spark, tiny_index):
    q = spark.createDataFrame(
        [(0, "zzz-not-in-corpus")], "query_id long, query_text string"
    )
    assert search_bm25(tiny_index, q).count() == 0


def test_tfidf_top_terms(tiny_index):
    """Ubiquitous terms get weight 0 (ln N/df = ln 1); rare terms rank
    first."""
    res = tfidf_top_terms(tiny_index, top_n=2)
    rows = {}
    for r in res.collect():
        rows.setdefault(r["doc_id"], []).append(r)
    top2 = rows[2]
    top2.sort(key=lambda r: r["rank"])
    # doc 2: cherry tf=3 df=2 → 3·ln2 ≈ 2.079; date tf=1 df=2 → ln2
    assert top2[0]["term"] == "cherry"
    assert top2[0]["weight"] == pytest.approx(round(3 * math.log(2), 6))
    assert top2[1]["term"] == "date"
    for rs in rows.values():
        assert len(rs) <= 2


def test_bm25_on_driver_corpus(spark, sf_dir):
    """End-to-end on the synthetic documents table: every query gets
    ≤k results, ranks are dense from 1, scores positive."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = build_text_index(docs)
    q = spark.createDataFrame(
        [(0, "spark window agg"), (1, "table scan")],
        "query_id long, query_text string",
    )
    res = search_bm25(idx, q, k=5)
    agg = res.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("rank").alias("max_rank"),
        F.min("score").alias("min_score"),
    )
    for r in agg.collect():
        assert r["n"] <= 5
        assert r["max_rank"] == r["n"]
        assert r["min_score"] > 0


def test_text_index_save_load_identical_results(spark, tmp_path, tiny_index):
    """Persisted bucketed artifact returns byte-identical BM25
    results, and the probe scan partition-prunes to the query terms'
    buckets."""
    from gofaiss_spark.operators.retrieval import (
        load_text_index,
        save_text_index,
    )

    path = str(tmp_path / "text_idx")
    save_text_index(tiny_index, path)
    loaded = load_text_index(spark, path)
    assert loaded.bucketed and loaded.n_docs == tiny_index.n_docs
    q = spark.createDataFrame(
        [(0, "apple cherry"), (1, "banana")],
        "query_id long, query_text string",
    )
    a = sorted(tuple(r) for r in search_bm25(tiny_index, q, k=10).collect())
    b = sorted(tuple(r) for r in search_bm25(loaded, q, k=10).collect())
    assert a == b

    # pruning evidence: the probed postings scan carries literal
    # bucket partition filters
    plan = search_bm25(loaded, q, k=10)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_text_index_load_empty_query_batch(spark, tmp_path, tiny_index):
    from gofaiss_spark.operators.retrieval import (
        load_text_index,
        save_text_index,
    )

    path = str(tmp_path / "text_idx2")
    save_text_index(tiny_index, path)
    loaded = load_text_index(spark, path)
    q = spark.createDataFrame([], "query_id long, query_text string")
    assert search_bm25(loaded, q, k=5).count() == 0


def test_text_index_via_unified_artifact_layer(spark, tmp_path, tiny_index):
    """save_index/load_index dispatch the text index like any other
    artifact type."""
    from gofaiss_spark.plans.artifacts import load_index, save_index

    path = str(tmp_path / "text_idx3")
    save_index(tiny_index, path)
    loaded = load_index(spark, path)
    assert loaded.bucketed and loaded.n_docs == tiny_index.n_docs
    q = spark.createDataFrame(
        [(0, "cherry")], "query_id long, query_text string"
    )
    assert search_bm25(loaded, q, k=3).count() > 0


def test_bm25_plan_broadcasts_term_probes(spark, tiny_index):
    """Scale gate: every join on `term` (the postings probe — the
    corpus-sized side) is a broadcast, never a shuffle. The doc_lens
    join on doc_id MAY sort-merge: both sides are corpus-keyed at
    scale, which is the right plan there (SCALE.md §2)."""
    q = spark.createDataFrame(
        [(0, "apple banana")], "query_id long, query_text string"
    )
    plan = (
        search_bm25(tiny_index, q, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin [term" not in plan
    assert "BroadcastHashJoin [term" in plan


def test_maxsim_plan_never_shuffles_corpus_join(spark, tiny_index):
    """Scale gate: the token-pair join is the broadcast of the query
    tokens against the corpus — no shuffled join before the first
    aggregation."""
    from gofaiss_spark.operators.retrieval import search_maxsim

    docs = spark.createDataFrame(
        [(0, 0, [1.0, 0.0]), (1, 1, [0.0, 1.0])],
        "doc_id long, token_id long, vec array<float>",
    )
    q = spark.createDataFrame(
        [(0, 0, [1.0, 0.0])], "query_id long, token_id long, qvec array<float>"
    )
    plan = (
        search_maxsim(docs, q, k=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan
