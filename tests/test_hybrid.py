"""Reciprocal-rank-fusion hybrid retrieval (operators/retrieval.py
rrf_fuse): exact expected values on a tiny fixture + invariants."""

import pytest
from pyspark.sql import functions as F

from gofaiss_spark.operators.retrieval import rrf_fuse


@pytest.fixture(scope="module")
def ranked(spark):
    dense = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3), (1, 20, 1)],
        "query_id long, id long, rank int",
    )
    lex = spark.createDataFrame(
        [(0, 11, 1), (0, 13, 2), (1, 21, 1)],
        "query_id long, id long, rank int",
    )
    return dense, lex


def test_rrf_exact_scores(spark, ranked):
    dense, lex = ranked
    res = {(r["query_id"], r["id"]): r for r in
           rrf_fuse(dense, lex, k=10, c=60).collect()}
    # id 11 appears in both lists: 1/(60+2) + 1/(60+1)
    assert res[(0, 11)]["score"] == pytest.approx(
        round(1 / 62 + 1 / 61, 6), abs=1e-6
    )
    # id 10 dense-only rank 1: 1/61
    assert res[(0, 10)]["score"] == pytest.approx(round(1 / 61, 6), abs=1e-6)
    # fused winner for query 0 is the doc present in both rankings
    assert res[(0, 11)]["rank"] == 1


def test_rrf_rank_dense_and_bounded(spark, ranked):
    dense, lex = ranked
    res = rrf_fuse(dense, lex, k=2)
    rows = {}
    for r in res.collect():
        rows.setdefault(r["query_id"], []).append(r)
    for qid, rs in rows.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 2
        scores = [r["score"] for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_rrf_single_sided_ids_survive(spark, ranked):
    dense, lex = ranked
    ids0 = {r["id"] for r in rrf_fuse(dense, lex, k=10).collect()
            if r["query_id"] == 0}
    assert ids0 == {10, 11, 12, 13}  # union of both lists


# --- MaxSim late interaction ---------------------------------------


def test_maxsim_exact_scores(spark):
    from gofaiss_spark.operators.retrieval import search_maxsim

    # doc 0 tokens: e1, e2; doc 1 tokens: e1+e2, -e1
    docs = spark.createDataFrame(
        [
            (0, 0, [1.0, 0.0]),
            (0, 1, [0.0, 1.0]),
            (1, 2, [1.0, 1.0]),
            (1, 3, [-1.0, 0.0]),
        ],
        "doc_id long, token_id long, vec array<float>",
    )
    # query 0: tokens e1 and e2
    q = spark.createDataFrame(
        [(0, 0, [1.0, 0.0]), (0, 1, [0.0, 1.0])],
        "query_id long, token_id long, qvec array<float>",
    )
    res = {r["doc_id"]: r for r in search_maxsim(docs, q, k=10).collect()}
    # doc 0: max(<e1,e1>,<e1,e2>)=1 + max(<e2,e1>,<e2,e2>)=1 → 2
    assert res[0]["score"] == pytest.approx(2.0)
    # doc 1: max(1,-1)=1 + max(1,0)=1 → 2
    assert res[1]["score"] == pytest.approx(2.0)
    # tie → doc_id tiebreak
    assert res[0]["rank"] == 1 and res[1]["rank"] == 2


def test_maxsim_rank_shape(spark, sf_dir):
    from gofaiss_spark.operators.retrieval import search_maxsim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    docs = emb.select(
        F.col("label").cast("long").alias("doc_id"),
        F.col("vec_id").alias("token_id"),
        F.col("embedding").alias("vec"),
    )
    q = emb.filter(F.col("vec_id") < 4).select(
        F.lit(0).cast("long").alias("query_id"),
        F.col("vec_id").alias("token_id"),
        F.col("embedding").alias("qvec"),
    )
    rows = search_maxsim(docs, q, k=3).collect()
    assert 0 < len(rows) <= 3
    ranks = sorted(r["rank"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
    scores = [r["score"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert scores == sorted(scores, reverse=True)
