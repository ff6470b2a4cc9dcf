"""MMR diversity re-rank (operators/diversity.py): exact behavior on
a constructed fixture + invariants on the driver corpus."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gofaiss_spark.operators.diversity import mmr_rerank
from gofaiss_spark.operators.topk import search_flat


def test_mmr_picks_relevant_then_diverse(spark):
    """Corpus: a tight pair near the query + one farther outlier.
    Plain top-2 returns the tight pair; MMR (λ=0.5) swaps the
    second pick for the diverse outlier."""
    vectors = spark.createDataFrame(
        [
            (0, [0.1, 0.0]),    # nearest
            (1, [0.15, 0.0]),   # near-duplicate of 0
            (2, [0.0, 2.0]),    # farther but diverse
        ],
        "id long, vec array<float>",
    )
    queries = spark.createDataFrame(
        [(0, [0.0, 0.0])], "query_id long, qvec array<float>"
    )
    cands = search_flat(vectors, queries, k=3)
    plain = [r["id"] for r in sorted(
        cands.collect(), key=lambda r: r["rank"])][:2]
    assert plain == [0, 1]
    res = mmr_rerank(cands, vectors, queries, k=2, lam=0.5)
    picked = [r["id"] for r in sorted(res.collect(), key=lambda r: r["rank"])]
    assert picked == [0, 2]


def test_mmr_first_pick_is_nearest_and_subset(spark, embeddings):
    vectors = embeddings.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    ).cache()
    queries = (
        embeddings.filter(F.col("vec_id") < 5)
        .select(F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("qvec"))
        .cache()
    )
    cands = search_flat(vectors, queries, k=30).cache()
    res = mmr_rerank(cands, vectors, queries, k=10, lam=0.7)
    rows = res.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    cand_ids = {}
    nearest = {}
    for r in cands.collect():
        cand_ids.setdefault(r["query_id"], set()).add(r["id"])
        if r["rank"] == 1:
            nearest[r["query_id"]] = r["id"]
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        ids = [r["id"] for r in rs]
        assert len(ids) == len(set(ids)) == 10
        assert [r["rank"] for r in rs] == list(range(1, 11))
        # selection ⊆ candidate set; first pick = plain nearest
        assert set(ids) <= cand_ids[qid]
        assert ids[0] == nearest[qid]


def test_mmr_lambda_one_equals_plain_topk(spark, embeddings):
    """λ=1 disables the diversity term → MMR = relevance order."""
    vectors = embeddings.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    queries = embeddings.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    cands = search_flat(vectors, queries, k=20).cache()
    res = mmr_rerank(cands, vectors, queries, k=5, lam=1.0)
    plain = {
        (r["query_id"], r["rank"]): r["id"]
        for r in cands.collect() if r["rank"] <= 5
    }
    ours = {(r["query_id"], r["rank"]): r["id"] for r in res.collect()}
    assert ours == plain


def test_mmr_diversity_widens_pairwise_spread(spark, embeddings):
    """The min pairwise distance of the MMR set is ≥ the plain
    top-k's min pairwise distance (averaged over queries)."""
    vectors = embeddings.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    ).cache()
    queries = embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    cands = search_flat(vectors, queries, k=40).cache()
    mmr = mmr_rerank(cands, vectors, queries, k=8, lam=0.5)
    vecs = {
        r["id"]: np.asarray(r["vec"], dtype=np.float64)
        for r in vectors.collect()
    }

    def min_pairwise(ids):
        arr = np.stack([vecs[i] for i in ids])
        d = np.linalg.norm(arr[:, None] - arr[None, :], axis=2)
        return d[np.triu_indices(len(ids), 1)].min()

    plain_sets, mmr_sets = {}, {}
    for r in cands.collect():
        if r["rank"] <= 8:
            plain_sets.setdefault(r["query_id"], []).append(r["id"])
    for r in mmr.collect():
        mmr_sets.setdefault(r["query_id"], []).append(r["id"])
    gains = [
        min_pairwise(mmr_sets[q]) - min_pairwise(plain_sets[q])
        for q in plain_sets
    ]
    assert np.mean(gains) >= 0
