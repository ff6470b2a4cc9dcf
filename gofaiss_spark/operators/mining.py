"""Hard-negative mining for contrastive / embedding training: for
each query, the nearest same-label vector is the positive and the
nearest different-label vectors are the hard negatives — the
standard triplet-construction pass an embedding-training pipeline
runs over its corpus (negatives that are CLOSE are the informative
ones).

Spark shape: one exact (or ANN) top-k search provides the candidate
pool; labels attach via a narrow id join; the positive/negative
split and per-query trimming are windows over ≤ k rows per query.
Everything downstream of the search touches only candidate rows, so
the mining cost rides the search plan — at 100 TB swap search_flat
for the IVF/LSH candidate generator and the composition is
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["mine_hard_negatives"]


def mine_hard_negatives(
    vectors: DataFrame,
    queries: DataFrame,
    query_labels: DataFrame,
    k_pool: int = 20,
    n_negatives: int = 3,
    metric: str = "l2",
    label_col: str = "label",
) -> DataFrame:
    """Returns (query_id, pos_id, neg_id, neg_rank): the nearest
    same-label candidate crossed with the ``n_negatives`` nearest
    different-label candidates, ranked by distance with id
    tiebreaks. Queries without a same-label or different-label
    candidate in the pool produce no rows (documented: widen k_pool).

    ``vectors`` = (id, vec, label); ``queries`` = (query_id, qvec);
    ``query_labels`` = (query_id, label). The query's own id never
    appears (self-matches are excluded by id equality)."""
    from gofaiss_spark.operators.topk import search_flat

    # pool = nearest k_pool EXCLUDING the query's own id: search one
    # extra, drop self, re-trim — engine-independent pool semantics
    cands = search_flat(vectors, queries, k=k_pool + 1, metric=metric)
    cands = cands.filter(F.col("query_id") != F.col("id"))
    w_pool = Window.partitionBy("query_id").orderBy(
        F.col("distance").asc(), F.col("id").asc()
    )
    cands = cands.withColumn("_pr", F.row_number().over(w_pool)).filter(
        F.col("_pr") <= k_pool
    )
    # used twice (positive arm + negative arm): checkpoint the NARROW
    # labeled-candidate table (queries × k_pool rows) so the flat
    # search kernel and label joins run once, not once per arm (r12;
    # guide §1.2 step 1 / §5)
    labeled = cands.join(
        vectors.select("id", F.col(label_col).alias("_cand_label")), "id"
    ).join(
        F.broadcast(
            query_labels.select(
                "query_id", F.col(label_col).alias("_q_label")
            )
        ),
        "query_id",
    ).localCheckpoint(eager=True)
    same = F.col("_cand_label") == F.col("_q_label")
    w = Window.partitionBy("query_id").orderBy(
        F.col("distance").asc(), F.col("id").asc()
    )
    pos = (
        labeled.filter(same)
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("query_id", F.col("id").alias("pos_id"))
    )
    neg = (
        labeled.filter(~same)
        .withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= n_negatives)
        .select("query_id", F.col("id").alias("neg_id"), "neg_rank")
    )
    return pos.join(neg, "query_id").select(
        "query_id", "pos_id", "neg_id", "neg_rank"
    )
