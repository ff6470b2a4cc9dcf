"""Driver-colocated flat serving (operators/local_serve.py):
result-identical to the distributed search_flat on every metric."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gofaiss_spark.operators.local_serve import to_local
from gofaiss_spark.operators.topk import search_flat


@pytest.fixture(scope="module")
def vq(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    v = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec")).cache()
    q = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    ).cache()
    return v, q


@pytest.mark.parametrize("metric", ["l2", "cosine", "dot"])
def test_local_matches_distributed(spark, vq, metric):
    v, q = vq
    dist = {
        (r.query_id, r.rank): (r.id, round(r.distance, 5))
        for r in search_flat(v, q, k=7, metric=metric).collect()
    }
    local = to_local(v, metric=metric)
    qp = q.orderBy("query_id").toPandas()
    qids = qp["query_id"].to_numpy()
    qmat = np.stack(qp["qvec"].to_numpy())
    ids, d = local.search(qmat, k=7)
    for row, qid in enumerate(qids):
        for rank in range(7):
            assert dist[(qid, rank + 1)] == (ids[row, rank], round(float(d[row, rank]), 5))


def test_local_k_bounds(spark, vq):
    v, _ = vq
    local = to_local(v)
    n = len(local.ids)
    ids, d = local.search(local.vecs[:3], k=0)  # k<=0 -> all
    assert ids.shape == (3, n)
    ids, _ = local.search(local.vecs[:2], k=10 * n)  # k>n -> n
    assert ids.shape == (2, n)


def test_flat_index_to_local_method(spark, vq):
    from gofaiss_spark.operators.flat import build_flat

    v, _ = vq
    idx = build_flat(v)
    local = idx.to_local()
    ids, d = local.search(local.vecs[:5], k=3)
    assert ids.shape == (5, 3)
    # self-query at rank 1 with exact zero distance
    assert all(ids[i, 0] == local.ids[i] for i in range(5))
    assert all(d[i, 0] == 0.0 for i in range(5))


class TestLocalIvf:
    """LocalIvfIndex: full probe == exact flat; pruned probe matches
    the distributed search_ivf on the same index."""

    @pytest.fixture(scope="class")
    def built(self, spark, vq):
        from gofaiss_spark.operators.ivf import build_ivf
        from gofaiss_spark.operators.local_serve import to_local_ivf

        v, q = vq
        idx = build_ivf(v, nlist=16, seed=42)
        idx.assignments.cache().count()
        local = to_local_ivf(idx)
        qp = q.orderBy("query_id").toPandas()
        qids = qp["query_id"].to_numpy()
        qmat = np.stack(qp["qvec"].to_numpy())
        return idx, local, qids, qmat

    def test_fullprobe_is_exact(self, spark, vq, built):
        v, q = vq
        idx, local, qids, qmat = built
        ids, d = local.search(qmat, k=7, nprobe=idx.nlist)
        flat = {
            (r.query_id, r.rank): (r.id, round(r.distance, 6))
            for r in search_flat(v, q, k=7).collect()
        }
        for row, qid in enumerate(qids):
            for rank in range(7):
                assert flat[(qid, rank + 1)] == (
                    ids[row, rank], round(float(d[row, rank]), 6)
                )

    def test_pruned_matches_distributed_ivf(self, spark, vq, built):
        from gofaiss_spark.operators.ivf import search_ivf

        v, q = vq
        idx, local, qids, qmat = built
        ids, d = local.search(qmat, k=5, nprobe=4)
        dist = {
            (r.query_id, r.rank): (r.id, round(r.distance, 5))
            for r in search_ivf(idx, q, k=5, nprobe=4).collect()
        }
        agree = total = 0
        for row, qid in enumerate(qids):
            for rank in range(5):
                total += 1
                got = (ids[row, rank], round(float(d[row, rank]), 5))
                if dist.get((qid, rank + 1)) == got:
                    agree += 1
        # identical cells probed (same f64 centroid formula) -> the
        # result sets agree; tolerate rare centroid-distance ties
        assert agree / total >= 0.99

    def test_cell_layout_consistency(self, built):
        idx, local, _, _ = built
        assert local.offsets[0] == 0
        assert local.offsets[-1] == len(local.ids)
        assert np.all(np.diff(local.offsets) >= 0)
