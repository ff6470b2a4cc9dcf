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


class TestLocalQuantized:
    """LocalPqIndex / LocalIvfPqIndex / LocalSqIndex: the in-memory
    ADC kernels must report the same distances as the DataFrame
    search paths (same tables, same gather-sum, same sqrt), and
    refine-all must reduce to the exact flat result bit-for-bit."""

    def test_local_pq_matches_search_pq(self, spark, vq):
        from gofaiss_spark.operators.local_serve import to_local_pq
        from gofaiss_spark.operators.pq import build_pq, search_pq

        v, q = vq
        idx = build_pq(v, m=8, seed=42)
        idx.codes.cache().count()
        dist = {
            (r.query_id, r.rank): (r.id, round(r.distance, 5))
            for r in search_pq(idx, q, k=7).collect()
        }
        local = to_local_pq(idx)
        qp = q.orderBy("query_id").toPandas()
        qids = qp["query_id"].to_numpy()
        qmat = np.stack(qp["qvec"].to_numpy())
        ids, d = local.search(qmat, k=7)
        for row, qid in enumerate(qids):
            for rank in range(7):
                assert dist[(qid, rank + 1)] == (
                    ids[row, rank], round(float(d[row, rank]), 5))

    def test_local_ivfpq_matches_search_ivfpq(self, spark, vq):
        from gofaiss_spark.operators.ivfpq import build_ivfpq, search_ivfpq
        from gofaiss_spark.operators.local_serve import to_local_ivfpq

        v, q = vq
        idx = build_ivfpq(v, nlist=8, m=8, seed=42)
        idx.codes.cache().count()
        local = to_local_ivfpq(idx)
        qp = q.orderBy("query_id").toPandas()
        qids = qp["query_id"].to_numpy()
        qmat = np.stack(qp["qvec"].to_numpy())
        for npr in (3, 8):
            dist = {
                (r.query_id, r.rank): (r.id, round(r.distance, 5))
                for r in search_ivfpq(idx, q, k=5, nprobe=npr).collect()
            }
            ids, d = local.search(qmat, k=5, nprobe=npr)
            agree = total = 0
            for row, qid in enumerate(qids):
                for rank in range(5):
                    total += 1
                    got = (ids[row, rank], round(float(d[row, rank]), 5))
                    if dist.get((qid, rank + 1)) == got:
                        agree += 1
            # identical ADC values; tolerate rare exact-ADC-tie order
            assert agree / total >= 0.99

    def test_local_ivfsq_matches_search_ivfsq(self, spark, vq):
        """LocalIvfSqIndex (r9): same decoded-residual distance values
        as the distributed search_ivfsq at 5dp (the local kernel's
        per-pair f64 re-score vs the distributed GEMM accumulation
        agree to ~1e-13; 5dp rounding absorbs it)."""
        from gofaiss_spark.operators.ivfsq import build_ivfsq, search_ivfsq
        from gofaiss_spark.operators.local_serve import to_local_ivfsq

        v, q = vq
        idx = build_ivfsq(v, nlist=8, seed=42)
        idx.codes.cache().count()
        local = to_local_ivfsq(idx)
        qp = q.orderBy("query_id").toPandas()
        qids = qp["query_id"].to_numpy()
        qmat = np.stack(qp["qvec"].to_numpy())
        for npr in (3, 8):
            dist = {
                (r.query_id, r.rank): (r.id, round(r.distance, 5))
                for r in search_ivfsq(idx, q, k=5, nprobe=npr).collect()
            }
            ids, d = local.search(qmat, k=5, nprobe=npr)
            agree = total = 0
            for row, qid in enumerate(qids):
                for rank in range(5):
                    total += 1
                    got = (ids[row, rank], round(float(d[row, rank]), 5))
                    if dist.get((qid, rank + 1)) == got:
                        agree += 1
            assert agree / total >= 0.99
        idx.codes.unpersist()

    def test_local_ivfsq_refine_requires_vecs(self, spark, vq):
        from gofaiss_spark.operators.ivfsq import build_ivfsq
        from gofaiss_spark.operators.local_serve import to_local_ivfsq

        v, q = vq
        idx = build_ivfsq(v, nlist=4, seed=42)
        local = to_local_ivfsq(idx)  # no vectors packed
        qp = q.limit(3).toPandas()
        qmat = np.stack(qp["qvec"].to_numpy())
        with pytest.raises(ValueError, match="refine requires"):
            local.search(qmat, k=3, refine=2)

    def test_local_ivfsq_k_exceeds_n_pads(self, spark, vq):
        """k > corpus clamps to n; absent neighbors never appear
        (same padding contract as LocalIvfPqIndex)."""
        from gofaiss_spark.operators.ivfsq import build_ivfsq
        from gofaiss_spark.operators.local_serve import to_local_ivfsq
        from pyspark.sql import functions as F

        v, q = vq
        small = v.filter(F.col("id") < 20)
        idx = build_ivfsq(small, nlist=2, seed=42)
        local = to_local_ivfsq(idx)
        qp = q.limit(2).toPandas()
        qmat = np.stack(qp["qvec"].to_numpy())
        ids, d = local.search(qmat, k=50, nprobe=2)
        assert ids.shape[1] == 20
        assert np.isfinite(d).all()
        assert (ids < 20).all()

    def test_local_sq_matches_search_sq(self, spark, vq):
        from gofaiss_spark.operators.local_serve import to_local_sq
        from gofaiss_spark.operators.sq import build_sq, search_sq

        v, q = vq
        idx = build_sq(v)
        idx.codes.cache().count()
        dist = {
            (r.query_id, r.rank): (r.id, round(r.distance, 5))
            for r in search_sq(idx, q, k=7).collect()
        }
        local = to_local_sq(idx)
        qp = q.orderBy("query_id").toPandas()
        qids = qp["query_id"].to_numpy()
        qmat = np.stack(qp["qvec"].to_numpy())
        ids, d = local.search(qmat, k=7)
        for row, qid in enumerate(qids):
            for rank in range(7):
                assert dist[(qid, rank + 1)] == (
                    ids[row, rank], round(float(d[row, rank]), 5))

    def test_pq_refine_all_equals_flat(self, spark, vq):
        import math

        from gofaiss_spark.operators.local_serve import to_local, to_local_pq
        from gofaiss_spark.operators.pq import build_pq

        v, q = vq
        n = v.count()
        idx = build_pq(v, m=8, seed=42)
        idx.codes.cache().count()
        local = to_local_pq(idx, vectors=v)
        qp = q.orderBy("query_id").toPandas()
        qmat = np.stack(qp["qvec"].to_numpy())
        ids, d = local.search(qmat, k=5, refine=math.ceil(n / 5) + 1)
        fids, fd = to_local(v).search(qmat, k=5)
        np.testing.assert_array_equal(ids, fids)
        np.testing.assert_array_equal(d, fd)

    def test_refine_requires_vectors(self, spark, vq):
        from gofaiss_spark.operators.local_serve import to_local_pq
        from gofaiss_spark.operators.pq import build_pq

        v, q = vq
        idx = build_pq(v.limit(50), m=8, nbits=4, seed=42)
        local = to_local_pq(idx)
        with pytest.raises(ValueError, match="vectors"):
            local.search(np.zeros((1, 64), dtype=np.float32), k=3, refine=2)

    def test_pq_sq_refine_rejects_non_l2_metric(self):
        """ADVICE r6: LocalPqIndex/LocalSqIndex refine re-ranks in
        exact L2 and must reject other metrics loudly — the same
        guard LocalIvfPqIndex.search already has (the shard/pool
        paths propagate meta['metric'] verbatim, so a non-l2 build
        would otherwise get silently L2-refined results)."""
        from gofaiss_spark.operators.local_serve import (
            LocalPqIndex,
            LocalSqIndex,
        )

        rng = np.random.default_rng(2)
        vecs = rng.random((20, 8), dtype=np.float32)
        pq = LocalPqIndex(
            ids=np.arange(20, dtype=np.int64),
            codes=np.zeros((20, 2), dtype=np.uint16),
            codebooks=rng.random((2, 4, 4)),
            vecs=vecs, metric="cosine",
        )
        with pytest.raises(ValueError, match="l2"):
            pq.search(np.zeros((1, 8), dtype=np.float32), k=3, refine=2)
        sq = LocalSqIndex(
            ids=np.arange(20, dtype=np.int64),
            codes=np.zeros((20, 8), dtype=np.uint8),
            vmin=np.zeros(8), step=np.ones(8),
            vecs=vecs, metric="dot",
        )
        with pytest.raises(ValueError, match="l2"):
            sq.search(np.zeros((1, 8), dtype=np.float32), k=3, refine=2)


class TestQuantizedKernelProperties:
    """Numpy-only pins: the serving kernels against a brute-force
    re-derivation of the ADC math (no Spark)."""

    def test_pq_kernel_vs_bruteforce(self):
        from gofaiss_spark.operators.local_serve import LocalPqIndex

        rng = np.random.default_rng(5)
        m, ksub, dsub, n = 4, 8, 5, 500  # dim 20
        books = rng.normal(size=(m, ksub, dsub))
        codes = rng.integers(0, ksub, size=(n, m)).astype(np.uint16)
        idx = LocalPqIndex(
            ids=np.arange(n, dtype=np.int64),
            codes=np.ascontiguousarray(codes), codebooks=books)
        q = rng.normal(size=(7, 20))
        ids, d = idx.search(q.astype(np.float32), k=5)
        # brute force: decode each row from its codebook entries and
        # measure squared L2 per subspace against the f32-cast query
        q64 = q.astype(np.float32).astype(np.float64)
        recon = books[np.arange(m)[None, :], codes.astype(np.int64), :]
        recon = recon.reshape(n, m * dsub)  # (n, dim)
        diff = recon[None, :, :] - q64[:, None, :]
        bf = np.sqrt(np.maximum(0.0, np.einsum("qnd,qnd->qn", diff, diff)))
        for qi in range(7):
            order = np.lexsort((np.arange(n), bf[qi]))[:5]
            np.testing.assert_array_equal(ids[qi], order)
            np.testing.assert_allclose(d[qi], bf[qi][order],
                                       rtol=0, atol=1e-9)

    def test_sq_kernel_vs_bruteforce(self):
        from gofaiss_spark.operators.local_serve import LocalSqIndex

        rng = np.random.default_rng(6)
        n, dim = 400, 12
        vmin = rng.normal(size=dim)
        step = rng.random(dim) * 0.01 + 1e-4
        codes = rng.integers(0, 256, size=(n, dim)).astype(np.uint8)
        idx = LocalSqIndex(
            ids=np.arange(n, dtype=np.int64),
            codes=np.ascontiguousarray(codes), vmin=vmin, step=step)
        q = rng.normal(size=(5, dim))
        ids, d = idx.search(q.astype(np.float32), k=4)
        recon = vmin + codes.astype(np.float64) * step
        q64 = q.astype(np.float32).astype(np.float64)
        diff = recon[None, :, :] - q64[:, None, :]
        bf = np.sqrt(np.einsum("qnd,qnd->qn", diff, diff))
        for qi in range(5):
            order = np.lexsort((np.arange(n), bf[qi]))[:4]
            np.testing.assert_array_equal(ids[qi], order)
            np.testing.assert_allclose(d[qi], bf[qi][order],
                                       rtol=0, atol=1e-9)


class TestServerPool:
    """LocalServerPool — process-parallel serving: block-split output
    must be bit-identical to the in-process kernels (no Spark
    needed; pure NumPy fixtures)."""

    @pytest.fixture(scope="class")
    def ivf_local(self):
        from gofaiss_spark.operators.local_serve import LocalIvfIndex

        rng = np.random.default_rng(7)
        n, dim, nlist = 4000, 24, 20
        vecs = rng.random((n, dim), dtype=np.float32)
        cent = vecs[rng.choice(n, nlist, replace=False)].astype(np.float64)
        cn = (cent * cent).sum(1)
        assign = (vecs.astype(np.float64) @ cent.T * -2 + cn[None]).argmin(1)
        order = np.argsort(assign, kind="stable")
        return LocalIvfIndex(
            ids=np.arange(n, dtype=np.int64)[order],
            vecs=np.ascontiguousarray(vecs[order]),
            metric="l2",
            centroids=cent,
            offsets=np.searchsorted(
                assign[order], np.arange(nlist + 1)
            ).astype(np.int64),
            norms_sq=np.einsum(
                "ij,ij->i", vecs[order], vecs[order]
            ),
        )

    def test_ivf_pool_bit_identical(self, ivf_local):
        from gofaiss_spark.operators.local_serve import LocalServerPool

        rng = np.random.default_rng(8)
        q = rng.random((300, 24), dtype=np.float32)
        with LocalServerPool(ivf_local, workers=3) as pool:
            i_mp, d_mp = pool.search(q, k=5, nprobe=4)
        i_sp, d_sp = ivf_local.search(q, k=5, nprobe=4)
        assert np.array_equal(i_mp, i_sp)
        assert np.array_equal(d_mp, d_sp)

    def test_flat_pool_bit_identical(self, ivf_local):
        from gofaiss_spark.operators.local_serve import (
            LocalFlatIndex,
            LocalServerPool,
        )

        flat = LocalFlatIndex(
            ids=ivf_local.ids, vecs=ivf_local.vecs, metric="l2",
            norms_sq=ivf_local.norms_sq,
        )
        rng = np.random.default_rng(9)
        q = rng.random((100, 24), dtype=np.float32)
        with LocalServerPool(flat, workers=2) as pool:
            i_mp, d_mp = pool.search(q, k=7, nprobe=None)
        i_sp, d_sp = flat.search(q, k=7)
        assert np.array_equal(i_mp, i_sp)
        assert np.array_equal(d_mp, d_sp)

    def test_pool_reuse_and_small_batches(self, ivf_local):
        from gofaiss_spark.operators.local_serve import LocalServerPool

        rng = np.random.default_rng(10)
        pool = LocalServerPool(ivf_local, workers=2)
        try:
            # more chunks than rows; repeated use of one pool
            for nq in (1, 3, 50):
                q = rng.random((nq, 24), dtype=np.float32)
                i_mp, _ = pool.search(q, k=3, nprobe=20)
                i_sp, _ = ivf_local.search(q, k=3, nprobe=20)
                assert np.array_equal(i_mp, i_sp)
        finally:
            pool.close()
        pool.close()  # idempotent

    def test_pq_pool_bit_identical(self):
        from gofaiss_spark.operators.local_serve import (
            LocalPqIndex,
            LocalServerPool,
        )

        rng = np.random.default_rng(12)
        m, ksub, dsub = 4, 16, 6  # dim 24
        books = rng.normal(size=(m, ksub, dsub))
        codes = rng.integers(0, ksub, size=(3000, m)).astype(np.uint16)
        vecs = rng.random((3000, 24), dtype=np.float32)
        idx = LocalPqIndex(
            ids=np.arange(3000, dtype=np.int64),
            codes=np.ascontiguousarray(codes),
            codebooks=books, vecs=vecs,
        )
        q = rng.random((200, 24), dtype=np.float32)
        with LocalServerPool(idx, workers=3) as pool:
            i_mp, d_mp = pool.search(q, k=5, nprobe=None)
            ri_mp, rd_mp = pool.search(q, k=5, nprobe=None, refine=3)
        i_sp, d_sp = idx.search(q, k=5)
        ri_sp, rd_sp = idx.search(q, k=5, refine=3)
        np.testing.assert_array_equal(i_mp, i_sp)
        np.testing.assert_array_equal(d_mp, d_sp)
        np.testing.assert_array_equal(ri_mp, ri_sp)
        np.testing.assert_array_equal(rd_mp, rd_sp)

    def test_ivfpq_pool_bit_identical(self):
        from gofaiss_spark.operators.local_serve import (
            LocalIvfPqIndex,
            LocalServerPool,
        )

        rng = np.random.default_rng(13)
        m, ksub, dsub, nlist, n = 4, 16, 6, 8, 3000  # dim 24
        books = rng.normal(size=(m, ksub, dsub))
        cents = rng.normal(size=(nlist, 24))
        cell = np.sort(rng.integers(0, nlist, size=n))
        offsets = np.searchsorted(
            cell, np.arange(nlist + 1)).astype(np.int64)
        codes = rng.integers(0, ksub, size=(n, m)).astype(np.uint16)
        vecs = rng.random((n, 24), dtype=np.float32)
        idx = LocalIvfPqIndex(
            ids=np.arange(n, dtype=np.int64),
            codes=np.ascontiguousarray(codes), codebooks=books,
            centroids=cents, offsets=offsets, vecs=vecs,
        )
        q = rng.random((150, 24), dtype=np.float32)
        with LocalServerPool(idx, workers=3) as pool:
            i_mp, d_mp = pool.search(q, k=5, nprobe=3)
            ri_mp, rd_mp = pool.search(q, k=5, nprobe=3, refine=4)
        i_sp, d_sp = idx.search(q, k=5, nprobe=3)
        ri_sp, rd_sp = idx.search(q, k=5, nprobe=3, refine=4)
        np.testing.assert_array_equal(i_mp, i_sp)
        np.testing.assert_array_equal(d_mp, d_sp)
        np.testing.assert_array_equal(ri_mp, ri_sp)
        np.testing.assert_array_equal(rd_mp, rd_sp)

    def test_sq_pool_bit_identical(self):
        from gofaiss_spark.operators.local_serve import (
            LocalServerPool,
            LocalSqIndex,
        )

        rng = np.random.default_rng(14)
        n, dim = 2500, 16
        vmin = rng.normal(size=dim)
        step = rng.random(dim) * 0.01 + 1e-4
        codes = rng.integers(0, 256, size=(n, dim)).astype(np.uint8)
        vecs = rng.random((n, dim), dtype=np.float32)
        idx = LocalSqIndex(
            ids=np.arange(n, dtype=np.int64),
            codes=np.ascontiguousarray(codes),
            vmin=vmin, step=step, vecs=vecs,
        )
        q = rng.random((120, dim), dtype=np.float32)
        with LocalServerPool(idx, workers=2) as pool:
            i_mp, d_mp = pool.search(q, k=4, nprobe=None)
            ri_mp, rd_mp = pool.search(q, k=4, nprobe=None, refine=3)
        i_sp, d_sp = idx.search(q, k=4)
        ri_sp, rd_sp = idx.search(q, k=4, refine=3)
        np.testing.assert_array_equal(i_mp, i_sp)
        np.testing.assert_array_equal(d_mp, d_sp)
        np.testing.assert_array_equal(ri_mp, ri_sp)
        np.testing.assert_array_equal(rd_mp, rd_sp)

    def test_pool_rejects_unknown_index(self):
        from gofaiss_spark.operators.local_serve import LocalServerPool

        with pytest.raises(TypeError):
            LocalServerPool(object())

    def test_pool_empty_query_batch(self, ivf_local):
        from gofaiss_spark.operators.local_serve import LocalServerPool

        with LocalServerPool(ivf_local, workers=2) as pool:
            ids, d = pool.search(
                np.empty((0, 24), dtype=np.float32), k=5, nprobe=4
            )
        assert ids.shape == (0, 5) and d.shape == (0, 5)
        assert ids.dtype == np.int64 and d.dtype == np.float64

    def test_shm_export_empty_array(self):
        from gofaiss_spark.operators.local_serve import (
            _shm_attach,
            _shm_export,
        )

        shm, meta = _shm_export(np.empty((0, 24), dtype=np.float32))
        try:
            shm2, arr = _shm_attach(meta)
            assert arr.shape == (0, 24) and arr.dtype == np.float32
            shm2.close()
        finally:
            shm.close()
            shm.unlink()
