"""Executor-colocated sharded serving: bit-identity gates against the
single-node local indexes (the same contract LocalServerPool carries,
one tier up). Reference analogue: serving an index larger than one
process's RAM — the regime the reference cannot enter at all
(benchmark/README.md positions HNSW at ~1.5 GB/1M vectors on a single
node)."""

import glob

import numpy as np
import pytest
from pyspark.sql import functions as F

from gofaiss_spark.operators.ivf import build_ivf
from gofaiss_spark.operators.local_serve import to_local, to_local_ivf
from gofaiss_spark.operators.shard_serve import (
    ShardedSearcher,
    _seg_name,
    save_sharded,
)


@pytest.fixture(scope="module")
def vectors(spark, embeddings):
    df = embeddings.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    ).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def qmat(vectors):
    pdf = vectors.orderBy("id").limit(20).toPandas()
    return np.stack(pdf["vec"].to_numpy()).astype(np.float32)


class TestFlatSharded:
    def test_bit_identity_vs_local(self, spark, vectors, qmat, tmp_path_factory):
        path = str(tmp_path_factory.mktemp("shard") / "flat4")
        save_sharded(vectors, path, num_shards=4)
        with ShardedSearcher(spark, path) as srv:
            sids, sd = srv.search(qmat, k=10)
        lids, ld = to_local(vectors).search(qmat, k=10)
        np.testing.assert_array_equal(sids, lids)
        np.testing.assert_array_equal(sd, ld)  # exact: same f64 re-score

    def test_single_shard_equals_local(self, spark, vectors, qmat,
                                       tmp_path_factory):
        path = str(tmp_path_factory.mktemp("shard") / "flat1")
        save_sharded(vectors, path, num_shards=1)
        with ShardedSearcher(spark, path) as srv:
            sids, sd = srv.search(qmat, k=5)
        lids, ld = to_local(vectors).search(qmat, k=5)
        np.testing.assert_array_equal(sids, lids)
        np.testing.assert_array_equal(sd, ld)

    def test_empty_batch(self, spark, vectors, tmp_path_factory):
        path = str(tmp_path_factory.mktemp("shard") / "flat_e")
        save_sharded(vectors, path, num_shards=2)
        with ShardedSearcher(spark, path) as srv:
            dim = srv.meta["dim"]
            ids, d = srv.search(np.empty((0, dim), dtype=np.float32), k=10)
        assert ids.shape == (0, 10) and d.shape == (0, 10)

    def test_k_larger_than_n(self, spark, vectors, qmat, tmp_path_factory):
        small = vectors.limit(7)
        path = str(tmp_path_factory.mktemp("shard") / "flat_small")
        save_sharded(small, path, num_shards=3)
        with ShardedSearcher(spark, path) as srv:
            ids, d = srv.search(qmat[:3], k=10)
        assert ids.shape == (3, 7)  # capped at n, like the local kernel
        lids, ld = to_local(small).search(qmat[:3], k=10)
        np.testing.assert_array_equal(ids, lids[:, :7])

    def test_bad_args(self, spark, vectors, tmp_path_factory):
        path = str(tmp_path_factory.mktemp("shard") / "flat_bad")
        with pytest.raises(ValueError, match="num_shards"):
            save_sharded(vectors, path, num_shards=0)
        save_sharded(vectors, path, num_shards=2)
        with ShardedSearcher(spark, path) as srv:
            with pytest.raises(ValueError, match="k must be positive"):
                srv.search(
                    np.zeros((1, srv.meta["dim"]), dtype=np.float32), k=0)


class TestIvfSharded:
    @pytest.fixture(scope="class")
    def ivf(self, vectors):
        idx = build_ivf(vectors, nlist=8, seed=42)
        idx.assignments.cache().count()
        return idx

    def test_bit_identity_vs_local_ivf(self, spark, ivf, qmat,
                                       tmp_path_factory):
        path = str(tmp_path_factory.mktemp("shard") / "ivf4")
        save_sharded(ivf, path, num_shards=4)
        local = to_local_ivf(ivf)
        with ShardedSearcher(spark, path) as srv:
            for npr in (2, 4, 8):
                sids, sd = srv.search(qmat, k=10, nprobe=npr)
                lids, ld = local.search(qmat, k=10, nprobe=npr)
                np.testing.assert_array_equal(sids, lids)
                np.testing.assert_array_equal(sd, ld)

    def test_full_probe_equals_flat(self, spark, ivf, vectors, qmat,
                                    tmp_path_factory):
        path = str(tmp_path_factory.mktemp("shard") / "ivf_fp")
        save_sharded(ivf, path, num_shards=3)
        with ShardedSearcher(spark, path) as srv:
            sids, sd = srv.search(qmat, k=10, nprobe=8)  # nprobe == nlist
        fids, fd = to_local(vectors).search(qmat, k=10)
        np.testing.assert_array_equal(sids, fids)
        np.testing.assert_array_equal(sd, fd)

    def test_cache_stable_across_batches(self, spark, ivf, qmat,
                                         tmp_path_factory):
        path = str(tmp_path_factory.mktemp("shard") / "ivf_warm")
        save_sharded(ivf, path, num_shards=2)
        with ShardedSearcher(spark, path) as srv:
            a = srv.search(qmat, k=5, nprobe=4)
            b = srv.search(qmat, k=5, nprobe=4)  # warm (host shm cache)
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])

    def test_stats(self, spark, ivf, tmp_path_factory):
        path = str(tmp_path_factory.mktemp("shard") / "ivf_stats")
        save_sharded(ivf, path, num_shards=2)
        with ShardedSearcher(spark, path) as srv:
            st = srv.stats()
        assert st["kind"] == "ivf" and st["num_shards"] == 2
        assert st["n_vectors"] == ivf.assignments.count()
        assert st["memory_mb_per_shard"] > 0


class TestHostShmLifecycle:
    """The shard CSR arrays are pinned in host shared memory so ANY
    python worker serves warm regardless of Spark's worker churn;
    close() must unlink them on every host."""

    def _segs(self, build_id):
        return glob.glob(f"/dev/shm/*{build_id}*")

    def test_segments_created_and_released(self, spark, vectors, qmat,
                                           tmp_path_factory):
        path = str(tmp_path_factory.mktemp("shard") / "flat_shm")
        meta = save_sharded(vectors, path, num_shards=2)
        srv = ShardedSearcher(spark, path)
        try:
            srv.search(qmat, k=5)
            # both shards' segment sets exist on this host after a search
            assert len(self._segs(meta["build_id"])) >= 2 * 4
        finally:
            removed = srv.close()
        assert removed >= 2 * 4
        assert self._segs(meta["build_id"]) == []

    def test_close_idempotent_and_rewarm(self, spark, vectors, qmat,
                                         tmp_path_factory):
        path = str(tmp_path_factory.mktemp("shard") / "flat_shm2")
        save_sharded(vectors, path, num_shards=2)
        srv = ShardedSearcher(spark, path)
        a = srv.search(qmat, k=5)
        srv.close()
        assert srv.close() == 0  # idempotent
        # a released artifact re-warms from parquet on next search
        b = srv.search(qmat, k=5)
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])
        srv.close()

    def test_rewrite_same_path_new_build_id(self, spark, vectors, qmat,
                                            tmp_path_factory):
        path = str(tmp_path_factory.mktemp("shard") / "flat_shm3")
        m1 = save_sharded(vectors, path, num_shards=2)
        with ShardedSearcher(spark, path) as s1:
            s1.search(qmat, k=5)
            m2 = save_sharded(vectors.limit(9), path, num_shards=2)
            assert m2["build_id"] != m1["build_id"]  # cache can't alias
            with ShardedSearcher(spark, path) as s2:
                ids, _ = s2.search(qmat[:2], k=20)
                assert ids.shape == (2, 9)  # serves the NEW 9-row build

    def test_seg_name_deterministic(self):
        assert _seg_name("abc", 3, "vecs") == _seg_name("abc", 3, "vecs")
        assert _seg_name("abc", 3, "vecs") != _seg_name("abc", 4, "vecs")
