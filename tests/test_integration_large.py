"""50k-vector end-to-end integration (TestLargeDataset analogue,
test/integration/index_test.go:290-329).

The reference builds one 50k HNSW and checks search validity + stats;
here each TRAINED index type goes the full distance at 50k —
build → save → load → re-search → loaded results equal the
original's — because at this scale the artifact round-trip (Parquet,
partition pruning) is the part a 100 TB deployment exercises.
HNSW itself is the driver-side small-index path (its 50k fidelity
build is minutes of sequential insert by design; SURVEY.md §7), so
the distributed ANN types stand in."""

import pytest
from pyspark.sql import functions as F

from gofaiss_spark import api
from gofaiss_spark.cli import generate_random_vectors

N = 50_000
DIM = 128
K = 100  # index_test.go:295 searches k=100


@pytest.fixture(scope="module")
def big_vectors(spark):
    v = generate_random_vectors(spark, N, DIM, seed=7).cache()
    assert v.count() == N
    yield v
    v.unpersist()


@pytest.fixture(scope="module")
def big_queries(big_vectors):
    return big_vectors.filter(F.col("id") < 5).select(
        F.col("id").alias("query_id"), F.col("vec").alias("qvec")
    )


def _result_set(df):
    return {(r.query_id, r.id, r.rank) for r in df.collect()}


@pytest.mark.parametrize(
    "index_type,params",
    [
        ("ivf", {"nlist": 224, "train_fraction": 0.1}),  # ≈√50k
        ("pq", {"m": 8, "nbits": 8, "train_fraction": 0.1}),
        ("ivfpq", {"nlist": 100, "m": 8, "nbits": 8, "train_fraction": 0.1}),
    ],
)
def test_50k_roundtrip(spark, big_vectors, big_queries, tmp_path, index_type, params):
    idx = api.build_index(big_vectors, index_type=index_type, params=params)
    before = api.search(idx, big_queries, k=K, params={"nprobe": 20}).cache()
    before_set = _result_set(before)
    # k results per query, self-query rank-1 is the query itself for
    # exact-distance types (AssertValidSearchResults analogue)
    assert len(before_set) == 5 * K
    if index_type == "ivf":
        top = {
            (r.query_id, r.id)
            for r in before.filter(F.col("rank") == 1).collect()
        }
        assert top == {(i, i) for i in range(5)}

    path = str(tmp_path / f"large_{index_type}")
    api.save(idx, path)
    loaded = api.load(spark, path)
    after_set = _result_set(api.search(loaded, big_queries, k=K, params={"nprobe": 20}))
    assert after_set == before_set

    s = api.stats(loaded)
    assert s["total_vectors"] == N
    assert s["memory_mb"] > 0


def test_concurrent_searches(spark, big_vectors, big_queries):
    """TestConcurrentOperations analogue (index_test.go:332-359): the
    reference guards its index with an RWMutex; DataFrames are
    immutable, so concurrent queries are independent Spark jobs —
    this pins down that N threads searching one index all get the
    serial answer."""
    import concurrent.futures

    from gofaiss_spark.operators.topk import search_flat

    expect = _result_set(search_flat(big_vectors, big_queries, k=10))

    def one_search(_i):
        return _result_set(search_flat(big_vectors, big_queries, k=10))

    with concurrent.futures.ThreadPoolExecutor(max_workers=6) as ex:
        results = list(ex.map(one_search, range(6)))
    assert all(r == expect for r in results)
