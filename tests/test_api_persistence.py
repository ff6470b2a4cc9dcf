"""Unified API + persistence round-trips.

Mirrors test/integration/index_test.go:20-56 (create→add→search→
save→load→re-search, loaded results equal original) and
pkg/storage/serialize_test.go version-compat rules."""

import pytest
from pyspark.sql import functions as F

from gofaiss_spark import api
from gofaiss_spark.plans.artifacts import check_version_compat


@pytest.fixture(scope="module")
def vectors(embeddings):
    return embeddings.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    ).cache()


@pytest.fixture(scope="module")
def queries(embeddings):
    return embeddings.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )


def _result_set(df):
    return {(r.query_id, r.id, r.rank) for r in df.collect()}


@pytest.mark.parametrize(
    "index_type,params",
    [
        ("flat", {}),
        ("ivf", {"nlist": 12}),
        ("pq", {"m": 8, "nbits": 5}),
        ("ivfpq", {"nlist": 10, "m": 8, "nbits": 5}),
    ],
)
def test_save_load_search_roundtrip(spark, vectors, queries, tmp_path, index_type, params):
    idx = api.build_index(vectors, index_type=index_type, params=params)
    before = _result_set(api.search(idx, queries, k=5, params={"nprobe": 4}))
    path = str(tmp_path / index_type)
    api.save(idx, path)
    loaded = api.load(spark, path)
    after = _result_set(api.search(loaded, queries, k=5, params={"nprobe": 4}))
    assert before == after
    s = api.stats(loaded)
    assert s["index_type"] == index_type
    assert s["total_vectors"] == vectors.count()
    assert s["memory_mb"] > 0
    from gofaiss_spark.plans.artifacts import artifact_size_mb

    assert artifact_size_mb(path) > 0


def test_lsh_stats_memory(vectors):
    from gofaiss_spark.operators.lsh import build_lsh

    idx = build_lsh(vectors, metric="l2", num_hash_tables=4)
    s = idx.stats()
    n = vectors.count()
    assert s["total_vectors"] == n
    # vectors stored once + n·L narrow 24-byte bucket rows
    assert s["memory_mb"] == pytest.approx(
        (n * (s["dimension"] * 4 + 8) + n * 4 * 24) / (1024 * 1024)
    )


def test_lsh_search_recall(vectors, queries):
    from gofaiss_spark.bench_util import recall_at_k
    from gofaiss_spark.operators.topk import search_flat

    idx = api.build_index(
        vectors, index_type="hnsw", params={"num_hash_tables": 16}
    )
    assert api.stats(idx)["index_type"] == "lsh"
    k = 10
    res = api.search(idx, queries, k=k)
    truth = search_flat(vectors, queries, k=k, metric="l2")
    r = recall_at_k(res, truth, k)
    # HNSW-class tuned recall target (SURVEY.md §6: ≥0.95)
    assert r >= 0.95, f"lsh recall {r}"


def test_lsh_multiprobe_beats_plain_at_fewer_tables(vectors, queries):
    """Probing ±1 neighbor buckets recovers boundary-straddling
    neighbors: L=4 + multiprobe ≥ plain L=4 recall, and clears the
    serving gate with HALF the tables of the plain config (measured
    0.9999 vs 0.991 @100k, SCALE.md §7)."""
    from gofaiss_spark.bench_util import recall_at_k
    from gofaiss_spark.operators.lsh import build_lsh, search_lsh
    from gofaiss_spark.operators.topk import search_flat

    idx = build_lsh(vectors, num_hash_tables=4)
    k = 10
    truth = search_flat(vectors, queries, k=k, metric="l2")
    plain = recall_at_k(search_lsh(idx, queries, k=k), truth, k)
    probed = recall_at_k(
        search_lsh(idx, queries, k=k, multiprobe=1), truth, k
    )
    assert probed >= plain - 1e-9
    assert probed >= 0.95
    # api plumb-through
    via_api = api.search(idx, queries, k=k, params={"multiprobe": 1})
    assert recall_at_k(via_api, truth, k) == pytest.approx(probed)


def test_search_with_metadata(vectors, queries):
    idx = api.build_index(vectors, index_type="flat")
    rows, meta = api.search_with_metadata(idx, queries, k=3)
    assert meta["index_type"] == "flat"
    assert meta["n_results"] == len(rows) == 30
    assert meta["elapsed_sec"] > 0


def test_range_search_api(vectors, queries):
    idx = api.build_index(vectors, index_type="flat")
    res = api.range_search(idx, queries, threshold=1.3).collect()
    assert all(r.distance <= 1.3 for r in res)


def test_version_compat():
    check_version_compat("1.0.0")
    with pytest.raises(ValueError):
        check_version_compat("2.0.0")  # major mismatch
    with pytest.raises(ValueError):
        check_version_compat("1.9.0")  # newer minor
    with pytest.raises(ValueError):
        check_version_compat("garbage")


def test_unknown_index_type(vectors):
    with pytest.raises(ValueError):
        api.build_index(vectors, index_type="faiss9000")


def test_cosine_flat_rejects_zero_vectors(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [0.0, 0.0])], schema="id long, vec array<float>"
    )
    with pytest.raises(ValueError, match="zero vectors"):
        api.build_index(df, index_type="flat", metric="cosine")


def test_flat_rejects_ragged_dims(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [1.0, 2.0, 3.0])], schema="id long, vec array<float>"
    )
    with pytest.raises(ValueError, match="dimension"):
        api.build_index(df, index_type="flat")


def test_validate_dimension(spark):
    from gofaiss_spark.functions.vector import validate_dimension

    ok = spark.createDataFrame([(0, [1.0, 2.0]), (1, [3.0, 4.0])], "id long, vec array<float>")
    assert validate_dimension(ok, 2) is ok
    import pytest as _pytest

    bad = spark.createDataFrame([(0, [1.0, 2.0]), (1, [3.0])], "id long, vec array<float>")
    with _pytest.raises(ValueError, match="dimension mismatch"):
        validate_dimension(bad, 2)


def test_remove_ids_anti_join(spark, embeddings):
    from pyspark.sql import functions as F

    from gofaiss_spark.api import build_index, remove_ids, search

    vectors = embeddings.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    idx = build_index(vectors, index_type="ivf", params={"nlist": 5})
    n0 = idx.assignments.count()
    target = int(vectors.first()["id"])
    remove_ids(idx, [target])
    assert idx.assignments.count() == n0 - 1
    q = vectors.limit(3).select(F.col("id").alias("query_id"), F.col("vec").alias("qvec"))
    ids = {r.id for r in search(idx, q, k=5, params={"nprobe": 5}).collect()}
    assert target not in ids


@pytest.mark.parametrize(
    "index_type,params",
    [
        ("flat", {}),
        ("ivf", {"nlist": 12}),
        ("ivfpq", {"nlist": 10, "m": 8, "nbits": 5}),
    ],
)
def test_json_export_roundtrip(spark, vectors, queries, tmp_path, index_type, params):
    """Cross-format parity (storage/json.go:15-56,
    serialize_test.go:300-370): JSON debug export loads back to an
    index that returns identical search results."""
    from gofaiss_spark.plans.artifacts import export_index_json, load_index

    idx = api.build_index(vectors, index_type=index_type, params=params)
    before = _result_set(api.search(idx, queries, k=5, params={"nprobe": 4}))
    path = str(tmp_path / f"{index_type}_json")
    export_index_json(idx, path)
    loaded = load_index(spark, path)
    after = _result_set(api.search(loaded, queries, k=5, params={"nprobe": 4}))
    assert before == after
    # the export really is line-delimited JSON, not parquet
    import glob
    import json as jsonlib

    comp = {"flat": "vectors", "ivf": "assignments", "ivfpq": "codes"}[index_type]
    files = [
        f
        for f in glob.glob(f"{path}/{comp}/**/part-*", recursive=True)
        if not f.endswith(".crc")
    ]
    assert files
    with open(files[0]) as f:
        first = f.readline().strip()
    assert first == "" or isinstance(jsonlib.loads(first), dict)


def test_ivf_artifact_partition_pruning(spark, vectors, tmp_path):
    """Scale regression guard: a loaded IVF artifact's probed-list
    scan must prune parquet partitions (SCALE.md §1 — nprobe search
    reads only the probed list_id directories, the property that
    keeps search sub-linear at 100 TB)."""
    import contextlib
    import io

    from gofaiss_spark.plans.artifacts import load_index, save_index

    idx = api.build_index(vectors, index_type="ivf", params={"nlist": 8})
    path = str(tmp_path / "prune_ivf")
    save_index(idx, path)
    loaded = load_index(spark, path)
    probed = loaded.assignments.filter(F.col("list_id").isin([1, 3]))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probed.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan).group(1)
    assert "list_id" in pf and "IN (1,3)" in pf.replace(" ", "").replace("IN(", "IN (")


def test_partitioned_artifact_one_file_per_key(spark, vectors, tmp_path):
    """Clustered partitioned writes (guide §6, r12 audit #12 / r13
    verdict item 8): repartition(key) before partitionBy must yield
    ONE data file per partition key instead of tasks x keys tiny
    files."""
    import glob

    from gofaiss_spark.operators.ivf import build_ivf
    from gofaiss_spark.plans.artifacts import save_index

    idx = build_ivf(vectors, nlist=8, seed=42)
    path = str(tmp_path / "ivf_onefile")
    save_index(idx, path)
    part_dirs = glob.glob(f"{path}/assignments/list_id=*")
    assert part_dirs, "partitioned assignments dirs missing"
    for d in part_dirs:
        files = glob.glob(d + "/part-*")
        assert len(files) == 1, (d, files)
