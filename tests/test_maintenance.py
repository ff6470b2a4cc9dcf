"""Artifact maintenance: compaction (streaming small-files fix) and
partition-pruned persisted remove. The reference cannot express
either (ivf.go:176-178 errors "remove not supported"; its gob blob
is rewritten wholesale on every Save)."""

import os

import pytest
from pyspark.sql import functions as F

from gofaiss_spark import api
from gofaiss_spark.plans.artifacts import (
    _parquet_files,
    compact_index,
    load_index,
    remove_from_index,
    save_index,
)


@pytest.fixture(scope="module")
def vectors(embeddings):
    return embeddings.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    ).cache()


@pytest.fixture(scope="module")
def queries(embeddings):
    return embeddings.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )


def _results(spark, path, queries, k=5):
    idx = load_index(spark, path)
    return {
        (r.query_id, r.id, r.rank)
        for r in api.search(idx, queries, k=k, params={"nprobe": 100}).collect()
    }


def test_compact_ivf_after_appends(spark, vectors, queries, tmp_path):
    """Simulated micro-batch appends fragment each list directory;
    compaction must shrink the file count without changing a single
    search result."""
    from gofaiss_spark.operators.ivf import assign_to_centroids

    idx = api.build_index(vectors.filter(F.col("id") % 3 == 0),
                          index_type="ivf", params={"nlist": 8})
    path = str(tmp_path / "ivf")
    api.save(idx, path)

    # three "micro-batches" appended in the artifact layout
    for m in (1, 2):
        batch = vectors.filter(F.col("id") % 3 == m)
        assigned = assign_to_centroids(batch, idx.centroids, idx.metric)
        (assigned.select("id", "vec", "list_id")
         .write.mode("append").partitionBy("list_id")
         .parquet(f"{path}/assignments"))

    before_files = len(_parquet_files(f"{path}/assignments"))
    before = _results(spark, path, queries)
    report = compact_index(spark, path)
    after = _results(spark, path, queries)

    assert after == before
    assert report["assignments"]["files_after"] < before_files
    assert report["assignments"]["rows"] == vectors.count()


def test_remove_is_partition_pruned(spark, vectors, queries, tmp_path):
    """Deleting a few ids rewrites ONLY their list directories; every
    other list keeps its exact files (same paths, same bytes)."""
    idx = api.build_index(vectors, index_type="ivf", params={"nlist": 8})
    path = str(tmp_path / "ivf_rm")
    api.save(idx, path)

    assigns = spark.read.parquet(f"{path}/assignments")
    victim_list = assigns.groupBy("list_id").count().orderBy("count").collect()[0]["list_id"]
    victims = [r["id"] for r in assigns.filter(F.col("list_id") == victim_list)
               .limit(3).collect()]

    untouched = {
        f for f in _parquet_files(f"{path}/assignments")
        if f"list_id={victim_list}/" not in f
    }
    before_mtimes = {f: os.path.getmtime(f) for f in untouched}

    n = remove_from_index(spark, path, victims)
    assert n == len(victims)

    # untouched lists: identical file set, untouched on disk
    now = {
        f for f in _parquet_files(f"{path}/assignments")
        if f"list_id={victim_list}/" not in f
    }
    assert now == untouched
    assert {f: os.path.getmtime(f) for f in now} == before_mtimes

    # removed ids never surface again
    res = _results(spark, path, queries)
    assert not any(rid in victims for _, rid, _ in res)
    total = spark.read.parquet(f"{path}/assignments").count()
    assert total == vectors.count() - len(victims)


def test_remove_empties_whole_list(spark, vectors, tmp_path):
    idx = api.build_index(vectors, index_type="ivf", params={"nlist": 6})
    path = str(tmp_path / "ivf_empty")
    api.save(idx, path)
    assigns = spark.read.parquet(f"{path}/assignments")
    lid = assigns.select("list_id").distinct().collect()[0]["list_id"]
    all_ids = [r["id"] for r in assigns.filter(F.col("list_id") == lid).collect()]
    n = remove_from_index(spark, path, all_ids)
    assert n == len(all_ids)
    assert not os.path.isdir(f"{path}/assignments/list_id={lid}")
    left = spark.read.parquet(f"{path}/assignments")
    assert left.filter(F.col("list_id") == lid).count() == 0


def test_remove_flat_and_noop(spark, vectors, queries, tmp_path):
    idx = api.build_index(vectors, index_type="flat")
    path = str(tmp_path / "flat_rm")
    api.save(idx, path)
    assert remove_from_index(spark, path, [10**9]) == 0  # absent id: no-op
    n = remove_from_index(spark, path, [0, 1])
    assert n == 2
    res = _results(spark, path, queries)
    assert not any(rid in (0, 1) for _, rid, _ in res)


def test_compact_flat_merges_fragments(spark, vectors, tmp_path):
    """Compaction merges down (coalesce — no shuffle); it never
    splits, so a fragmented table lands at ceil(rows/target)."""
    idx = api.build_index(vectors, index_type="flat")
    path = str(tmp_path / "flat_c")
    api.save(idx, path)
    # fragment: two append rounds of 8 partitions each
    frag = idx.vectors.repartition(8)
    for _ in range(2):
        frag.write.mode("append").parquet(f"{path}/vectors")
    assert len(_parquet_files(f"{path}/vectors")) >= 16
    report = compact_index(spark, path)
    assert report["vectors"]["files_after"] == 1
    assert report["vectors"]["rows"] == vectors.count() * 3
