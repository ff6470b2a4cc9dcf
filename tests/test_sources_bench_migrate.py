"""Tests for the ingest readers (CSV embeddings, pipe-delimited
metadata — examples/kaggle_foodpanda_reviews parity), the benchmark
comparison/aggregation utilities (benchmark/scripts parity), and the
index-format migration registry (version.go:96-126 parity)."""

import json

import pytest

from gofaiss_spark.bench_util import (
    aggregate_runs,
    compare_to_baseline,
    timed,
)
from gofaiss_spark.sources.readers import (
    read_embedding_csv,
    read_pipe_delimited_metadata,
)


def test_read_embedding_csv(spark, tmp_path):
    p = tmp_path / "emb.csv"
    p.write_text("0.1,0.2,0.3\n1.0,2.0,3.0\n-1.5,0.0,2.5\n")
    df = read_embedding_csv(spark, str(p), dim=3)
    rows = {r.id: [round(x, 4) for x in r.vec] for r in df.collect()}
    assert rows == {
        0: [0.1, 0.2, 0.3],
        1: [1.0, 2.0, 3.0],
        2: [-1.5, 0.0, 2.5],
    }


def test_read_pipe_delimited_metadata(spark, tmp_path):
    p = tmp_path / "meta.txt"
    p.write_text(
        "great biryani | Karachi Biryani House | Pakistani | Karachi\n"
        "ok pizza|Slice Town|Italian|Lahore\n"
    )
    df = read_pipe_delimited_metadata(
        spark, str(p), ["text", "restaurant", "cuisine", "city"]
    )
    rows = sorted((r.text, r.restaurant, r.cuisine, r.city) for r in df.collect())
    assert rows == [
        ("great biryani", "Karachi Biryani House", "Pakistani", "Karachi"),
        ("ok pizza", "Slice Town", "Italian", "Lahore"),
    ]


def test_timed_fields():
    out = timed(lambda: sum(range(1000)), warmup=1, runs=5)
    assert out["runs"] == 5
    assert out["min_sec"] <= out["p50_sec"] <= out["p95_sec"] <= out["max_sec"]
    assert out["qps"] > 0


def test_compare_to_baseline_thresholds():
    baseline = {
        "ivf": {"qps": 100.0, "recall": 0.90, "memory_mb": 50.0, "build_time_ms": 1000},
    }
    # within thresholds: ok
    ok = compare_to_baseline(
        {"ivf": {"qps": 95.0, "recall": 0.89, "memory_mb": 55.0, "build_time_ms": 1200}},
        baseline,
    )
    assert ok["ok"] and not ok["regressions"] and not ok["warnings"]
    # QPS -20% → regression; memory +50% → warning; faster build → fine
    bad = compare_to_baseline(
        {"ivf": {"qps": 80.0, "recall": 0.95, "memory_mb": 75.0, "build_time_ms": 500}},
        baseline,
    )
    assert not bad["ok"]
    assert [r["metric"] for r in bad["regressions"]] == ["qps"]
    assert [w["metric"] for w in bad["warnings"]] == ["memory_mb"]
    # improvements never flag
    better = compare_to_baseline(
        {"ivf": {"qps": 500.0, "recall": 1.0, "memory_mb": 1.0, "build_time_ms": 10}},
        baseline,
    )
    assert better["ok"] and not better["warnings"]


def test_aggregate_runs_ci():
    runs = [{"qps": 100.0, "recall": 0.9}, {"qps": 110.0, "recall": 0.9}, {"qps": 90.0, "recall": 0.9}]
    agg = aggregate_runs(runs)
    assert agg["qps"]["n"] == 3
    assert abs(agg["qps"]["mean"] - 100.0) < 1e-9
    assert agg["recall"]["stddev"] == 0.0
    lo, hi = agg["qps"]["ci95"]
    assert lo < 100.0 < hi
    assert aggregate_runs([]) == {}


def test_migration_registry(spark, embeddings, tmp_path):
    from pyspark.sql import functions as F

    from gofaiss_spark.operators.flat import build_flat
    from gofaiss_spark.plans import artifacts as A

    vectors = embeddings.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    path = str(tmp_path / "flat_idx")
    A.save_index(build_flat(vectors), path)

    # simulate an old on-disk artifact
    meta_path = f"{path}/_meta.json"
    meta = json.load(open(meta_path))
    meta["format_version"] = "0.9.0"
    meta.pop("metric", None)
    json.dump(meta, open(meta_path, "w"))
    with pytest.raises(ValueError, match="major version"):
        A.load_index(spark, path)

    def up(spark_, p, m):
        m["metric"] = "l2"  # the 0.9 layout lacked an explicit metric
        return m

    A.register_migration("0.9.0", A.FORMAT_VERSION, up)
    final = A.migrate_index(spark, path)
    assert final["format_version"] == A.FORMAT_VERSION
    idx = A.load_index(spark, path)  # loads fine after migration
    assert idx.metric == "l2"
    assert idx.vectors.count() == vectors.count()

    # no path for unknown versions
    json.dump({**meta, "format_version": "0.1.0"}, open(meta_path, "w"))
    with pytest.raises(ValueError, match="no migration path"):
        A.migrate_index(spark, path)
