"""CLI tests: build → search round-trip on real parquet, and the
bench subcommand's JSON contract (cmd/cli/main.go parity — but build
and search actually work here, unlike the reference's stubs)."""

import json

import pytest
from pyspark.sql import functions as F

from gofaiss_spark.cli import cmd_bench, cmd_build, cmd_search, generate_random_vectors, main


def test_generate_random_vectors(spark):
    df = generate_random_vectors(spark, 50, 8, seed=7)
    rows = df.collect()
    assert len(rows) == 50
    assert sorted(r.id for r in rows) == list(range(50))
    assert all(len(r.vec) == 8 for r in rows)
    assert all(0.0 <= x < 1.0 for r in rows for x in r.vec)
    again = {r.id: tuple(r.vec) for r in generate_random_vectors(spark, 50, 8, seed=7).collect()}
    assert again == {r.id: tuple(r.vec) for r in rows}


def test_build_then_search_cli(spark, embeddings, tmp_path, capsys, monkeypatch):
    # avoid the CLI spinning up its own session
    monkeypatch.setattr("gofaiss_spark.session.get_spark", lambda *a, **k: spark)

    vec_path = str(tmp_path / "vectors")
    embeddings.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    ).write.parquet(vec_path)
    q_path = str(tmp_path / "queries")
    embeddings.limit(5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    ).write.parquet(q_path)
    idx_path = str(tmp_path / "idx")

    ns = lambda **kw: type("A", (), kw)()  # noqa: E731
    rc = cmd_build(
        ns(
            input=vec_path,
            output=idx_path,
            index_type="ivf",
            metric="l2",
            vec_col="vec",
            id_col="id",
            param=["nlist=5", "seed=42"],
        ),
        spark,
    )
    assert rc == 0
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["stats"]["index_type"] == "ivf"

    out_path = str(tmp_path / "results")
    rc = cmd_search(
        ns(
            index=idx_path,
            queries=q_path,
            k=3,
            qvec_col="qvec",
            query_id_col="query_id",
            output=out_path,
            show=0,
            param=["nprobe=5"],
            base=None,
            vec_col="vec",
            id_col="id",
        ),
        spark,
    )
    assert rc == 0
    searched = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert searched["n_results"] == 15  # 5 queries × k=3
    res = spark.read.parquet(out_path)
    assert {r.query_id for r in res.collect()} == {
        r.query_id for r in spark.read.parquet(q_path).collect()
    }

    # refine via the CLI: build a PQ artifact, re-rank against --base
    pq_path = str(tmp_path / "idx_pq")
    rc = cmd_build(
        ns(
            input=vec_path,
            output=pq_path,
            index_type="pq",
            metric="l2",
            vec_col="vec",
            id_col="id",
            param=["m=8", "nbits=6", "seed=42"],
        ),
        spark,
    )
    assert rc == 0
    capsys.readouterr()
    ref_path = str(tmp_path / "results_refined")
    rc = cmd_search(
        ns(
            index=pq_path,
            queries=q_path,
            k=3,
            qvec_col="qvec",
            query_id_col="query_id",
            output=ref_path,
            show=0,
            param=["refine=10"],
            base=vec_path,
            vec_col="vec",
            id_col="id",
        ),
        spark,
    )
    assert rc == 0
    refined = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert refined["n_results"] == 15
    # refined distances are exact: spot-check against the flat truth
    from gofaiss_spark.operators.topk import search_flat

    vecs = spark.read.parquet(vec_path)
    qs = spark.read.parquet(q_path)
    exact = {
        (r.query_id, r.id): r.distance
        for r in search_flat(vecs, qs, k=0).collect()
    }
    for r in spark.read.parquet(ref_path).collect():
        assert abs(exact[(r.query_id, r.id)] - r.distance) < 1e-5


def test_bench_cli_json_contract(spark, capsys):
    ns = type(
        "A",
        (),
        dict(
            n=300,
            dim=16,
            k=5,
            num_queries=10,
            seed=42,
            metric="l2",
            index_type=["flat", "ivf"],
        ),
    )()
    assert cmd_bench(ns, spark) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    by_type = {r["index_type"]: r for r in out["results"]}
    assert set(by_type) == {"flat", "ivf"}
    flat = by_type["flat"]
    assert flat["recall_at_k"] == 1.0  # exact index is its own oracle
    for r in out["results"]:
        assert r["qps"] > 0 and r["build_time_ms"] >= 0
        assert 0.0 <= r["recall_at_k"] <= 1.0


def test_cli_requires_subcommand():
    with pytest.raises(SystemExit):
        main([])
