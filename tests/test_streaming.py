"""Structured Streaming tests: file-source streams over the driver
testdata, availableNow triggers, memory sinks, and the streaming IVF
Add path (micro-batch append into a partitioned index artifact)."""

import shutil

import pytest
from pyspark.sql import functions as F

from gofaiss_spark.streaming.ops import (
    sessionize_batch,
    sessionize_stream,
    stream_add_to_ivf,
    streaming_exact_dedup,
    windowed_event_agg,
)


@pytest.fixture(scope="module")
def events_stream_dir(spark, sf_dir, tmp_path_factory):
    """testdata events re-written (nanos ts → micros) into a
    directory a file-source stream can watch."""
    from gofaiss_spark.sources.readers import load_events

    out = str(tmp_path_factory.mktemp("events_stream"))
    load_events(spark, sf_dir).write.mode("overwrite").parquet(out)
    return out


@pytest.fixture(scope="module")
def events_batch(spark, sf_dir):
    from gofaiss_spark.sources.readers import load_events

    return load_events(spark, sf_dir).cache()


def _run_to_memory(stream_df, name, output_mode):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_windowed_agg_stream_matches_batch(spark, events_stream_dir, events_batch):
    schema = events_batch.schema
    stream = spark.readStream.schema(schema).parquet(events_stream_dir)
    agg = windowed_event_agg(stream, window="1 hour", watermark="2 hours")
    _run_to_memory(agg, "win_agg", "append")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM win_agg").collect()
    }
    expected = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in windowed_event_agg(events_batch, window="1 hour").collect()
    }
    # append mode emits only windows closed by the final watermark;
    # every emitted window must agree exactly with the batch plan
    assert got
    for key, val in got.items():
        assert expected[key] == val


def test_streaming_dedup_first_seen_wins(spark, tmp_path):
    src = str(tmp_path / "docs_src")
    rows = [
        (0, "the same text", "2024-01-01 00:00:00"),
        (1, "the same text", "2024-01-01 00:10:00"),
        (2, "a different text", "2024-01-01 00:20:00"),
        (3, "THE  same text", "2024-01-01 00:30:00"),  # normalizes equal
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, ts_s string").select(
        "doc_id", "text", F.to_timestamp("ts_s").alias("ts")
    )
    df.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    dedup = streaming_exact_dedup(stream, watermark="1 hour")
    _run_to_memory(dedup, "dedup_out", "append")
    out_texts = {
        r.text for r in spark.sql("SELECT * FROM dedup_out").collect()
    }
    assert len(out_texts) == 2  # one survivor per fingerprint group
    # batch path agrees on survivor count
    assert streaming_exact_dedup(df).count() == 2


def test_sessionize_batch_gap_semantics(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 1.0),
        (1, "2024-01-01 00:10:00", 2.0),   # same session (10m gap)
        (1, "2024-01-01 01:00:00", 3.0),   # new session (50m gap)
        (2, "2024-01-01 00:05:00", 4.0),   # other user
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_s string, value double").select(
        "user_id", F.to_timestamp("ts_s").alias("ts"), "value"
    )
    got = {
        (r.user_id, r.session_idx): (r.n_events, r.sum_value)
        for r in sessionize_batch(df, gap_minutes=30).collect()
    }
    assert got == {(1, 1): (2, 3.0), (1, 2): (1, 3.0), (2, 1): (1, 4.0)}


def test_sessionize_stream_matches_batch(spark, events_stream_dir, events_batch):
    """Stateful streaming sessions == batch window sessions, for all
    sessions the final watermark was able to close."""
    schema = events_batch.schema
    stream = spark.readStream.schema(schema).parquet(events_stream_dir)
    sess = sessionize_stream(stream, gap_minutes=60, watermark="1 minute")
    q = (
        sess.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }
    expected = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.sum_value)
        for r in sessionize_batch(events_batch, gap_minutes=60).collect()
    }
    assert got  # the stream closed sessions
    for key, val in got.items():
        assert expected[key] == val
    # coverage: most sessions close (only per-user tails can stay open)
    n_users = events_batch.select("user_id").distinct().count()
    assert len(got) >= len(expected) - n_users


def test_stream_add_to_ivf(spark, embeddings, tmp_path):
    from gofaiss_spark.operators.ivf import build_ivf, search_ivf
    from gofaiss_spark.plans.artifacts import load_index, save_index

    vectors = embeddings.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    first, rest = (
        vectors.filter(F.col("id") < 100),
        vectors.filter(F.col("id") >= 100),
    )
    idx = build_ivf(first, nlist=5, seed=42)
    path = str(tmp_path / "ivf_idx")
    save_index(idx, path)
    n_before = load_index(spark, path).assignments.count()

    src = str(tmp_path / "vec_src")
    rest.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(vectors.schema).parquet(src)
    q = stream_add_to_ivf(stream, path, checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    loaded = load_index(spark, path)
    assert loaded.assignments.count() == vectors.count()
    assert n_before == first.count()
    # the grown index still answers correctly: full-probe == flat
    from gofaiss_spark.operators.topk import search_flat

    queries = vectors.limit(5).select(
        F.col("id").alias("query_id"), F.col("vec").alias("qvec")
    )
    got = sorted(
        (r.query_id, r.id) for r in search_ivf(loaded, queries, k=3, nprobe=5).collect()
    )
    want = sorted(
        (r.query_id, r.id) for r in search_flat(vectors, queries, k=3).collect()
    )
    assert got == want

    with pytest.raises(ValueError, match="expected ivf"):
        from gofaiss_spark.operators.flat import build_flat

        flat_path = str(tmp_path / "flat_idx")
        save_index(build_flat(vectors), flat_path)
        stream_add_to_ivf(stream, flat_path, checkpoint_dir=str(tmp_path / "ckpt2"))


def test_stream_near_dup_matches_batch(spark, documents, tmp_path):
    """Two stream runs over the id-ordered corpus halves must produce
    exactly the batch twin's kept set (first-seen-wins, registry
    carried across runs via the persisted band parquet)."""
    from gofaiss_spark.operators.dedup import near_dup_dedup_batch
    from gofaiss_spark.streaming.ops import stream_near_dup_minhash

    docs = documents.select("doc_id", "text")
    mid = docs.approxQuantile("doc_id", [0.5], 0.0)[0]
    src = str(tmp_path / "nd_src")
    reg = str(tmp_path / "nd_registry")
    kept = str(tmp_path / "nd_kept")

    def run_chunk(chunk_df, ckpt):
        chunk_df.coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(docs.schema).parquet(src)
        q = stream_near_dup_minhash(
            stream, registry_path=reg, kept_path=kept, checkpoint_dir=ckpt
        )
        q.awaitTermination(120)

    # same checkpoint across runs → run 2 only sees the new files
    ckpt = str(tmp_path / "nd_ckpt")
    run_chunk(docs.filter(F.col("doc_id") <= mid), ckpt)
    run_chunk(docs.filter(F.col("doc_id") > mid), ckpt)

    got = {r.doc_id for r in spark.read.parquet(kept).collect()}
    expect = {r.doc_id for r in near_dup_dedup_batch(docs).collect()}
    assert got == expect
    assert len(got) < docs.count()  # the corpus has planted near-dups


def test_stream_search_matches_batch(spark, embeddings, tmp_path):
    """Streaming query serving: results of each micro-batch must
    equal the batch unified-API search over the same artifact, and a
    vector added between batches must be searchable in the next."""
    from gofaiss_spark.api import search
    from gofaiss_spark.operators.ivf import build_ivf
    from gofaiss_spark.plans.artifacts import load_index, save_index
    from gofaiss_spark.streaming.ops import stream_search_topk

    vectors = embeddings.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    idx = build_ivf(vectors, nlist=5, seed=42)
    path = str(tmp_path / "ivf_srv")
    save_index(idx, path)

    queries = vectors.limit(8).select(
        F.col("id").alias("query_id"), F.col("vec").alias("qvec")
    )
    src = str(tmp_path / "q_src")
    queries.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(queries.schema).parquet(src)
    res_path = str(tmp_path / "results")
    q = stream_search_topk(
        stream,
        path,
        res_path,
        checkpoint_dir=str(tmp_path / "ckpt_srv"),
        k=3,
        params={"nprobe": 5},
    )
    q.awaitTermination(120)

    got = sorted(
        (r.query_id, r.rank, r.id)
        for r in spark.read.parquet(res_path).collect()
    )
    want = sorted(
        (r.query_id, r.rank, r.id)
        for r in search(
            load_index(spark, path), queries, k=3, params={"nprobe": 5}
        ).collect()
    )
    assert got == want


def test_funnel_stream_matches_batch(spark, events_stream_dir, events_batch):
    """The streaming funnel's final per-user flags equal the batch
    conditional-min funnel (stage-min merging is order-insensitive)."""
    from pyspark.sql import functions as F

    from gofaiss_spark.streaming.ops import funnel_stream

    schema = events_batch.schema
    stream = spark.readStream.schema(schema).parquet(events_stream_dir)
    q = _run_to_memory(funnel_stream(stream), "funnel_mem", "append")
    got_rows = spark.sql(
        "SELECT * FROM funnel_mem"
    ).collect()
    # last emitted row per user = current status (memory sink keeps
    # every append; with availableNow single batch there is exactly
    # one row per user, but be robust to multi-batch replans)
    last = {}
    for r in got_rows:
        last[r["user_id"]] = (r["s_view"], r["s_click"], r["s_purchase"])

    def first_ts(etype):
        return F.min(F.when(F.col("event_type") == etype, F.col("ts")))

    stages = events_batch.groupBy("user_id").agg(
        first_ts("view").alias("t1"),
        first_ts("click").alias("t2"),
        first_ts("purchase").alias("t3"),
    )
    expect = {}
    for r in stages.collect():
        s_view = r["t1"] is not None
        s_click = s_view and r["t2"] is not None and r["t2"] > r["t1"]
        s_purchase = s_click and r["t3"] is not None and r["t3"] > r["t2"]
        expect[r["user_id"]] = (s_view, s_click, s_purchase)
    assert last == expect
    q.stop()
