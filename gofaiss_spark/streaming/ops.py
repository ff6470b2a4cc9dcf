"""Structured Streaming operators.

The reference has NO streaming surface (SURVEY.md §2.6) — its only
"incremental" behavior is Add-under-mutex (hnsw.go:97-139). These
operators are the Spark-native extension of that surface for a
continuously-ingesting training-data pipeline:

- ``windowed_event_agg``: watermarked tumbling-window aggregation —
  the canonical late-data-tolerant rollup.
- ``streaming_exact_dedup``: drop payloads whose content fingerprint
  was already seen within the watermark — streaming exact dedup.
- ``stream_add_to_ivf``: ``foreachBatch`` micro-batch "Add" into a
  persisted IVF index artifact — each batch is assigned to its
  nearest centroid and appended to the partitioned parquet lists, so
  nprobe search keeps pruning files as data arrives. This is the
  distributed, crash-tolerant analogue of the reference's mutex Add.

All transformations work identically on batch DataFrames (Spark's
unified model), which is how the unit tests drive them end-to-end
with deterministic testdata + ``availableNow`` triggers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_agg(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window counts/sums per event type with a watermark.

    On a stream, state for windows older than the watermark is
    dropped (bounded memory at any scale); on a batch frame the same
    plan is a plain group-by. Output: (window_start, window_end,
    event_type, n_events, sum_value).
    """
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(ts_col, window).alias("w"), F.col(type_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            type_col,
            "n_events",
            "sum_value",
        )
    )


def streaming_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Emit only first-seen documents by normalized content
    fingerprint. Streaming: ``dropDuplicatesWithinWatermark`` keeps
    the seen-set bounded by event time; batch: plain dropDuplicates
    on the fingerprint."""
    from gofaiss_spark.functions.text import doc_fingerprint

    with_fp = docs.withColumn("_fp", doc_fingerprint(text_col))
    if docs.isStreaming:
        return (
            with_fp.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["_fp"])
            .drop("_fp")
        )
    return with_fp.dropDuplicates(["_fp"]).drop("_fp")


def stream_add_to_ivf(
    stream: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    vec_col: str = "vec",
    id_col: str = "id",
):
    """Continuously Add vectors into a saved IVF index artifact.

    Per micro-batch: argmin-join against the (broadcast) centroids of
    the artifact at ``index_path``, then append to the
    ``partitionBy(list_id)`` parquet — identical layout to a batch
    build, so readers (search_ivf / load_index) see new vectors on
    their next scan with zero coordination. Returns the started
    ``StreamingQuery`` (caller owns awaitTermination/stop).

    Reference analogue: ivf.go:93-112 Add (assign → append under
    mutex); here the "mutex" is the streaming commit log.
    """
    from gofaiss_spark.plans.artifacts import _read_meta

    meta = _read_meta(index_path)
    if meta["index_type"] != "ivf":
        raise ValueError(f"{index_path} is {meta['index_type']!r}, expected ivf")

    def add_batch(batch: DataFrame, batch_id: int) -> None:
        from gofaiss_spark.operators.ivf import assign_to_centroids
        from gofaiss_spark.plans.artifacts import load_index

        if batch.isEmpty():
            return
        idx = load_index(batch.sparkSession, index_path)
        assigned = assign_to_centroids(
            batch.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")),
            idx.centroids,
            idx.metric,
        )
        assigned.write.mode("append").partitionBy("list_id").parquet(
            f"{index_path}/assignments"
        )

    return (
        stream.writeStream.foreachBatch(add_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
