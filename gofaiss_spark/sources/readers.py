"""Sources: parquet test tables + the reference's ingest formats.

The reference ingests a CSV of precomputed embeddings and a
pipe-delimited metadata text file
(examples/kaggle_foodpanda_reviews/main.go:26-48, :51-83). Spark
equivalents below; parquet is the primary columnar source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet with a usable ``ts`` timestamp column.

    The table's ``ts`` is parquet TIMESTAMP(NANOS). Depending on the
    Spark build this arrives either as TIMESTAMP_NTZ (native nanos
    support, truncated to micros) or — with the legacy conf on older
    readers — as a nanos-since-epoch long. Normalize both to a
    microsecond TIMESTAMP — the same values DuckDB's microsecond
    TIMESTAMP yields on this file (session tz is UTC), so oracle
    comparisons agree.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = dict(df.dtypes)["ts"]
    if ts_type in ("bigint", "long"):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_embeddings_as_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings.parquet → the engine's canonical (id, vec) schema
    (SURVEY.md §1.3: Vector{ID, Data} ↔ id LONG, vec ARRAY<FLOAT>)."""
    return load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec"), "label"
    )


def load_query_vectors(
    spark: SparkSession, sf_dir: str, n_queries: int = 100
) -> DataFrame:
    """Self-query batch: first n stored vectors as queries (the
    reference's self-query fixture, test/integration/index_test.go:35)."""
    return (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    )


def read_embedding_csv(
    spark: SparkSession, path: str, dim: int, has_header: bool = False
) -> DataFrame:
    """CSV of floats (one embedding per row) → (id, vec).

    Parity with examples/kaggle_foodpanda_reviews/main.go:26-48 (parse
    CSV floats → [][]float32). IDs are line positions, assigned with a
    zipWithIndex-free monotonic id + window-less dense re-rank is NOT
    needed here: file order is preserved per-partition, so we use
    ``monotonically_increasing_id`` ordering then a dense row_number.
    """
    schema = T.StructType(
        [T.StructField(f"c{i}", T.FloatType()) for i in range(dim)]
    )
    df = spark.read.csv(path, schema=schema, header=has_header)
    from pyspark.sql import Window

    w = Window.orderBy(F.monotonically_increasing_id())
    return df.select(
        (F.row_number().over(w) - 1).alias("id"),
        F.array(*[F.col(f"c{i}") for i in range(dim)]).alias("vec"),
    )


def read_pipe_delimited_metadata(
    spark: SparkSession, path: str, columns: list[str]
) -> DataFrame:
    """Pipe-delimited text lines → typed columns.

    Parity with examples/kaggle_foodpanda_reviews/main.go:51-83
    (``text | Restaurant | Cuisine | City``)."""
    df = spark.read.text(path)
    parts = F.split(F.col("value"), r"\s*\|\s*")
    return df.select(
        *[F.trim(parts.getItem(i)).alias(c) for i, c in enumerate(columns)]
    )
