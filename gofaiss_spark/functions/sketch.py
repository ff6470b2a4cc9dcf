"""Sketch-based approximate profiling: HyperLogLog distinct counts
and quantile sketches, with exact values computed alongside as the
correctness gate.

At 100 TB the exact computations are the expensive path — an exact
COUNT(DISTINCT) shuffles every distinct key and an exact percentile
sorts the column — while the sketches are single-pass, fixed-memory,
and mergeable across partitions (HLL registers / Greenwald-Khanna
summaries combine in the partial-aggregation step, so the shuffle
carries one sketch per partition, not the data). The driver-contract
queries emit BOTH the exact value (hash-matched against DuckDB) and
an `ok` boolean asserting the sketch landed within its error bound —
engine-independent evidence the approximate path works.

No analogue exists in the reference (it profiles nothing); this is
part of the large-corpus curation surface (corpus cardinality /
length-distribution reporting).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "distinct_sketch",
    "quantile_sketch",
    "heavy_hitters_cms",
    "profile_columns",
]


def profile_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Data-quality audit: per column (column_name, n_rows, n_null,
    min_value, max_value) in ONE aggregation pass over the table
    (all columns' aggregates partial-combine together — the audit
    never costs more than a single scan at any scale). min/max are
    stringified so heterogeneous column types stack into one narrow
    report."""
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"_n_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    row = df.agg(*aggs).collect()[0]
    spark = df.sparkSession
    out = [
        (
            c,
            int(row[f"_n_{c}"]),
            int(row[f"_null_{c}"]),
            row[f"_min_{c}"],
            row[f"_max_{c}"],
        )
        for c in cols
    ]
    return spark.createDataFrame(
        out,
        "column_name string, n_rows long, n_null long, "
        "min_value string, max_value string",
    )


def distinct_sketch(
    df: DataFrame,
    cols: Sequence[str],
    rsd: float = 0.02,
    tolerance: float = 0.05,
) -> DataFrame:
    """Per column: HLL++ approximate distinct count next to the exact
    count, plus `approx_ok` = relative error within `tolerance`
    (default 5% ≈ 2.5σ at rsd=0.02; HLL hashing is deterministic, so
    a pass is stable, not flaky).

    Physical shape (optimization r12): one column-pruned
    distinct→agg job per column, submitted CONCURRENTLY from a small
    thread pool (guide §2.6 — overlap independent jobs). N distinct
    aggregates in one ``df.agg`` made Catalyst rewrite through an
    Expand that multiplies every input row (N+…)× before the first
    partial aggregate; per-column jobs scan only their own parquet
    column, never expand, and their tails back-fill each other.
    ``approx_count_distinct`` over the pre-distincted values inserts
    exactly the same hash set into the HLL registers as over the raw
    column (duplicates are idempotent, NULLs excluded both ways), so
    estimates — and the approx_ok booleans — are bit-identical."""
    from concurrent.futures import ThreadPoolExecutor

    spark = df.sparkSession

    def one(c: str) -> tuple:
        spark.sparkContext.setJobDescription(f"distinct_sketch: {c}")
        row = (
            df.select(F.col(c).alias("_v"))
            .where(F.col("_v").isNotNull())
            .distinct()
            .agg(
                F.count(F.lit(1)).alias("_ex"),
                F.approx_count_distinct("_v", rsd).alias("_ap"),
            )
            .collect()[0]
        )
        return c, int(row["_ex"]), row["_ap"]

    with ThreadPoolExecutor(max_workers=min(4, max(1, len(cols)))) as pool:
        rows = list(pool.map(one, cols))
    out = [
        (c, ex, bool(abs(ap - ex) <= tolerance * ex))
        for c, ex, ap in rows
    ]
    return spark.createDataFrame(
        out, "column_name string, exact_distinct long, approx_ok boolean"
    )


def heavy_hitters_cms(
    df: DataFrame,
    col: str,
    k: int = 10,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """Top-k heavy hitters with a count-min-sketch cross-check.

    The CMS aggregates distributedly (mergeable registers, one pass);
    the driver then reads the estimate for each of the exact top-k
    keys from the sketch. CMS NEVER under-counts, so
    `cms_ge_exact = estimate ≥ exact` is a deterministic invariant —
    any serialization or merge bug shows up as an under-count. Rows:
    (key, exact_count, cms_ge_exact), ranked by (count desc, key).

    Integral columns are sketched and reported as `key long`;
    everything else (strings, timestamps, ...) is cast to string and
    reported as `key string` (count_min_sketch supports integral,
    string and binary inputs, so the cast makes the sketch and the
    exact groupBy agree on the key)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as FF

    spark = df.sparkSession
    dtype = dict(df.dtypes)[col]
    integral = dtype in ("tinyint", "smallint", "int", "bigint")
    key_col = FF.col(col) if integral or dtype == "string" else FF.col(col).cast("string")
    sk = df.agg(
        FF.count_min_sketch(
            key_col, FF.lit(eps), FF.lit(confidence), FF.lit(seed)
        ).alias("sk")
    ).collect()[0]["sk"]
    jvm = spark.sparkContext._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytes(sk))
    )
    w = Window.orderBy(FF.col("exact_count").desc(), FF.col("key").asc())
    top = (
        df.groupBy(key_col.alias("key"))
        .agg(FF.count(FF.lit(1)).alias("exact_count"))
        .withColumn("_r", FF.row_number().over(w))
        .filter(FF.col("_r") <= k)
        .drop("_r")
        .collect()
    )
    cast_key = int if integral else str
    rows = [
        (
            cast_key(r["key"]),
            int(r["exact_count"]),
            bool(cms.estimateCount(cast_key(r["key"])) >= r["exact_count"]),
        )
        for r in top
    ]
    return spark.createDataFrame(
        rows,
        f"key {'long' if integral else 'string'}, "
        "exact_count long, cms_ge_exact boolean",
    )


def quantile_sketch(
    df: DataFrame,
    col: str,
    probs: Sequence[float] = (0.5, 0.9, 0.99),
    accuracy: int = 10000,
    rel_tolerance: float = 0.01,
) -> DataFrame:
    """Approximate quantiles (Greenwald-Khanna via percentile_approx)
    next to exact interpolated percentiles. `approx_ok` = the sketch
    value is within `rel_tolerance` of the column's full range of the
    exact value. Exact values are rounded to 6dp (they hash-match
    DuckDB's quantile_cont, which uses the same linear
    interpolation)."""
    parr = F.array(*[F.lit(float(p)) for p in probs])
    agg = df.agg(
        F.percentile(F.col(col), parr).alias("_exact"),
        F.percentile_approx(F.col(col), parr, F.lit(accuracy)).alias("_approx"),
        (F.max(col) - F.min(col)).alias("_range"),
    )
    pairs = agg.select(
        F.posexplode(F.arrays_zip("_exact", "_approx")).alias("_i", "_pair"),
        "_range",
    )
    prob_col = F.element_at(parr, F.col("_i") + 1)
    return pairs.select(
        prob_col.alias("prob"),
        F.round(F.col("_pair._exact"), 6).alias("exact_value"),
        (
            F.abs(F.col("_pair._approx") - F.col("_pair._exact"))
            <= F.lit(rel_tolerance) * F.col("_range")
        ).alias("approx_ok"),
    )
