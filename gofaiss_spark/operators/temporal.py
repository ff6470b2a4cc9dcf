"""Temporal relational operators: as-of join and bucketized range join.

The reference engine has no temporal joins at all (SURVEY.md §2.6 —
its only joins are brute-force distance joins, flat.go:94-103); these
are round-2 extension operators for event-stream enrichment in a
training-data pipeline: attribution ("which click preceded this
purchase"), leakage windows ("what happened in the N minutes before
this label"), session context.

Both operators are written for the 100 TB shape:

- ``asof_join`` is the union-and-window formulation: ONE shuffle on
  the join key, a per-key sort, and a running ``last(ignorenulls)``
  — no row-wise time-inequality join, which Spark would execute as a
  broadcast-nested-loop (quadratic per key). State per task is the
  key's own history, the same bound a sort-merge join would carry.
  A single pathological key (one user with billions of events) is the
  known skew case; mitigate upstream by splitting such keys into
  time-range chunks before joining.
- ``range_join_buckets`` turns a bounded time-interval predicate into
  an EQUI-join on (key, time-bucket) with a constant replication
  factor (``ceil(window/bucket) + 1`` copies of the probe side), then
  applies the exact interval filter post-join. Catalyst plans it as a
  shuffled hash/sort-merge join, never a nested loop, and the exact
  predicate runs codegen'd on the joined rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join_buckets"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tie_break: str | None = None,
    suffix: str = "_r",
    tolerance_sec: float | None = None,
) -> DataFrame:
    """Backward as-of join: each left row picks the latest right row
    of the same key with ``right_ts <= left_ts`` (ANSI ``ASOF JOIN``
    semantics, DuckDB default direction). Left rows with no earlier
    right row keep NULLs (left-outer).

    Returns all ``left`` columns plus, for each name in
    ``right_cols`` (default: every right column except the key and
    timestamp), that right value as ``<name><suffix>``, and the
    matched right timestamp as ``<right_ts><suffix>``.

    ``tie_break`` names a right column that orders right rows sharing
    an identical (key, timestamp) — the largest value wins, making
    the result deterministic under timestamp collisions.

    ``tolerance_sec`` drops matches older than the tolerance
    (match becomes NULL), like pandas ``merge_asof(tolerance=...)``.
    """
    on = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        skip = set(on) | {right_ts}
        right_cols = [c for c in right.columns if c not in skip]

    payload = F.struct(
        F.col(right_ts).alias("__match_ts"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    tb = F.col(tie_break) if tie_break else F.lit(0)
    r = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        tb.cast("long").alias("__tb"),
        payload.alias("__rv"),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(0).cast("long").alias("__tb"),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    # Right rows (__side=0) sort before left rows at an equal
    # timestamp, so a same-instant right row IS eligible (<=, not <).
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").asc(), F.col("__side").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__m", F.last("__rv", ignorenulls=True).over(w))

    out = u.filter(F.col("__side") == 1)
    if tolerance_sec is not None:
        fresh = (
            F.col("__t").cast("double") - F.col("__m.__match_ts").cast("double")
        ) <= F.lit(float(tolerance_sec))
        out = out.withColumn("__m", F.when(fresh, F.col("__m")))
    out = out.withColumn(f"{right_ts}{suffix}", F.col("__m.__match_ts"))
    for c in right_cols:
        out = out.withColumn(f"{c}{suffix}", F.col(f"__m.{c}"))
    return out.drop("__t", "__side", "__tb", "__rv", "__m")


def range_join_buckets(
    probe: DataFrame,
    base: DataFrame,
    on: str | list[str],
    probe_ts: str = "ts",
    base_ts: str = "ts",
    window_sec: float = 300.0,
    bucket_sec: float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Bounded-window range join: inner-join each probe row to the
    base rows of the same key with
    ``probe_ts - window_sec <= base_ts < probe_ts`` (strictly
    earlier — a probe row never matches itself in a self-join).

    Implementation: both sides are bucketed to
    ``floor(epoch / bucket_sec)``; the probe side is exploded to the
    ``ceil(window/bucket)+1`` buckets its window can reach, the join
    runs as an equi-join on (key…, bucket), and the exact interval
    predicate filters the pairs. Replication is constant and chosen
    by ``bucket_sec`` (default: one window per bucket → 2×), so the
    shuffle volume is O(|probe|·const + |base|), never quadratic.

    Returns probe columns + base ``base_ts``/payload columns
    suffixed. Aggregate afterwards and left-join back to the probe
    side if zero-match probes must be kept.
    """
    on = [on] if isinstance(on, str) else list(on)
    bucket_sec = float(bucket_sec or window_sec)
    n_back = int(-(-window_sec // bucket_sec))  # ceil

    p_epoch = F.col(probe_ts).cast("double")
    b_epoch = F.col(base_ts).cast("double")
    p = probe.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                (F.floor(p_epoch / bucket_sec) - n_back).cast("long"),
                F.floor(p_epoch / bucket_sec).cast("long"),
            )
        ),
    )
    b = base.withColumn("__bkt", F.floor(b_epoch / bucket_sec).cast("long"))
    b = b.select(
        *on,
        "__bkt",
        *[
            F.col(c).alias(f"{c}{suffix}")
            for c in base.columns
            if c not in on
        ],
    )
    joined = p.join(b, on=on + ["__bkt"], how="inner").drop("__bkt")
    lo = F.col(probe_ts).cast("double") - F.lit(float(window_sec))
    hi = F.col(probe_ts).cast("double")
    bt = F.col(f"{base_ts}{suffix}").cast("double")
    return joined.filter((bt >= lo) & (bt < hi))
