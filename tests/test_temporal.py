"""Unit tests for the temporal join operators (asof_join /
range_join_buckets). Reference has no temporal joins (SURVEY.md
§2.6); semantics are pinned against hand-computed fixtures and the
DuckDB ASOF JOIN via the entry-oracle suite."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from gofaiss_spark.operators.temporal import asof_join, range_join_buckets


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00:00")),
            (2, "u1", _ts("2024-01-01 10:05:00")),
            (3, "u2", _ts("2024-01-01 09:00:00")),
        ],
        "id long, user string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, "u1", _ts("2024-01-01 09:59:00"), 1.0),
            (11, "u1", _ts("2024-01-01 10:05:00"), 2.0),
            (12, "u2", _ts("2024-01-01 09:30:00"), 3.0),
        ],
        "rid long, user string, ts timestamp, v double",
    )
    return left, right


def test_asof_backward_and_same_instant(frames):
    left, right = frames
    out = asof_join(left, right, on="user", right_cols=["rid", "v"])
    rows = {r["id"]: r for r in out.collect()}
    # id=1: latest right <= 10:00 is rid=10
    assert rows[1]["rid_r"] == 10 and rows[1]["v_r"] == 1.0
    # id=2: same-instant right row (10:05) IS eligible (<=)
    assert rows[2]["rid_r"] == 11
    # id=3: no right row at or before 09:00 → NULL match
    assert rows[3]["rid_r"] is None and rows[3]["ts_r"] is None


def test_asof_tolerance(frames):
    left, right = frames
    out = asof_join(
        left, right, on="user", right_cols=["rid"], tolerance_sec=30
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[2]["rid_r"] == 11  # 0s gap, inside tolerance
    assert rows[1]["rid_r"] is None  # 60s gap > 30s tolerance


def test_asof_tie_break_picks_max(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01 00:00:10"))], "id long, user string, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (5, "u", _ts("2024-01-01 00:00:00")),
            (7, "u", _ts("2024-01-01 00:00:00")),
        ],
        "rid long, user string, ts timestamp",
    )
    out = asof_join(left, right, on="user", right_cols=["rid"], tie_break="rid")
    assert out.collect()[0]["rid_r"] == 7


def test_range_join_window_bounds(spark):
    probe = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01 00:10:00"))], "id long, user string, ts timestamp"
    )
    base = spark.createDataFrame(
        [
            ("u", _ts("2024-01-01 00:04:59"), "too_old"),
            ("u", _ts("2024-01-01 00:05:00"), "lo_edge"),  # exactly -window: in
            ("u", _ts("2024-01-01 00:09:59"), "inside"),
            ("u", _ts("2024-01-01 00:10:00"), "same_instant"),  # strict <: out
            ("v", _ts("2024-01-01 00:09:00"), "other_key"),
        ],
        "user string, ts timestamp, tag string",
    )
    out = range_join_buckets(probe, base, on="user", window_sec=300)
    tags = sorted(r["tag_r"] for r in out.collect())
    assert tags == ["inside", "lo_edge"]


def test_range_join_finer_buckets_same_result(spark):
    probe = spark.range(1).select(
        F.lit("u").alias("user"),
        F.lit(_ts("2024-01-01 01:00:00")).alias("ts"),
        F.col("id"),
    )
    base = spark.createDataFrame(
        [("u", _ts("2024-01-01 00:58:30"), i) for i in range(5)]
        + [("u", _ts("2024-01-01 00:52:00"), 99)],
        "user string, ts timestamp, n long",
    )
    wide = range_join_buckets(probe, base, on="user", window_sec=300)
    fine = range_join_buckets(
        probe, base, on="user", window_sec=300, bucket_sec=60
    )
    assert sorted(r["n_r"] for r in wide.collect()) == sorted(
        r["n_r"] for r in fine.collect()
    ) == [0, 1, 2, 3, 4]
