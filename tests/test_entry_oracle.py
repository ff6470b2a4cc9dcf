"""Simulates the driver's correctness gate: run each ``queries()``
entry on Spark and its ``oracle_sql()`` on DuckDB over the same
parquet tables, then compare row count + column names + sorted
values. Run at sf0.001 by default (driver uses sf0.01)."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod
from gofaiss_spark.sources.readers import TABLES


def _duck_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # collapse -0.0 vs 0.0 and format compactly
        return f"{v + 0.0:.9g}"
    return str(v)


def _norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in idx) for r in rows]
    out.sort()
    return sorted(cols), out


def _duck_type_class(t):
    """Collapse a DuckDB type string to a comparison class. HUGEINT is
    deliberately its own class: DuckDB returns it for sum() over
    integers, pandas widens it to float64, and the driver's
    type-sensitive value hash then diverges from Spark's int64 —
    the tpch_q12/multimodal_stats artifact class."""
    t = t.upper()
    if t.startswith("DECIMAL"):
        return "decimal"
    if t in ("BIGINT", "INTEGER", "SMALLINT", "TINYINT",
             "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT"):
        return "int"
    if t == "HUGEINT":
        return "hugeint"
    if t in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if t == "VARCHAR":
        return "str"
    if t == "BOOLEAN":
        return "bool"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t == "DATE":
        return "date"
    if t.endswith("[]") or t.startswith(("LIST", "ARRAY")):
        return "array"
    return t.lower()


def _spark_type_class(dt):
    from pyspark.sql import types as T

    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return "int"
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.TimestampType):
        return "timestamp"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.ArrayType):
        return "array"
    return dt.simpleString()


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


def test_every_oracle_key_has_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = _duck_con(sf_dir)
    d_types = {
        r[0]: _duck_type_class(r[1])
        for r in con.execute("DESCRIBE " + ORACLES[name]).fetchall()
    }
    cur = con.execute(ORACLES[name])
    d_cols = [d[0] for d in cur.description]
    d_rows = cur.fetchall()
    con.close()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    s_types = {f.name: _spark_type_class(f.dataType) for f in sdf.schema.fields}
    type_diffs = {
        c: (s_types[c], d_types[c])
        for c in s_types
        if c in d_types and s_types[c] != d_types[c]
    }
    assert not type_diffs, (
        f"{name}: column type classes differ (spark, duckdb): {type_diffs} "
        "— the driver's value hash is type-sensitive (HUGEINT→float64 in "
        "pandas), so cast the oracle SQL to the Spark-side type"
    )
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    sc, sr = _norm_rows(s_cols, s_rows)
    dc, dr = _norm_rows(d_cols, d_rows)
    mismatches = [i for i, (a, b) in enumerate(zip(sr, dr)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} value mismatches; first: "
        f"{sr[mismatches[0]]} vs {dr[mismatches[0]]}"
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"query_id", "id", "distance"}


def test_bpe_merges_oracle_survives_early_exhaustion(spark, tmp_path):
    """The r5 ADVICE edge: a corpus that exhausts the merge loop
    before BPE_N_MERGES must still hash-match its oracle (the old
    formulation assumed exactly N rows and needed a loud assert).
    This corpus supports exactly 3 merges — far fewer than
    BPE_N_MERGES=20."""
    sf = str(tmp_path)
    spark.createDataFrame(
        [(1, "aa b"), (2, "aa aa b")], "doc_id long, text string"
    ).write.parquet(f"{sf}/documents.parquet")

    sdf = QUERIES["doc_bpe_merges"](spark, sf)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    assert len(s_rows) == 1 and s_rows[0][2] is True  # ok == True

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf}/documents.parquet/*.parquet'"  # Spark writes a dir
    )
    cur = con.execute(ORACLES["doc_bpe_merges"])
    d_cols = [d[0] for d in cur.description]
    d_rows = cur.fetchall()
    con.close()
    assert _norm_rows(s_cols, s_rows) == _norm_rows(d_cols, d_rows)


def test_bpe_merges_ok_false_on_illegitimate_early_stop(spark, monkeypatch):
    """If the loop stops early while mergeable pairs REMAIN (a loop
    bug, simulated by capping the loop), ok must flip false — the
    exhaustion check is a real gate, not a rubber stamp."""
    from gofaiss_spark.operators import tokenizer as tok

    real_loop = tok._bpe_merge_loop
    monkeypatch.setattr(
        tok, "_bpe_merge_loop",
        lambda wc, n, min_pair_freq: real_loop(wc, 3, min_pair_freq),
    )
    sdf = QUERIES["doc_bpe_merges"](spark, "/root/testdata/sf0.001")
    row = sdf.collect()[0]
    assert row["ok"] is False
