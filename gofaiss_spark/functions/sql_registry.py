"""SQL-facing function surface: the distance kernels as Spark SQL
scalar functions, so the engine is reachable from pure ``spark.sql``
text (BI tools, SQL notebooks, `spark-sql` shells).

Parity: the reference exposes pluggable metrics only through a Go
interface (pkg/metric/metric.go:19-22); here the same closed metric
set is registered as SQL functions. These are declarative
``CREATE FUNCTION … RETURN <expression>`` definitions (Spark SQL
UDFs) — Catalyst inlines the body into the calling plan, so they
whole-stage-codegen exactly like the Column builders in
functions/distance.py. No Python boundary, no serialization: at
100 TB a `SELECT l2_distance(a, b)` over a parquet scan runs as the
same generated JVM loop the DataFrame API produces.

Semantics are the distance.go contract, byte-for-byte with
functions/distance.py: sequential double-precision left fold;
InnerProduct = NEGATIVE dot (ascending-is-nearer everywhere); cosine
with zero-vector → 1.0 and [-1, 1] clamp (distance.go:55-71).
Arguments are declared ARRAY<DOUBLE> so FLOAT vectors widen once on
entry — the same per-element ``cast("double")`` the Column builders
apply.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_FOLD_DOT = (
    "aggregate(zip_with(a, b, (x, y) -> x * y), "
    "CAST(0.0 AS DOUBLE), (s, v) -> s + v)"
)

#: name -> (argument list, RETURN expression)
_DEFS: dict[str, tuple[str, str]] = {
    "dot_product": ("a ARRAY<DOUBLE>, b ARRAY<DOUBLE>", _FOLD_DOT),
    "inner_product_distance": (
        "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>",
        f"-({_FOLD_DOT})",
    ),
    "l2_distance_squared": (
        "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>",
        "aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), "
        "CAST(0.0 AS DOUBLE), (s, v) -> s + v)",
    ),
    "l2_distance": (
        "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>",
        "sqrt(l2_distance_squared(a, b))",
    ),
    "vector_norm_squared": (
        "v ARRAY<DOUBLE>",
        "aggregate(zip_with(v, v, (x, y) -> x * y), "
        "CAST(0.0 AS DOUBLE), (s, v) -> s + v)",
    ),
    "vector_norm": ("v ARRAY<DOUBLE>", "sqrt(vector_norm_squared(v))"),
    "cosine_distance": (
        "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>",
        "CASE WHEN vector_norm(a) = 0.0 OR vector_norm(b) = 0.0 THEN 1.0 "
        "ELSE 1.0 - least(CAST(1.0 AS DOUBLE), greatest(CAST(-1.0 AS DOUBLE), "
        "dot_product(a, b) / (vector_norm(a) * vector_norm(b)))) END",
    ),
}

#: Registration order matters: later bodies call earlier functions.
_ORDER = (
    "dot_product",
    "inner_product_distance",
    "l2_distance_squared",
    "l2_distance",
    "vector_norm_squared",
    "vector_norm",
    "cosine_distance",
)


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register every kernel as a session-scoped SQL function and
    return the registered names. Idempotent (OR REPLACE)."""
    for name in _ORDER:
        args, body = _DEFS[name]
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({args}) "
            f"RETURNS DOUBLE RETURN {body}"
        )
    return list(_ORDER)
