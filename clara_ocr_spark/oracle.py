"""Local replica of the driver's correctness check: run a Spark query
and its DuckDB oracle SQL side-by-side and compare row-count, schema
(column names), and order-insensitive values.

Used by tests; the authoritative check is the driver's
CORRECTNESS_r{N}.json at sf0.01.
"""

from __future__ import annotations

import math
from typing import Callable

import duckdb
from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _sort_key(row):
    # rows may mix NULLs with values (or, across rows, types) — raw
    # tuple sorting raises TypeError on None < int. Key each element
    # as (is_null, type_name, repr): total order, and equal keys imply
    # equal normalized values, so listwise equality after sorting is
    # exactly multiset equality.
    return [
        (1, "", "") if v is None else (0, type(v).__name__, repr(v))
        for v in row
    ]


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows), key=_sort_key
    )


#: The driver hashes values through Arrow/pandas, where a DuckDB
#: HUGEINT (int128, what DuckDB's sum() of any integer returns)
#: serializes differently from Spark's BIGINT even when the numbers
#: are equal — a pure fetchall() comparison can't see that. Classify
#: both sides into type *kinds* and require them to agree, and
#: explicitly refuse HUGEINT: the oracle SQL must cast integer sums
#: to BIGINT (VERDICT r1 "What's wrong" #1).
_SPARK_KIND = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "float": "float", "double": "float",
    "string": "str", "boolean": "bool", "date": "date", "binary": "bin",
}


def _spark_kind(dtype: str) -> str:
    if dtype.startswith("decimal"):
        return "decimal"
    if dtype.startswith("timestamp"):
        return "ts"
    if dtype.startswith("array"):
        return "list"
    if dtype.startswith("struct") or dtype.startswith("map"):
        return "struct"
    return _SPARK_KIND.get(dtype, dtype)


def _duck_kind(t: str) -> str:
    t = t.upper()
    if t == "HUGEINT" or t == "UHUGEINT":
        return "hugeint"  # never acceptable — cast the sum to BIGINT
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER"):
        return "int"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t in ("VARCHAR", "TEXT"):
        return "str"
    if t == "BOOLEAN":
        return "bool"
    if t.startswith("TIMESTAMP"):
        return "ts"
    if t == "DATE":
        return "date"
    if t == "BLOB":
        return "bin"
    if t.endswith("[]") or t.startswith("LIST"):
        return "list"
    if t.startswith("STRUCT") or t.startswith("MAP"):
        return "struct"
    return t


def assert_type_parity(df: DataFrame, duck_cols, duck_types) -> None:
    """Column-by-column (matched by name) type-kind equality between
    the Spark result and the DuckDB oracle result."""
    spark_types = dict(df.dtypes)
    duck_by_name = dict(zip(duck_cols, (str(t) for t in duck_types)))
    for name in sorted(spark_types):
        if name not in duck_by_name:
            continue  # schema check reports missing columns separately
        sk = _spark_kind(spark_types[name])
        dk = _duck_kind(duck_by_name[name])
        assert sk == dk, (
            f"type-kind mismatch on {name!r}: spark {spark_types[name]} "
            f"({sk}) vs duckdb {duck_by_name[name]} ({dk}) — the driver's "
            "value hash distinguishes these even when values are equal"
        )


def compare(
    spark: SparkSession,
    sf_dir: str,
    query_fn: Callable[[SparkSession, str], DataFrame],
    sql: str,
    con: duckdb.DuckDBPyConnection | None = None,
) -> None:
    """Raise AssertionError on any mismatch (count / schema / values)."""
    df = query_fn(spark, sf_dir)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]
    own = con is None
    if own:
        con = duck_connect(sf_dir)
    try:
        res = con.sql(sql)
        duck_cols = list(res.columns)
        duck_types = list(res.types)
        duck_rows = res.fetchall()
    finally:
        if own:
            con.close()
    assert_type_parity(df, duck_cols, duck_types)
    assert sorted(spark_cols) == sorted(duck_cols), (
        f"schema mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    a, b = _canon(spark_rows, spark_cols), _canon(duck_rows, duck_cols)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        raise AssertionError(f"value mismatch, first diffs: {diffs}")
