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


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


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
        duck_rows = res.fetchall()
    finally:
        if own:
            con.close()
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
