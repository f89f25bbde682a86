"""Capture-table source formats beyond parquet, and line-oriented
sinks.

The reference reads its own raster container formats (`pbm2bm`,
`loadpgm` — pbm2cl.c, SURVEY §2.1); the web-scale analogue is reading
the SAME logical pages table from whatever container a crawler
emitted: parquet (the native layout), JSONL (the interchange format
most crawl/annotation tooling speaks), or CSV.  The binary ``html``
payload cannot ride a text container raw, so JSONL/CSV carry it
base64-encoded in an ``html_b64`` column — encode/decode happens in
JVM expressions at the boundary, and everything downstream sees the
identical PAGES schema.

Sinks mirror this: parquet for the warehouse, JSONL for handoff to
training-data tooling (one JSON object per line, the shape tokenizer
pipelines consume).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

#: text-container twin of streaming.incremental.PAGES_SPARK_SCHEMA —
#: html travels base64-encoded
PAGES_TEXT_SCHEMA = (
    "url string, warc_ts timestamp, html_b64 string, "
    "text string, lang string"
)


def _decode(df: DataFrame) -> DataFrame:
    return df.select(
        "url",
        "warc_ts",
        F.unbase64("html_b64").alias("html"),
        "text",
        "lang",
    )


def read_pages_any(
    spark: SparkSession, path: str, format: str = "parquet"
) -> DataFrame:
    """pages table from parquet / jsonl / csv — one logical schema.

    Scale notes: parquet scans get column pruning + predicate pushdown
    for free; JSONL/CSV are schema-on-read with an explicit schema (no
    sampling pass over 100 TB) and split by line, so they parallelize
    the same way — but they are ingest formats: first touch should
    land them into the bucketed parquet/Iceberg layout (SCALE.md)."""
    if format == "parquet":
        return spark.read.parquet(path)
    if format == "jsonl":
        return _decode(spark.read.schema(PAGES_TEXT_SCHEMA).json(path))
    if format == "csv":
        # multiLine: the text column carries embedded newlines, which
        # the CSV writer quotes — but a multiLine CSV file is NOT
        # line-splittable, so each file becomes one task. CSV is the
        # compatibility path; JSONL (one object per line, splittable)
        # is the text container that parallelizes at scale.
        return _decode(
            spark.read.schema(PAGES_TEXT_SCHEMA)
            .option("header", "true")
            .option("multiLine", "true")
            .option("escape", '"')
            .csv(path)
        )
    raise ValueError(f"unknown pages format: {format}")


def write_pages_text(df: DataFrame, path: str, format: str) -> None:
    """Write a pages table to a text container (base64 html)."""
    enc = df.select(
        "url",
        "warc_ts",
        F.base64("html").alias("html_b64"),
        "text",
        "lang",
    )
    if format == "jsonl":
        enc.write.mode("overwrite").json(path)
    elif format == "csv":
        # RFC-4180 doubled-quote escaping on BOTH sides (Spark's
        # writer default is backslash-escape, which its own multiLine
        # reader with escape='"' would misparse on embedded quotes)
        (
            enc.write.mode("overwrite")
            .option("header", "true")
            .option("escape", '"')
            .csv(path)
        )
    else:
        raise ValueError(f"unknown pages format: {format}")


def write_extracted(
    df: DataFrame, path: str, format: str = "parquet"
) -> None:
    """Extracted/curated output sink: parquet (warehouse) or JSONL
    (one object per line — the handoff shape tokenizer pipelines
    consume). Append mode in both, so incremental runs keep
    accumulating."""
    if format == "parquet":
        df.write.mode("append").parquet(path)
    elif format == "jsonl":
        df.write.mode("append").json(path)
    else:
        raise ValueError(f"unknown output format: {format}")
