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


def write_warc(rows, path: str) -> None:
    """Write WARC/1.0 response records (test/fixture writer — one
    file per call; a crawler writes these, we only need to READ them
    at scale). ``rows``: dicts with url, warc_ts, html."""
    with open(path, "wb") as f:
        for r in rows:
            payload = r["html"] or b""
            ts = r["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ")
            head = (
                "WARC/1.0\r\n"
                "WARC-Type: response\r\n"
                f"WARC-Target-URI: {r['url']}\r\n"
                f"WARC-Date: {ts}\r\n"
                f"Content-Length: {len(payload)}\r\n"
                "\r\n"
            ).encode()
            f.write(head + payload + b"\r\n\r\n")


def _parse_warc_bytes(data: bytes):
    """Yield (url, iso_ts, payload) per WARC/1.0 response record.
    Content-Length-driven slicing — payloads may contain anything,
    including 'WARC/1.0' lookalikes."""
    pos = 0
    while True:
        start = data.find(b"WARC/1.0\r\n", pos)
        if start < 0:
            return
        hdr_end = data.find(b"\r\n\r\n", start)
        if hdr_end < 0:
            return
        headers = {}
        for line in data[start:hdr_end].decode("utf-8").split("\r\n")[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        n = int(headers.get("content-length", "0"))
        body = data[hdr_end + 4 : hdr_end + 4 + n]
        pos = hdr_end + 4 + n
        if headers.get("warc-type") == "response":
            yield (
                headers.get("warc-target-uri", ""),
                headers.get("warc-date", ""),
                body,
            )


def read_pages_warc(spark: SparkSession, path: str) -> DataFrame:
    """pages table from WARC files — the crawler-native container
    (Common Crawl ships ~64k WARC files per crawl; one Spark task per
    file is the natural parallelism, and the binary payload never
    leaves the parsing task, the same discipline as the html column
    in the extraction pipeline).

    Minimal WARC/1.0: uncompressed response records, Content-Length
    framing. Production crawls gzip per-record (.warc.gz members) —
    swap the byte-splitter for a gzip-member walk there; the Spark
    shape (binaryFile scan → mapInPandas record parse → PAGES schema)
    is unchanged. Records carry no pre-extracted text/lang, so those
    columns come back NULL — extraction derives them.

    Timezone: WARC-Date is UTC; Spark reads a tz-naive pandas value as
    *session-zone* wall time, so the instant is first converted to the
    session timezone and then tz-stripped (ADVICE r2 — a bare UTC
    strip shifted warc_ts by the session offset on non-UTC sessions,
    diverging from the parquet/jsonl readers)."""
    import pandas as pd

    session_tz = spark.conf.get("spark.sql.session.timeZone")
    files = spark.read.format("binaryFile").load(path)

    def parse(batches):
        for pdf in batches:
            out = {
                "url": [], "warc_ts": [], "html": [],
                "text": [], "lang": [],
            }
            for content in pdf["content"]:
                for url, ts, body in _parse_warc_bytes(bytes(content)):
                    out["url"].append(url)
                    out["warc_ts"].append(
                        pd.to_datetime(ts, utc=True)
                        .tz_convert(session_tz)
                        .tz_localize(None)
                        if ts
                        else pd.NaT
                    )
                    out["html"].append(body)
                    out["text"].append(None)
                    out["lang"].append(None)
            yield pd.DataFrame(out)

    from ..streaming.incremental import PAGES_SPARK_SCHEMA

    return files.select("content").mapInPandas(
        parse, schema=PAGES_SPARK_SCHEMA
    )


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
