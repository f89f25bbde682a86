"""Byte-identity gate: Spark pipeline output == reference extractor
output, per url, over the full synthetic corpus (all 5 templates,
3 langs, Latin-1 docs, malformed docs, zoned docs).

≈ the imre.pbm end-to-end regression fixture (book.c:982-984) at
corpus scale — the authoritative invariant from BASELINE.json
``input_hint``: *byte-identical extracted text per url*.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from clara_ocr_spark.pipeline import extract, read_pages


def test_byte_identity_vs_reference(spark, corpus_path):
    pages = read_pages(spark, corpus_path)
    got = extract(pages)  # sentinel rows: every url present
    joined = (
        pages.select("url", F.col("text").alias("expected"))
        .join(got.withColumnRenamed("text", "actual"), "url", "full")
        .collect()
    )
    assert len(joined) == pages.count()
    bad = [
        r.url
        for r in joined
        if r.expected is None or r.actual is None or r.expected != r.actual
    ]
    assert bad == [], f"{len(bad)} urls mismatch, first: {bad[:3]}"


def test_extract_deterministic_across_partitionings(spark, corpus_path):
    """Reading order must be a total order — identical output no matter
    how the data is partitioned (SURVEY §7 hard-part 2)."""
    pages = read_pages(spark, corpus_path)
    a = {r.url: r.text for r in extract(pages.repartition(1)).collect()}
    b = {r.url: r.text for r in extract(pages.repartition(17)).collect()}
    assert a == b


def test_extract_covers_content(spark, corpus_path):
    """Quality proxy (≈ selthresh bookfont-size metric): extraction is
    non-trivial — most docs yield non-empty text."""
    pages = read_pages(spark, corpus_path)
    got = extract(pages)
    n = got.count()
    nonempty = got.filter(F.length("text") > 0).count()
    assert nonempty / n > 0.95


def test_identity_on_adversarial_rows(spark):
    """End-to-end identity beyond the corpus domain: null/empty/garbage
    html, off-domain tag soup (forces the stdlib fallback inside the
    Spark workers), and fuzz-style fragments all extract byte-identical
    to the reference extractor. Null html defines the empty document."""
    import datetime

    from clara_ocr_spark.extract_rules import reference_extract
    from clara_ocr_spark.streaming.incremental import PAGES_SPARK_SCHEMA

    ts = datetime.datetime(2026, 1, 1)
    payloads = [
        b"",
        None,
        b"<p>ok</p>",
        b"\xff\xfe garbage \x00 bytes <p>x</p>",
        b"<b;>junk</b;><p>real content paragraph with several words</p>",
        b"<!--<p><p>",
        b"<div><p>" + b"word " * 80 + b"</p></div>",
        b"<p>a</p>" * 500,
        "<p>café straße — motörhead</p>".encode("utf-8"),
        b"<a href='/x'>nav nav nav</a>" * 30,
    ]
    rows = [
        (f"u{i}", ts, h, "" if h is None else reference_extract(h), "en")
        for i, h in enumerate(payloads)
    ]
    df = spark.createDataFrame(rows, PAGES_SPARK_SCHEMA)
    got = {r.url: r.text for r in extract(df).collect()}
    want = {u: t for u, _, _, t, _ in rows}
    assert got == want


def test_committed_goldens(spark, tmp_path):
    """Byte-identity against COMMITTED goldens (the imre.pbm regression
    pattern, book.c:982-984): catches coordinated drift of pipeline +
    reference extractor that runtime comparison cannot."""
    import json
    import os

    from clara_ocr_spark.sources.corpus import gen_page
    from clara_ocr_spark.streaming.incremental import PAGES_SPARK_SCHEMA

    path = os.path.join(os.path.dirname(__file__), "goldens", "extract_seed42_60.json")
    with open(path) as f:
        want = {r["url"]: r["text"] for r in json.load(f)}
    import datetime

    ts = datetime.datetime(2026, 1, 1)
    pages = [gen_page(i, seed=42) for i in range(60)]
    df = spark.createDataFrame(
        [(p["url"], ts, p["html"], "", "en") for p in pages], PAGES_SPARK_SCHEMA
    )
    got = {r.url: r.text for r in extract(df).collect()}
    assert got == want
