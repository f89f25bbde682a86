"""End-to-end extraction pipeline (the Clara 15-step scheduler recast).

``continue_ocr``'s cooperative state machine (clara.c:3824-4187)
becomes a lazy DataFrame plan: segment → classify → assemble, with
optional parquet checkpoints between stage groups standing in for the
session/acts/patterns files (cml.c:399-644).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .stages.assemble import assemble
from .stages.classify import classify
from .stages.segment import segment


def extract(
    pages: DataFrame,
    patterns: DataFrame | None = None,
    engine: str | None = None,
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → extracted(url, text).

    Every input url appears in the output (empty docs → ``text=''``)
    via the segment stage's sentinel rows — one scan, one shuffle,
    no rejoin against the pages table.

    ``engine`` selects a scored comparison engine from
    ``stages.engines`` (skel/map/pd/shape, ≈ selbc) for the pattern
    match instead of the default exact-fingerprint equality; the
    default (None) is the byte-identity reference semantics. Scored
    engines need the enriched pattern table (``pattern_features``)."""
    full = engine is not None  # scored engines read the feature columns
    blocks = segment(pages, full_features=full)
    if engine is not None and patterns is not None:
        from .stages.engines import classify_scored

        scored = classify_scored(blocks, patterns, engine=engine)
        from .stages.classify import heuristic_label, heuristic_score

        labeled = scored.withColumn("label", heuristic_label()).withColumn(
            "score", heuristic_score()
        )
    else:
        labeled = classify(blocks, patterns)
    return assemble(labeled)


#: PDF magic (first five payload bytes) — JVM-side routing predicate.
PDF_MAGIC = b"%PDF-"


def _is_pdf_col():
    """NULL-safe: a NULL html payload is NOT a PDF (it must route to
    the DOM leg, whose parser yields the empty page — otherwise both
    legs' filters drop the row and the url vanishes from the output)."""
    import pyspark.sql.functions as F

    return F.coalesce(
        F.substring(F.col("html"), 1, 5) == F.lit(PDF_MAGIC), F.lit(False)
    )


def extract_mixed(
    pages: DataFrame,
    patterns: DataFrame | None = None,
    engine: str | None = None,
) -> DataFrame:
    """Mixed-content extraction: PDF payloads (detected JVM-side by the
    ``%PDF-`` magic in the binary column) go through the geometric
    layout path (``stages/layout``), everything else through the DOM
    path.  Both legs end in the same ``extracted(url, text)`` schema,
    unioned into one plan.

    The routing filter is a pushable column predicate, so each leg
    scans only its slice; at warehouse scale the capture table would
    additionally partition by content_type so the filter becomes
    partition pruning rather than a scan-time predicate (SCALE.md)."""
    from .stages.layout import extract_pdf

    is_pdf = _is_pdf_col()
    dom = extract(pages.filter(~is_pdf), patterns, engine)
    pdf = extract_pdf(pages.filter(is_pdf))
    return dom.unionByName(pdf)


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
