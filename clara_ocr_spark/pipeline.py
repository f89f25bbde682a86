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
    min_text_len: int | None = None,
    link_density_max: float | None = None,
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
        from .extract_rules import LINK_DENSITY_MAX, MIN_TEXT_LEN

        labeled = classify(
            blocks,
            patterns,
            min_text_len if min_text_len is not None else MIN_TEXT_LEN,
            link_density_max
            if link_density_max is not None
            else LINK_DENSITY_MAX,
        )
    return assemble(labeled)


def extract_hqbin(
    pages: DataFrame,
    patterns: DataFrame | None = None,
    min_tokens: int = 5,
    loose_min_text_len: int = 3,
    loose_link_density_max: float = 0.75,
) -> DataFrame:
    """hqbin-style second-pass re-parse (reference preproc.c:672-721,
    ``bin_method`` selector common.h:297-299; VERDICT r1 missing #4):
    extract with the strict (byte-identity) strategy first; documents
    whose extraction fails the quality gate (< ``min_tokens``
    whitespace tokens) are re-parsed with the looser thresholds, and
    the re-parse is kept only when it recovers STRICTLY more tokens.

    Output: ``(url, text, hq_reparsed)``. Gate-passing documents are
    untouched — their text is byte-identical to :func:`extract` by
    construction (pinned by test). The residual pattern is the proven
    PNT1→PNT2 two-pass shape: the second pass scans only the failing
    slice (left-semi join), so its cost is proportional to the
    residual, not the corpus."""
    return hqbin_second_pass(
        extract(pages, patterns),
        pages,
        patterns,
        min_tokens,
        loose_min_text_len,
        loose_link_density_max,
    )


def hqbin_second_pass(
    extracted: DataFrame,
    pages: DataFrame,
    patterns: DataFrame | None = None,
    min_tokens: int = 5,
    loose_min_text_len: int = 3,
    loose_link_density_max: float = 0.75,
) -> DataFrame:
    """The hqbin residual pass given an existing first-pass extraction
    (so a job can keep its own first-pass plan — acts, observations —
    and only bolt the re-parse on top). See :func:`extract_hqbin`."""
    import pyspark.sql.functions as F

    def ntok(c):
        return F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(
            F.size(F.split(F.trim(c), r"\s+"))
        )

    first = extracted.select("url", "text").withColumn(
        "_n1", ntok(F.col("text"))
    )
    passing = first.filter(F.col("_n1") >= min_tokens).select(
        "url", "text", F.lit(False).alias("hq_reparsed")
    )
    failing = first.filter(F.col("_n1") < min_tokens)
    retry_pages = pages.join(failing.select("url"), "url", "left_semi")
    second = extract(
        retry_pages,
        patterns,
        min_text_len=loose_min_text_len,
        link_density_max=loose_link_density_max,
    ).select("url", F.col("text").alias("_t2"))
    second = second.withColumn("_n2", ntok(F.col("_t2")))
    better = F.coalesce(F.col("_n2") > F.col("_n1"), F.lit(False))
    resolved = failing.join(second, "url", "left").select(
        "url",
        F.when(better, F.col("_t2")).otherwise(F.col("text")).alias("text"),
        better.alias("hq_reparsed"),
    )
    return passing.unionByName(resolved)


def extract_markup(
    pages: DataFrame, patterns: DataFrame | None = None
) -> DataFrame:
    """Marked-up output variant (OE_FULL_HTML's <I>/<B> spans,
    html.c:1966-1973): ``(url, text)`` with inline <i>/<b> wrappers at
    the emphasis spans the parser recorded (wprops word-flag analogue,
    build.c:585-685). Byte-identical to
    ``extract_rules.reference_extract_markup`` per url, and to plain
    :func:`extract` on emphasis-free documents."""
    from .stages.assemble import assemble_markup

    return assemble_markup(
        classify(segment(pages, full_features=False, with_emph=True), patterns)
    )


def extract_full_html(
    pages: DataFrame, patterns: DataFrame | None = None
) -> DataFrame:
    """Full-document HTML output variant (reference OE_FULL_HTML,
    html.c:1966-1973): ``(url, html)`` — a complete entity-escaped
    HTML document per url with the kept/total block-count stats
    comment (the "Symbols: n/m" page-header analogue,
    clara.c:3361-3381)."""
    from .stages.assemble import assemble_full_html

    return assemble_full_html(classify(segment(pages), patterns))


def extract_encap(
    pages: DataFrame, patterns: DataFrame | None = None
) -> DataFrame:
    """Encapsulated output variant (reference OE_ENCAP_HTML / DJVU
    with coordinates, html.c:1966-1973): ``(url, text, blocks)`` where
    ``text`` is byte-identical to :func:`extract` and ``blocks`` gives
    every block's label/score and character span inside ``text``
    (start = end = -1 for excluded blocks) — the machine-readable
    format the doubts-revision UI consumes."""
    from .stages.assemble import assemble_encap

    return assemble_encap(classify(segment(pages), patterns))


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
