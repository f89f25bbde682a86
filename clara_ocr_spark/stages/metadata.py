"""Head-metadata harvest — each page's self-description as a table.

The extraction pipeline deliberately DROPS everything inside
``<head>`` (spec step 3, domparse.py): titles and meta tags are not
main content.  But a corpus run wants them anyway — title and
description feed search snippets and quality features, ``rel=
canonical`` feeds crawl dedup (`url_canonical_groups` is the url-side
twin), and OpenGraph tags mark pages that publishers curated for
sharing.  This stage is the analogue of the per-page header the
reference keeps NEXT TO the recognized text rather than inside it:
loadpgm's PGM header fields (pgmblock.c:263-457) and the per-page
properties block `write_report` summarizes (clara.c).

Same execution discipline as `stages/links.py`: per-document parse is
Arrow-batched Python (`mapInPandas`, zero per-row UDFs), the stage is
map-only (adds NO shuffle), and the html payload dies inside the
parse — downstream sees only short strings.  The parser stops at the
end of ``<head>`` (or the first ``<body>`` content), so cost per
document is bounded by head size, not page size.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from ..domparse import decode_html

METADATA_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("title", StringType()),
        StructField("description", StringType()),
        StructField("canonical", StringType()),
        StructField("og_title", StringType()),
        StructField("n_meta", IntegerType()),
        StructField("n_og", IntegerType()),
    ]
)


class _StopParse(Exception):
    """Raised to abandon the feed once the head is fully harvested."""


class _HeadParser(HTMLParser):
    """Collects title / meta / link[rel=canonical] until the head ends.

    Crawl HTML routinely omits ``</head>`` (and the corpus's malformed
    template omits closers generally), so "head ends" is the browser
    rule: an explicit ``</head>``/``<body>``, or the first tag that
    only belongs in the body.  First occurrence wins for every field —
    duplicated meta tags are common and browsers honor the first."""

    _BODY_TAGS = frozenset(
        "p div main article section table ul ol h1 h2 h3 h4 h5 h6 br img a"
        .split()
    )

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.title: Optional[str] = None
        self.description: Optional[str] = None
        self.canonical: Optional[str] = None
        self.og_title: Optional[str] = None
        self.n_meta = 0
        self.n_og = 0
        self._in_title = False
        self._title_buf: list[str] = []

    def _finish_title(self) -> None:
        if self._in_title:
            self._in_title = False
            if self.title is None:
                self.title = " ".join("".join(self._title_buf).split())

    def handle_starttag(self, tag: str, attrs) -> None:
        tag = tag.lower()
        if tag in self._BODY_TAGS or tag == "body":
            self._finish_title()
            raise _StopParse
        a = {k.lower(): v for k, v in (attrs or ()) if v is not None}
        if tag == "title":
            if self.title is None:
                self._in_title = True
                self._title_buf = []
        elif tag == "meta":
            self.n_meta += 1
            name = (a.get("name") or "").lower()
            prop = (a.get("property") or "").lower()
            content = a.get("content")
            if prop.startswith("og:"):
                self.n_og += 1
                if prop == "og:title" and self.og_title is None:
                    self.og_title = content
            if name == "description" and self.description is None:
                self.description = content
        elif tag == "link":
            rels = (a.get("rel") or "").lower().split()
            if "canonical" in rels and self.canonical is None:
                self.canonical = a.get("href")

    def handle_endtag(self, tag: str) -> None:
        tag = tag.lower()
        if tag == "title":
            self._finish_title()
        elif tag == "head":
            raise _StopParse

    def handle_data(self, data: str) -> None:
        if self._in_title and data:
            self._title_buf.append(data)


def parse_head_meta(
    raw: bytes | None,
) -> Tuple[Optional[str], Optional[str], Optional[str], Optional[str], int, int]:
    """One document's head metadata:
    (title, description, canonical, og_title, n_meta, n_og).

    Parse errors yield the all-NULL row — the corrupt-input contract
    of every decode stage in this repo (empty row, never a crash)."""
    p = _HeadParser()
    try:
        p.feed(decode_html(raw))
        p.close()
    except _StopParse:
        pass
    except Exception:
        return (None, None, None, None, 0, 0)
    p._finish_title()
    return (p.title, p.description, p.canonical, p.og_title, p.n_meta, p.n_og)


def harvest_metadata(pages: DataFrame) -> DataFrame:
    """pages(url, html, …) → one metadata row per page.

    Column-prunes to (url, html) before the Python boundary; map-only
    (the stage adds NO shuffle); output rows are a few hundred bytes,
    so whatever shuffles downstream never carries payloads."""
    import pandas as pd  # noqa: F401 (worker-side)

    def _batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"].to_numpy(), pdf["html"].to_numpy()):
                rows.append((url, *parse_head_meta(html)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in METADATA_SCHEMA.fields]
            )

    return pages.select("url", "html").mapInPandas(
        _batches, schema=METADATA_SCHEMA
    )


# ---------------------------------------------------------------------
# Publish-date harvest — the date tier ladder every article-metadata
# extractor walks (trafilatura/htmldate shape): structured metadata
# beats a semantic <time> tag beats a prose byline.  Pure JVM column
# algebra (regexp over the decoded page string), map-only — unlike the
# head parse above there is no Python boundary at all, so the harvest
# rides free on any pass that already materialized the page text.
# Reference analogue: the per-page properties block the reference
# keeps beside the recognized text (loadpgm header fields,
# pgmblock.c:263-457) — provenance metadata, not content.
# ---------------------------------------------------------------------

#: capture group 1 is always the ISO date; the ladder is ordered.
PUBDATE_META_RX = 'article:published_time" content="(\\d{4}-\\d{2}-\\d{2})'
PUBDATE_TIME_RX = '<time datetime="(\\d{4}-\\d{2}-\\d{2})'
PUBDATE_BODY_RX = '[Pp]ublished on (\\d{4}-\\d{2}-\\d{2})'


def publish_dates(pages: DataFrame, col: str = "page") -> DataFrame:
    """(url, <col> string) → (url, pub_date, date_tier).

    ``pub_date`` is the first tier that matches (meta > time > body),
    NULL when none does; ``date_tier`` names the winning tier so a
    corpus run can report how much of its date coverage rests on weak
    prose matches.  All three probes are one regexp_extract each —
    map-only, no shuffle, no Python."""
    import pyspark.sql.functions as F

    s = F.col(col)

    def _hit(rx: str):
        v = F.regexp_extract(s, rx, 1)
        return F.when(v != "", v)

    meta, time_, body = (
        _hit(PUBDATE_META_RX), _hit(PUBDATE_TIME_RX), _hit(PUBDATE_BODY_RX)
    )
    return pages.select(
        "url",
        F.coalesce(meta, time_, body).alias("pub_date"),
        F.when(meta.isNotNull(), F.lit("meta"))
        .when(time_.isNotNull(), F.lit("time"))
        .when(body.isNotNull(), F.lit("body"))
        .otherwise(F.lit("none"))
        .alias("date_tier"),
    )


def harvest_publish_dates(pages: DataFrame) -> DataFrame:
    """pages(url, html binary) → (url, pub_date, date_tier).

    The production twin of the oracled `publish_date_extract` catalog
    query: decode each page with the SAME charset tiers as extraction
    (``decode_html`` — BOM sniff → UTF-8 strict → declared charset →
    fallbacks), then walk the :func:`publish_dates` ladder.  The
    decode is Arrow-batched map-only Python (the one pass that must
    touch bytes); the ladder itself stays JVM column algebra, and the
    html payload dies at the decode boundary — downstream sees only
    (url, date, tier)."""
    import pandas as pd  # noqa: F401 (worker-side)

    def _batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "page": [
                        decode_html(h) for h in pdf["html"].to_numpy()
                    ],
                }
            )

    decoded = pages.select("url", "html").mapInPandas(
        _batches, schema="url string, page string"
    )
    return publish_dates(decoded)


#: title-suffix separators sites use before their brand name —
#: " | Site", " - Site", " – Site", " — Site"; greedy ^.* pins the
#: capture to the LAST separator (Java and RE2 agree).
TITLE_SUFFIX_RX = "^.*\\s[|\\-–—]\\s(.+)$"


def title_suffix_ledger(titled: DataFrame) -> DataFrame:
    """(host, title) → per-host elected title suffix — the brand tail
    sites append after a separator (``Article Name | Example Times``).
    A suffix is BOILERPLATE when the same tail dominates the host
    (share ≥ 500 per-mille over ≥ 3 titled pages): strip it and titles
    become the per-page signal search snippets and dedup features
    want; keep it and every page on the host shares spurious title
    tokens.  The trafilatura-style metadata-cleaning twin of the
    body-side boilerplate scope audit.

    Election discipline: candidate = regexp capture after the LAST
    separator (map-only JVM); per-(host, suffix) counts with map-side
    partials; winner = MIN over the (-n, suffix) struct per host (the
    `top_anchor_text` two-level aggregate — window-free, so at 10^12
    pages the shuffles carry (host, suffix) pairs and the final ledger
    is |hosts| rows)."""
    import pyspark.sql.functions as F

    cand = F.regexp_extract(F.col("title"), TITLE_SUFFIX_RX, 1)
    t = titled.select(
        "host",
        F.when(cand != "", cand).alias("suffix"),
    )
    per_host = t.groupBy("host").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_titles")
    )
    counted = (
        t.filter(F.col("suffix").isNotNull())
        .groupBy("host", "suffix")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    elected = counted.groupBy("host").agg(
        F.min(
            F.struct((-F.col("n")).alias("negn"), "suffix")
        ).alias("_top")
    ).select(
        "host",
        F.col("_top.suffix").alias("suffix"),
        (-F.col("_top.negn")).cast("bigint").alias("n_suffix"),
    )
    return (
        per_host.join(elected, "host", "left")
        .select(
            "host",
            "n_titles",
            "suffix",
            F.coalesce("n_suffix", F.lit(0)).cast("bigint").alias(
                "n_suffix"
            ),
            F.expr("1000 * coalesce(n_suffix, 0) div n_titles")
            .cast("bigint")
            .alias("share_pm"),
        )
        .withColumn(
            "is_boiler",
            (F.col("share_pm") >= 500) & (F.col("n_suffix") >= 3),
        )
    )
