"""Head-metadata harvest stage: parser edge cases (first-wins, head
termination, corrupt input) and the Spark stage over the synthetic
corpus."""

from __future__ import annotations

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from clara_ocr_spark.sources.corpus import PAGES_SCHEMA, gen_page
from clara_ocr_spark.stages.metadata import harvest_metadata, parse_head_meta


def test_parse_head_meta_full_head():
    html = b"""<!DOCTYPE html><html><head>
      <meta charset="utf-8">
      <title> The &amp; Title </title>
      <meta name="Description" content="a summary">
      <meta property="og:title" content="OG Title">
      <meta property="og:image" content="https://x/img.png">
      <link rel="canonical" href="https://host.example/canon">
    </head><body><p>body</p></body></html>"""
    title, desc, canon, og_title, n_meta, n_og = parse_head_meta(html)
    assert title == "The & Title"  # entities resolved, ws-normalized
    assert desc == "a summary"  # attr name case-insensitive
    assert canon == "https://host.example/canon"
    assert og_title == "OG Title"
    assert n_meta == 4 and n_og == 2


def test_parse_head_meta_first_wins_and_no_head():
    html = b"""<head><title>first</title><title>second</title>
      <meta name="description" content="d1">
      <meta name="description" content="d2">
      <link rel="canonical" href="/c1"><link rel="canonical" href="/c2">
    </head>"""
    title, desc, canon, _, n_meta, _ = parse_head_meta(html)
    assert (title, desc, canon) == ("first", "d1", "/c1")
    assert n_meta == 2  # both metas counted, first content kept
    # no head at all → all NULL, zero counts
    assert parse_head_meta(b"<p>just body</p>") == (
        None, None, None, None, 0, 0,
    )


def test_parse_head_meta_stops_at_body_content():
    # unclosed <head> (common crawl HTML): the first body-only tag
    # terminates the harvest, so a body <title>/<meta> is ignored
    html = (
        b"<head><title>real</title>"
        b"<p>body starts here"
        b'<meta name="description" content="too late">'
    )
    title, desc, _, _, n_meta, _ = parse_head_meta(html)
    assert title == "real" and desc is None and n_meta == 0
    # title still open when the body starts → flushed, not lost
    html2 = b"<head><title>cut <div>off"
    assert parse_head_meta(html2)[0] == "cut"


def test_parse_head_meta_corrupt_input_contract():
    assert parse_head_meta(None) == (None, None, None, None, 0, 0)
    assert parse_head_meta(b"") == (None, None, None, None, 0, 0)
    assert parse_head_meta(b"\xff\x00<<<>>&&")[0] is None  # never raises


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=400))
def test_parse_head_meta_never_crashes(raw):
    out = parse_head_meta(raw)
    assert len(out) == 6 and isinstance(out[4], int)


def test_wat_sidecar_compose(spark):
    import json

    from clara_ocr_spark.sources.formats import wat_sidecar
    from clara_ocr_spark.stages.links import extract_links

    rows = [gen_page(i, seed=37) for i in range(40)]
    # one page with no links and no head: still gets a sidecar row
    bare = dict(rows[0])
    bare["url"] = "https://bare.example/p"
    bare["html"] = b"<p>no head no links</p>"
    rows.append(bare)
    pages = spark.createDataFrame(
        pa.Table.from_pylist(rows, schema=PAGES_SCHEMA).to_pandas()
    )
    wat = wat_sidecar(
        pages, extract_links(pages), harvest_metadata(pages)
    ).collect()
    assert len(wat) == 41  # full coverage, left joins
    by_url = {r["url"]: json.loads(r["wat"]) for r in wat}
    b = by_url["https://bare.example/p"]
    assert b["outlinks"] == [] and b["head"]["n_meta"] == 0
    linked = [w for w in by_url.values() if w["outlinks"]]
    assert linked  # nav/linkfarm templates emit plenty
    for w in linked[:5]:
        ls = [(o["u"], o["a"]) for o in w["outlinks"]]
        assert ls == sorted(ls)  # deterministic sidecar: sorted links
        assert w["head"]["title"] == "t"
    # determinism under repartitioning: same JSON per url
    wat2 = wat_sidecar(
        pages.repartition(7), extract_links(pages.repartition(7)),
        harvest_metadata(pages.repartition(7)),
    ).collect()
    assert {r["url"]: r["wat"] for r in wat2} == {
        r["url"]: r["wat"] for r in wat
    }


def test_wat_sidecar_recrawl_reduces_to_one_record(spark):
    """Two captures of one url must compose to ONE WAT record with the
    latest capture's ts and UNDUPLICATED outlinks (ADVICE r4: the
    unreduced compose emitted one record per capture, each carrying
    both captures' links), and the ts must render UTC."""
    import json

    from clara_ocr_spark.sources.formats import wat_sidecar
    from clara_ocr_spark.stages.links import extract_links

    base = gen_page(3, seed=11)
    first = dict(base)
    second = dict(base)
    second["warc_ts"] = base["warc_ts"].replace(hour=23)
    pages = spark.createDataFrame(
        pa.Table.from_pylist([first, second], schema=PAGES_SCHEMA)
        .to_pandas()
    )
    wat = wat_sidecar(
        pages, extract_links(pages), harvest_metadata(pages)
    ).collect()
    assert len(wat) == 1
    rec = json.loads(wat[0]["wat"])
    assert rec["ts"].startswith(str(base["warc_ts"].date())) and \
        "T23:" in rec["ts"] and rec["ts"].endswith("Z")
    links = [(o["u"], o["a"], o["nf"]) for o in rec["outlinks"]]
    assert links == sorted(set(links))  # no capture doubling
    # single-capture baseline has the identical link set
    solo = json.loads(
        wat_sidecar(
            spark.createDataFrame(
                pa.Table.from_pylist([first], schema=PAGES_SCHEMA)
                .to_pandas()
            ),
            extract_links(
                spark.createDataFrame(
                    pa.Table.from_pylist([first], schema=PAGES_SCHEMA)
                    .to_pandas()
                )
            ),
            harvest_metadata(
                spark.createDataFrame(
                    pa.Table.from_pylist([first], schema=PAGES_SCHEMA)
                    .to_pandas()
                )
            ),
        ).collect()[0]["wat"]
    )
    assert [(o["u"], o["a"]) for o in solo["outlinks"]] == [
        (o["u"], o["a"]) for o in rec["outlinks"]
    ]


def test_harvest_metadata_stage(spark):
    rows = [gen_page(i, seed=31) for i in range(80)]
    pages = spark.createDataFrame(
        pa.Table.from_pylist(rows, schema=PAGES_SCHEMA).to_pandas()
    )
    got = harvest_metadata(pages)
    assert [f.name for f in got.schema.fields] == [
        "url", "title", "description", "canonical", "og_title",
        "n_meta", "n_og",
    ]
    out = got.collect()
    assert len(out) == 80  # one row per page, corrupt or not
    # every corpus template carries <head><title>t</title>…
    assert all(r["title"] == "t" for r in out)
    assert all(r["n_og"] == 0 for r in out)
    # map-only: no Exchange in the plan
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_wet_export_roundtrips_through_own_reader(spark, tmp_path):
    """to_wet_records → .text() → read_pages_warc must round-trip the
    extracted text byte-identically (incl. non-ASCII: Content-Length
    counts utf-8 OCTETS, the framing a char count would corrupt) and
    tolerate WARC-lookalike payloads."""
    import datetime

    from clara_ocr_spark.sources.formats import (
        read_pages_warc,
        to_wet_records,
    )

    ts = datetime.datetime(2024, 5, 1, 12, 0, 0)
    rows = [
        ("https://w.example/a", ts, "plain ascii body"),
        ("https://w.example/b", ts, "café résumé — non-ascii ✓"),
        ("https://w.example/c", ts, ""),
        ("https://w.example/d", ts,
         "hostile body containing WARC/1.0\r\nWARC-Type: response"),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string"
    )
    out = tmp_path / "wet"
    to_wet_records(df).write.text(str(out))
    back = {
        r["url"]: r["text"]
        for r in read_pages_warc(spark, f"{out}/part-*").collect()
    }
    assert back == {u: t for u, t, in
                    ((r[0], r[2]) for r in rows)}
    # WARC/1.0 spec compliance (ADVICE r4): every record must carry a
    # WARC-Record-ID (mandatory per §5.2) and Content-Type — spec-
    # strict WET consumers (warcio) reject records without them.  The
    # id is deterministic (same page → same id on re-export) and
    # unique across pages.
    import glob
    import re as _re

    data = b"".join(
        open(f, "rb").read() for f in sorted(glob.glob(f"{out}/part-*"))
    )
    ids = _re.findall(rb"WARC-Record-ID: <urn:uuid:([0-9a-f-]{36})>", data)
    assert len(ids) == len(rows) == len(set(ids))
    assert data.count(b"Content-Type: text/plain") == len(rows)
    # determinism: a second export emits the identical id set
    out2 = tmp_path / "wet2"
    to_wet_records(df).write.text(str(out2))
    data2 = b"".join(
        open(f, "rb").read() for f in sorted(glob.glob(f"{out2}/part-*"))
    )
    assert sorted(_re.findall(
        rb"WARC-Record-ID: <urn:uuid:([0-9a-f-]{36})>", data2
    )) == sorted(ids)


def test_wet_export_hardening(spark, tmp_path):
    """Review findings: NULL warc_ts/url must not NULL-propagate the
    whole record away; CR/LF in a url cannot truncate the header
    framing; WARC-Date renders UTC under any session tz; and the job's
    per-url max(warc_ts) reduction collapses recrawl captures to ONE
    conversion record."""
    import datetime

    import pyspark.sql.functions as F

    from clara_ocr_spark.sources.formats import (
        _parse_warc_bytes,
        read_pages_warc,
        to_wet_records,
    )

    ts = datetime.datetime(2024, 5, 1, 12, 0, 0)
    df = spark.createDataFrame(
        [
            ("https://h/null-ts", None, "kept body"),
            ("https://h/evil\r\n\r\nWARC/1.0", ts,
             "body with WARC/1.0\r\n lookalike"),
        ],
        "url string, warc_ts timestamp, text string",
    )
    out = tmp_path / "wet_hard"
    to_wet_records(df).write.text(str(out))
    import glob

    data = b"".join(
        open(f, "rb").read() for f in sorted(glob.glob(f"{out}/part-*"))
    )
    recs = list(_parse_warc_bytes(data))
    assert len(recs) == 2  # nothing silently dropped, nothing forged
    by_url = {u: (t, b) for u, t, b, _ in recs}
    assert by_url["https://h/null-ts"][0] == "1970-01-01T00:00:00Z"
    assert by_url["https://h/null-ts"][1] == b"kept body"
    evil = by_url["https://h/evilWARC/1.0"]  # CR/LF stripped from url
    assert evil[1] == "body with WARC/1.0\r\n lookalike".encode()

    # recrawl shape: two captures of one url reduce to one record
    pages = spark.createDataFrame(
        [("https://h/a", ts), ("https://h/a", ts.replace(hour=13))],
        "url string, warc_ts timestamp",
    )
    extracted = spark.createDataFrame(
        [("https://h/a", "body")], "url string, text string"
    )
    ts_by_url = pages.groupBy("url").agg(F.max("warc_ts").alias("warc_ts"))
    rows = to_wet_records(extracted.join(ts_by_url, "url")).collect()
    assert len(rows) == 1
    assert "2024-05-01T13:00:00Z" in rows[0]["value"]  # latest wins


def test_wet_record_ids_unique_per_content(spark):
    """A recrawl export can legitimately emit several records for ONE
    url under one stamped ts (run without the job's per-url
    reduction); their ids must still differ — the id hashes the body
    digest, not just (url, ts) (review finding r5).  Urls differing
    only in stripped CR/LF chars get distinct ids too (the RAW url is
    hashed)."""
    import datetime
    import re as _re

    from clara_ocr_spark.sources.formats import to_wet_records

    ts = datetime.datetime(2024, 5, 1, 12, 0, 0)
    df = spark.createDataFrame(
        [
            ("https://h/a", ts, "capture one"),
            ("https://h/a", ts, "capture two"),
            ("https://h/x\ry", ts, "same body"),
            ("https://h/x\ny", ts, "same body"),
        ],
        "url string, warc_ts timestamp, text string",
    )
    vals = [r["value"] for r in to_wet_records(df).collect()]
    ids = [
        _re.search(r"WARC-Record-ID: <urn:uuid:([0-9a-f-]{36})>", v).group(1)
        for v in vals
    ]
    assert len(set(ids)) == 4


def test_publish_dates_tier_ladder(spark):
    """meta > time > body precedence; none-class → NULL + 'none'."""
    from clara_ocr_spark.stages.metadata import publish_dates

    rows = [
        # meta present AND a conflicting prose byline: meta must win
        ("u1", '<meta property="article:published_time" '
               'content="2024-03-15T08:30:00Z"> Published on 1999-01-01'),
        # time tag only
        ("u2", '<article><time datetime="2023-07-04">x</time></article>'),
        # prose byline only (capitalized and lowercased variants)
        ("u3", "Published on 2022-12-31 by staff"),
        ("u4", "published on 2021-01-02"),
        # no date at all
        ("u5", "plain page, nothing dated, 404 not a date"),
        # a <time> without an ISO date must NOT match the ladder
        ("u6", '<time datetime="yesterday">x</time>'),
    ]
    out = {
        r["url"]: (r["pub_date"], r["date_tier"])
        for r in publish_dates(
            spark.createDataFrame(rows, "url string, page string")
        ).collect()
    }
    assert out["u1"] == ("2024-03-15", "meta")
    assert out["u2"] == ("2023-07-04", "time")
    assert out["u3"] == ("2022-12-31", "body")
    assert out["u4"] == ("2021-01-02", "body")
    assert out["u5"] == (None, "none")
    assert out["u6"] == (None, "none")


def test_harvest_publish_dates_stage(spark):
    """Binary html in, (url, pub_date, date_tier) out — decode tiers
    shared with extraction (a declared-charset latin-1 page must
    still harvest)."""
    from clara_ocr_spark.stages.metadata import harvest_publish_dates

    latin = (
        '<html><head><meta charset="iso-8859-1">'
        '<meta property="article:published_time" '
        'content="2023-11-05T00:00:00Z"></head>'
        "<body><p>ol\xe1</p></body></html>"
    ).encode("latin-1")
    rows = [
        ("u1", latin),
        ("u2", b"<html><body><p>Published on 2020-02-29 x</p></body></html>"),
        ("u3", b"<html><body><p>undated</p></body></html>"),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = {r["url"]: (r["pub_date"], r["date_tier"])
           for r in harvest_publish_dates(df).collect()}
    assert out["u1"] == ("2023-11-05", "meta")
    assert out["u2"] == ("2020-02-29", "body")
    assert out["u3"] == (None, "none")


def test_warc_revisit_dedup_classify_and_export(spark, tmp_path):
    """Storage dedup round-trip: a 3-capture history per url (digest
    repeating once) classifies earliest-per-(url,digest) as response
    and the repeat as revisit with the original's ts; the rendered
    revisit records are header-only (Content-Length: 0), carry the
    mandatory Record-ID, the identical-payload-digest profile, the
    labelled md5 digest and a UTC Refers-To-Date; and this repo's own
    WARC reader skips them without misparsing neighbors — a mixed
    file of WET conversions + revisit pointers reads back exactly the
    conversion set.  Classification is two (url, digest)-keyed
    Exchanges (aggregate build + probe co-partition; the join adds
    none)."""
    import datetime
    import glob
    import re as _re

    import pyspark.sql.functions as F

    from clara_ocr_spark.sources.formats import (
        read_pages_warc,
        to_warc_revisit_records,
        to_wet_records,
        warc_dedup_classify,
    )

    def ts(h):
        return datetime.datetime(2024, 3, 1, h, 0, 0)

    caps = spark.createDataFrame(
        [
            ("https://r.example/a", ts(1), "d1"),
            ("https://r.example/a", ts(2), "d1"),   # revisit of 01:00
            ("https://r.example/a", ts(3), "d2"),   # changed -> response
            ("https://r.example/b", ts(4), "d9"),
            # NULL digest (e.g. md5 of a NULL payload): no dedup key,
            # must classify response — an inner join would DROP it
            ("https://r.example/nul", ts(5), None),
        ],
        "url string, warc_ts timestamp, digest string",
    )
    cl = warc_dedup_classify(caps)
    plan = cl._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2, plan[:3000]
    got = {
        (r["url"], r["warc_ts"].hour): (r["wtype"], r["refers_to_ts"])
        for r in cl.collect()
    }
    assert got[("https://r.example/a", 1)] == ("response", None)
    assert got[("https://r.example/a", 2)][0] == "revisit"
    assert got[("https://r.example/a", 2)][1].hour == 1
    assert got[("https://r.example/a", 3)] == ("response", None)
    assert got[("https://r.example/b", 4)] == ("response", None)
    assert got[("https://r.example/nul", 5)] == ("response", None)

    # export: conversions for the responses + pointers for the rest,
    # one mixed file; the reader must surface exactly the conversions
    resp = cl.filter(
        (cl.wtype == "response") & cl.digest.isNotNull()
    ).select("url", "warc_ts", F.lit("body text").alias("text"))
    out = tmp_path / "mixed"
    to_wet_records(resp).unionAll(
        to_warc_revisit_records(cl)
    ).coalesce(1).write.text(str(out))
    back = read_pages_warc(spark, f"{out}/part-*").collect()
    assert len(back) == 3 and all(r["text"] == "body text" for r in back)
    data = b"".join(
        open(f, "rb").read() for f in sorted(glob.glob(f"{out}/part-*"))
    )
    assert data.count(b"WARC-Type: revisit") == 1
    # version + framing: revisit records declare WARC/1.1 (the
    # Refers-To-Date / profile-URI vocabulary) and terminate with the
    # full header-block CRLF + two record CRLFs
    assert data.count(b"WARC/1.1\r\nWARC-Type: revisit") == 1
    assert data.count(b"Content-Length: 0\r\n\r\n\r\n\r\n") == 1
    assert (
        data.count(
            b"WARC-Profile: http://netpreserve.org/warc/1.1/revisit/"
            b"identical-payload-digest"
        )
        == 1
    )
    assert data.count(b"WARC-Payload-Digest: md5:d1") == 1
    assert b"WARC-Refers-To-Date: 2024-03-01T01:00:00Z" in data
    rev_ids = _re.findall(
        rb"WARC-Type: revisit\r\nWARC-Record-ID: <urn:uuid:"
        rb"([0-9a-f-]{36})>",
        data,
    )
    assert len(rev_ids) == 1


def test_parse_warc_bytes_corrupt_gzip_salvages_prefix():
    """A .warc.gz with a corrupt member after valid ones must yield
    the valid members' records, and pure garbage behind the gzip magic
    must yield [] — never raise (the sitemap parser's corrupt-gzip
    contract; zlib.error escapes OSError handlers)."""
    import datetime
    import gzip as _gzip

    from clara_ocr_spark.sources.formats import _parse_warc_bytes

    rec = (
        b"WARC/1.0\r\nWARC-Type: conversion\r\n"
        b"WARC-Target-URI: https://g.example/a\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        b"Content-Length: 4\r\n\r\nbody\r\n\r\n"
    )
    good = _gzip.compress(rec)
    assert [u for u, *_ in _parse_warc_bytes(good + b"\x1f\x8bXX")] == [
        "https://g.example/a"
    ]
    assert list(_parse_warc_bytes(b"\x1f\x8bXX")) == []
    assert list(_parse_warc_bytes(b"\x1f\x8b\x08\x00garbage")) == []


def test_parse_warc_bytes_hostile_headers_and_versions():
    """Non-UTF-8 header bytes, malformed/negative Content-Length and
    lookalike version lines (WARC/1.5) must never raise; WARC/1.1
    records (the revisit composer's version) parse like 1.0 ones."""
    from clara_ocr_spark.sources.formats import _parse_warc_bytes

    assert list(_parse_warc_bytes(b"WARC/1.0\r\n\xff\xfe\r\n\r\n")) == []
    assert (
        list(_parse_warc_bytes(b"WARC/1.0\r\nContent-Length: xyz\r\n\r\n"))
        == []
    )
    assert (
        list(
            _parse_warc_bytes(b"WARC/1.0\r\nContent-Length: -5\r\n\r\nabc")
        )
        == []
    )
    rec11 = (
        b"WARC/1.1\r\nWARC-Type: conversion\r\n"
        b"WARC-Target-URI: https://v.example/a\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        b"Content-Length: 2\r\n\r\nhi\r\n\r\n"
    )
    assert [u for u, *_ in _parse_warc_bytes(rec11)] == [
        "https://v.example/a"
    ]
    assert list(_parse_warc_bytes(b"WARC/1.5\r\nnope\r\n\r\n" + rec11))


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=600))
def test_parse_warc_bytes_never_crashes(raw):
    """Arbitrary bytes — raw, behind a gzip magic, and behind a valid
    record — always parse to a list of 4-tuples, never raise."""
    for payload in (raw, b"\x1f\x8b" + raw, b"WARC/1.0\r\n" + raw):
        from clara_ocr_spark.sources.formats import _parse_warc_bytes

        out = list(_parse_warc_bytes(payload))
        assert all(len(t) == 4 for t in out)
