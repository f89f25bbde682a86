"""crawl_audit stages: the production twins of the catalog's
sitemap_coverage / url_trap_audit queries, over REAL url tables
(VERDICT r4 item 5) — correctness of the coverage/trap accounting AND
the scan realism the synthesized catalog queries can't exercise: a
filter on the url column must reach the parquet scan (PushedFilters)
with the read schema pruned to the url column."""

from __future__ import annotations

import pyspark.sql.functions as F

from clara_ocr_spark.stages.crawl_audit import (
    sitemap_coverage_urls,
    url_trap_audit_urls,
)


def _crawled_rows():
    # a.example: pages p0..p5 crawled; sitemap declares p3..p9
    #   -> both 3..5 (3), crawl-only 0..2 (3), sitemap-only 6..9 (4)
    # b.example: crawled p0..p1, nothing declared -> crawl-only 2
    rows = [(f"https://a.example/p{i}",) for i in range(6)]
    rows += [(f"https://b.example/p{i}",) for i in range(2)]
    # recrawl duplicates must not double-count
    rows += [("https://a.example/p0",)]
    return rows


def _declared_rows():
    return [(f"https://a.example/p{i}",) for i in range(3, 10)]


def test_sitemap_coverage_urls_accounting(spark):
    crawled = spark.createDataFrame(_crawled_rows(), "url string")
    declared = spark.createDataFrame(_declared_rows(), "loc string")
    got = {r["host"]: r for r in
           sitemap_coverage_urls(crawled, declared).collect()}
    a = got["a.example"]
    assert (a["n_declared"], a["n_crawled"], a["n_both"],
            a["n_sitemap_only"], a["n_crawl_only"]) == (7, 6, 3, 4, 3)
    b = got["b.example"]
    assert (b["n_declared"], b["n_crawled"], b["n_both"],
            b["n_sitemap_only"], b["n_crawl_only"]) == (0, 2, 0, 0, 2)


def test_url_trap_audit_urls_accounting(spark):
    # trap host: one clean path under 5 session ids; healthy host:
    # 4 distinct clean paths, one with a single param variant
    rows = [(f"https://trap.example/page?sid={i}",) for i in range(5)]
    rows += [(f"https://ok.example/p{i}",) for i in range(4)]
    rows += [("https://ok.example/p0?ref=x",)]
    urls = spark.createDataFrame(rows, "url string")
    got = {r["host"]: r for r in url_trap_audit_urls(urls).collect()}
    t = got["trap.example"]
    assert (t["n_urls"], t["n_clean"], t["n_param_variants"],
            t["trap_pm"]) == (5, 1, 4, 800)
    ok = got["ok.example"]
    assert (ok["n_urls"], ok["n_clean"], ok["n_param_variants"],
            ok["trap_pm"]) == (5, 4, 1, 200)


def test_url_trap_audit_schemeless_root_path_trap(spark):
    """CDX-style scheme-less captures with NO path slash ('h3?sid=1'):
    the _host fallback must strip the query/fragment before taking the
    first '/'-segment, else every parameter variant mints its own
    "host" with n_urls=1 and the trap host scores a perfect
    trap_pm=0 — the exact host the audit exists to catch (review
    finding r5)."""
    rows = [(f"h3?sid={i}",) for i in range(4)]
    rows += [("h4/p1",), ("h4/p2",), ("h5#frag",), ("h5",)]
    urls = spark.createDataFrame(rows, "url string")
    got = {r["host"]: r for r in url_trap_audit_urls(urls).collect()}
    t = got["h3"]
    assert (t["n_urls"], t["n_clean"], t["trap_pm"]) == (4, 1, 750)
    assert got["h4"]["n_urls"] == 2 and got["h4"]["trap_pm"] == 0
    assert got["h5"]["n_urls"] == 2  # fragment variant groups with bare


def test_url_scan_pushes_filter_and_prunes_columns(spark, tmp_path):
    """The whole point of the real-url twins: a host-prefix predicate
    on a parquet url table must reach the scan as a pushed filter,
    and the scan must read ONLY the url column even though the table
    carries a fat payload column (the catalog queries, synthesizing
    urls from ids, can never exercise this)."""
    src = spark.createDataFrame(
        [(f"https://h{i % 4}.example/p{i}?sid={i}", "x" * 64, i)
         for i in range(64)],
        "url string, payload string, fetch_ms bigint",
    )
    path = str(tmp_path / "urls.parquet")
    src.write.parquet(path)
    urls = spark.read.parquet(path).filter(
        F.col("url").startswith("https://h1.example/")
    )
    for df in (
        url_trap_audit_urls(urls),
        sitemap_coverage_urls(
            urls, spark.createDataFrame([], "loc string")
        ),
    ):
        rows = df.collect()
        assert {r["host"] for r in rows} == {"h1.example"}
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [IsNotNull(url), " \
               "StringStartsWith(url,https://h1.example/)" in plan
        # column pruning: the 64-byte payload never leaves the scan
        scan = plan[plan.index("ReadSchema"):]
        line = scan.splitlines()[0]
        assert "url" in line and "payload" not in line
    # and the trap accounting is right on the filtered slice:
    # h1 pages p1,p5,...,p61 each unique-by-sid -> 16 urls, 16 clean
    t = url_trap_audit_urls(urls).collect()[0]
    assert (t["n_urls"], t["n_clean"], t["trap_pm"]) == (16, 16, 0)


def test_coverage_composes_with_sitemap_source(spark):
    """The real composition the --coverage job flag runs: declared
    urls come from read_sitemaps output (loc column), crawled from a
    pages-shaped frame.  (The spark-submit surface itself is covered
    by test_job.py's single job run with --coverage/--trap-audit.)"""
    from clara_ocr_spark.sources.sitemap import read_sitemaps

    locs = [f"https://a.example/p{i}" for i in range(3, 10)]
    body = (
        '<?xml version="1.0"?><urlset>'
        + "".join(f"<url><loc>{u}</loc></url>" for u in locs)
        + "</urlset>"
    ).encode()
    sm = spark.createDataFrame(
        [("https://a.example/sitemap.xml", bytearray(body))],
        "url string, payload binary",
    )
    crawled = spark.createDataFrame(_crawled_rows(), "url string")
    declared = read_sitemaps(sm).filter(~F.col("is_index"))
    got = {r["host"]: r for r in
           sitemap_coverage_urls(crawled, declared).collect()}
    a = got["a.example"]
    assert (a["n_declared"], a["n_crawled"], a["n_both"],
            a["n_sitemap_only"], a["n_crawl_only"]) == (7, 6, 3, 4, 3)


def test_soft404_text_tier(spark):
    from clara_ocr_spark.stages.crawl_audit import soft404_audit

    long_quote = (
        "an article about web archaeology " * 80
        + "which quotes the phrase page not found in passing"
    )
    docs = spark.createDataFrame(
        [
            # short stock error page -> flagged
            ("https://dead.example/a", "Error 404 — page not found."),
            ("https://dead.example/b", "Página não encontrada."),
            # healthy page
            ("https://dead.example/c", "real content with many words"),
            # LONG page merely quoting the phrase -> NOT flagged
            ("https://press.example/a", long_quote),
            ("https://press.example/b", "normal article text"),
            # NULL text is not a soft-404
            ("https://press.example/c", None),
        ],
        "url string, text string",
    )
    led = {r["host"]: r for r in soft404_audit(docs).collect()}
    assert (led["dead.example"]["n_soft404"],
            led["dead.example"]["soft404_pm"]) == (2, 666)
    assert led["press.example"]["n_soft404"] == 0
    assert led["press.example"]["n_pages"] == 3


def test_soft404_unicode_case_fold(spark):
    """Capitalized NON-ASCII error phrases must be flagged — and
    identically by the DuckDB oracle dialect.  Java's inline ``(?i)``
    folds ASCII only while RE2's folds Unicode, so the markers match
    ``lower(text)`` instead of relying on the flag (review finding
    r5); this pins both the production behavior and the cross-engine
    agreement that the driver's soft404_ledger parity depends on."""
    import duckdb

    from clara_ocr_spark.stages.crawl_audit import (
        SOFT404_MARKERS,
        soft404_audit,
    )

    cases = [
        ("https://ru.example/a", "Страница не найдена"),      # capital С
        ("https://pt.example/a", "PÁGINA NÃO ENCONTRADA"),    # all caps
        ("https://de.example/a", "Seite nicht gefunden"),
        ("https://ru.example/b", "обычная статья про котов"),  # healthy
    ]
    docs = spark.createDataFrame(cases, "url string, text string")
    led = {r["host"]: r for r in soft404_audit(docs).collect()}
    assert led["ru.example"]["n_soft404"] == 1
    assert led["pt.example"]["n_soft404"] == 1
    assert led["de.example"]["n_soft404"] == 1

    # cross-engine agreement on every case, marker-for-marker
    con = duckdb.connect()
    for _url, text in cases:
        want = bool(
            con.execute(
                "select regexp_matches(lower($1), $2)",
                [text, SOFT404_MARKERS],
            ).fetchone()[0]
        )
        got = (
            docs.filter(F.col("text") == text)
            .select(
                F.lower(F.col("text")).rlike(SOFT404_MARKERS).alias("m")
            )
            .collect()[0]["m"]
        )
        assert got == want, text


def test_soft404_title_tier(spark):
    from clara_ocr_spark.stages.crawl_audit import soft404_audit

    docs = spark.createDataFrame(
        [("https://sly.example/a", "x " * 1500),  # long body, no marker
         ("https://sly.example/b", "fine content")],
        "url string, text string",
    )
    meta = spark.createDataFrame(
        [("https://sly.example/a", "404 Not Found")],
        "url string, title string",
    )
    # text tier alone sees nothing; the title betrays the error page
    assert soft404_audit(docs).collect()[0]["n_soft404"] == 0
    led = soft404_audit(docs, meta).collect()[0]
    assert (led["n_soft404"], led["soft404_pm"]) == (1, 500)


def test_sitemap_staleness(spark):
    """lastmod-driven recrawl: newest declaration vs latest capture,
    date-only and full-ISO lastmod forms, unparseable lastmod counted
    but never stale, undeclared/unfetched urls excluded."""
    import datetime as dt

    from clara_ocr_spark.stages.crawl_audit import sitemap_staleness_urls

    t = dt.datetime(2024, 6, 1, 12, 0, 0)
    crawled = spark.createDataFrame(
        [
            ("https://s.example/fresh", t),
            ("https://s.example/fresh", t - dt.timedelta(days=9)),  # recrawl
            ("https://s.example/stale", t),
            ("https://s.example/dateonly", t),
            ("https://s.example/undated", t),
            ("https://s.example/badmod", t),
            ("https://s.example/notdeclared", t),
        ],
        "url string, warc_ts timestamp",
    )
    declared = spark.createDataFrame(
        [
            # two declarations; the NEWER one wins but is still older
            # than the fetch -> fresh
            ("https://s.example/fresh", "2024-05-30T00:00:00Z"),
            ("https://s.example/fresh", "2024-04-01"),
            # publisher updated after our fetch -> stale
            ("https://s.example/stale", "2024-06-02T08:30:00+00:00"),
            # date-only form, after the fetch date -> stale
            ("https://s.example/dateonly", "2024-06-03"),
            ("https://s.example/undated", None),
            ("https://s.example/badmod", "not-a-date"),
            ("https://s.example/neverfetched", "2024-06-05"),
        ],
        "loc string, lastmod string",
    )
    led = sitemap_staleness_urls(crawled, declared).collect()
    assert len(led) == 1
    r = led[0]
    assert r["host"] == "s.example"
    assert r["n_matched"] == 5  # notdeclared/neverfetched excluded
    assert r["n_dated"] == 3  # fresh, stale, dateonly
    assert r["n_stale"] == 2  # stale + dateonly
    assert r["stale_pm"] == 400


def test_soft404_schemeless_hosts(spark):
    """CDX-style scheme-less urls group under their real host, not ''
    (review finding r5 — the _host fallback the other ledgers use)."""
    from clara_ocr_spark.stages.crawl_audit import soft404_audit

    docs = spark.createDataFrame(
        [("h3/p1", "Error 404 - page not found"),
         ("h3/p2", "fine content here"),
         ("HTTPS://up.example/p", "also fine")],
        "url string, text string",
    )
    led = {r["host"]: r for r in soft404_audit(docs).collect()}
    assert led["h3"]["n_pages"] == 2 and led["h3"]["n_soft404"] == 1
    assert "" not in led


def test_host_protocol_relative_and_fragment_traps(spark):
    """Review findings r5: protocol-relative urls keep their real host
    (not ''), path-only urls keep '' (they truly have none), and a
    fragment-variant trap scores like a query-variant trap."""
    from clara_ocr_spark.stages.crawl_audit import url_trap_audit_urls

    urls = spark.createDataFrame(
        [("//evil.example/p1",), ("//evil.example/p2",),
         ("/just-a-path",),
         ("h5#s1",), ("h5#s2",), ("h5#s3",)],
        "url string",
    )
    led = {r["host"]: r for r in url_trap_audit_urls(urls).collect()}
    assert led["evil.example"]["n_urls"] == 2
    assert led["evil.example"]["n_param_variants"] == 0
    # the fragment trap: 3 urls, ONE clean form -> 2 variants, 666 pm
    assert led["h5"]["n_urls"] == 3
    assert led["h5"]["n_param_variants"] == 2
    assert led["h5"]["trap_pm"] == 666
    assert led[""]["n_urls"] == 1  # the path-only row


def test_host_malformed_and_underscore_urls(spark):
    """Review findings r5: ANSI-default Spark 4 must not abort the
    ledgers on malformed urls (try_parse_url, not parse_url), and a
    scheme-ful url whose authority java.net.URI rejects (underscore
    hostname: getHost() is null) must fall back to its REAL host —
    never the literal 'http:' the bare first-'/'-segment split reads."""
    import pyspark.sql.functions as F

    from clara_ocr_spark.stages.crawl_audit import _host

    df = spark.createDataFrame(
        [("http://foo_bar.com/x",),   # URI-parseable, host rejected
         ("http://h.com/a b",),       # malformed: raw space
         ("HTTP://Up.Example/y",)],   # uppercase scheme
        "url string",
    )
    got = {r["url"]: r["h"] for r in df.select(
        "url", _host(F.col("url")).alias("h")).collect()}
    assert got["http://foo_bar.com/x"] == "foo_bar.com"
    assert got["http://h.com/a b"] == "h.com"
    assert got["HTTP://Up.Example/y"] == "Up.Example"


def test_ledgers_merge_host_case_variants(spark):
    """Review finding r5: DNS names are case-insensitive, and sitemap
    vs crawl sources routinely disagree on case — the ledgers must
    group 'Example.com' and 'example.com' as ONE host (via the shared
    norm_host), not report a phantom coverage gap per case variant."""
    from clara_ocr_spark.stages.crawl_audit import sitemap_coverage_urls

    cov = sitemap_coverage_urls(
        spark.createDataFrame([("http://Example.com/a",)], "url string"),
        spark.createDataFrame([("http://example.com/b",)], "loc string"),
    )
    rows = cov.collect()
    assert len(rows) == 1 and rows[0]["host"] == "example.com"
    assert rows[0]["n_crawled"] == 1 and rows[0]["n_declared"] == 1


def test_revisit_schedule_differential_random_histories(spark):
    """Seeded random capture histories vs a pure-Python oracle: exact
    equality of every per-url row (counts, milli-nat rate, tier,
    revisit hours) including all-change, no-change and single-capture
    urls the generator is guaranteed to produce."""
    import math
    import random

    from clara_ocr_spark.stages.crawl_audit import revisit_schedule

    rng = random.Random(20260819)
    rows = []
    histories = {}
    for u in range(50):
        url = "u%02d" % u
        n_caps = rng.choice([1, 2, 4, 6, 9])
        digs = []
        cur = 0
        for seq in range(n_caps):
            if seq and rng.random() < rng.choice([0.0, 0.3, 1.0]):
                cur += 1
            digs.append("d%d" % cur)
            rows.append((url, seq, digs[-1]))
        histories[url] = digs

    expect = {}
    for url, digs in histories.items():
        n = len(digs) - 1
        x = sum(1 for a, b in zip(digs, digs[1:]) if a != b)
        lam = round(-math.log((n - x + 0.5) / (n + 0.5)) * 1000)
        tier = "hot" if lam >= 900 else "warm" if lam >= 400 else "cold"
        rh = 24000 // lam if lam > 0 else 8760
        expect[url] = (n, x, lam, tier, rh)

    df = spark.createDataFrame(rows, "url string, seq int, digest string")
    got = {
        r["url"]: (
            r["n_cmp"],
            r["n_chg"],
            r["lambda_mnat"],
            r["tier"],
            r["revisit_h"],
        )
        for r in revisit_schedule(df).collect()
    }
    assert got == expect
