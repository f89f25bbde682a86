"""Registered-domain (public-suffix) resolution — PSL semantics.

Expectations follow the published publicsuffix.org algorithm and its
test vectors (checkPublicSuffix cases), restricted to the rule kinds
in the built-in list: literal, wildcard (*.ck), exception (!www.ck),
private-registry entries, implicit-* fallback, and the
host-IS-a-suffix NULL case.
"""

from __future__ import annotations

import pytest

from clara_ocr_spark.stages.domains import (
    DEFAULT_RULES,
    registered_domain_map,
    rules_df,
    with_registered_domain,
)

# (host, expected registered domain or None) — the PSL's own test
# vector shapes for these rule kinds
CASES = [
    ("example.com", "example.com"),
    ("www.example.com", "example.com"),
    ("a.b.example.co.uk", "example.co.uk"),
    ("example.co.uk", "example.co.uk"),
    ("co.uk", None),                      # host IS a public suffix
    ("uk", None),
    ("com", None),
    ("github.io", None),                  # private-registry suffix
    ("user.github.io", "user.github.io"),
    ("pages.user.github.io", "user.github.io"),
    ("someblog.blogspot.com", "someblog.blogspot.com"),
    ("www.someblog.blogspot.com", "someblog.blogspot.com"),
    # wildcard *.ck: foo.ck is a suffix, bar.foo.ck registers
    ("foo.ck", None),
    ("bar.foo.ck", "bar.foo.ck"),
    ("baz.bar.foo.ck", "bar.foo.ck"),
    # exception !www.ck beats the wildcard
    ("www.ck", "www.ck"),
    ("sub.www.ck", "www.ck"),
    # implicit-* fallback for unlisted TLDs
    ("example.unlisted", "example.unlisted"),
    ("a.example.unlisted", "example.unlisted"),
    ("unlisted", None),
    # case-insensitive
    ("WWW.Example.COM", "example.com"),
    ("", None),
]


@pytest.fixture(scope="module")
def resolved(spark):
    hosts = spark.createDataFrame(
        [(h,) for h, _ in CASES], "host string"
    )
    rules = rules_df(spark)
    rows = registered_domain_map(hosts, rules).collect()
    return {r["host"]: r["reg_domain"] for r in rows}


def test_psl_vectors(resolved):
    for host, want in CASES:
        key = host.lower()
        assert resolved[key] == want, (host, resolved[key], want)


def test_map_is_one_row_per_host(resolved):
    assert len(resolved) == len({h.lower() for h, _ in CASES})


def test_rules_parse_kinds(spark):
    rows = {r["key"]: (r["eff_labels"], r["exc"])
            for r in rules_df(spark).collect()}
    assert rows["com"] == (1, False)
    assert rows["co.uk"] == (2, False)
    assert rows["ck"] == (2, False)        # *.ck: one extra label
    assert rows["www.ck"] == (1, True)     # !www.ck: one fewer
    assert len(rows) == len(DEFAULT_RULES)


def test_comments_and_blanks_ignored(spark):
    rules = rules_df(spark, ["// comment", "", "com", "  co.uk  "])
    assert rules.count() == 2


def test_with_registered_domain_preserves_rows(spark):
    hosts = spark.createDataFrame(
        [("www.example.com", 1), ("www.Example.com", 2), ("co.uk", 3)],
        "host string, payload int",
    )
    out = with_registered_domain(hosts, rules_df(spark)).collect()
    assert len(out) == 3  # one output row per input row, not per host
    got = {(r["payload"], r["reg_domain"]) for r in out}
    assert got == {(1, "example.com"), (2, "example.com"), (3, None)}


def test_map_plan_shape(spark):
    """The rule lookup is a broadcast join and the election reuses the
    distinct's host partitioning: exactly ONE Exchange in the whole
    map plan, and it is keyed on host."""
    hosts = spark.createDataFrame([("www.example.com",)], "host string")
    plan = registered_domain_map(hosts, rules_df(spark))._jdf\
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan


def test_domain_mixture_psl_keying(spark):
    """With reg_rules, the mixture merges host aliases of one
    registered domain (www.example.com + example.com) and keeps
    private-registry subdomains apart (each *.blogspot.com blog is its
    own publisher)."""
    from clara_ocr_spark.curate import domain_mixture

    rows = []
    for i, host in enumerate(
        ["www.example.com", "example.com",
         "alice.blogspot.com", "bob.blogspot.com"]
    ):
        for k in range(i + 1):
            rows.append((f"https://{host}/p{k}", "text", 10))
    df = spark.createDataFrame(
        rows, "url string, text string, n_tokens int"
    )
    raw = {r["host"]: r["n_docs"]
           for r in domain_mixture(df).collect()}
    assert raw == {"www.example.com": 1, "example.com": 2,
                   "alice.blogspot.com": 3, "bob.blogspot.com": 4}
    psl = {r["host"]: r["n_docs"]
           for r in domain_mixture(df, reg_rules=rules_df(spark)).collect()}
    assert psl == {"example.com": 3,
                   "alice.blogspot.com": 3, "bob.blogspot.com": 4}


def test_authority_cleanup_and_ips(spark):
    """Ports and userinfo are stripped before resolution (a port-
    bearing host must key as its real site, not a bogus 'tld:port'
    eTLD+1 merging distinct publishers); IP literals have no
    registered domain under PSL semantics (review findings r5)."""
    hosts = spark.createDataFrame(
        [("a.blogspot.com:8080",), ("b.blogspot.com:8080",),
         ("user@www.example.com",), ("192.168.0.1",),
         ("10.0.0.1:8443",), ("[2001:db8::1]",)],
        "host string",
    )
    got = {r["host"]: r["reg_domain"]
           for r in registered_domain_map(hosts, rules_df(spark)).collect()}
    assert got["a.blogspot.com:8080"] == "a.blogspot.com"
    assert got["b.blogspot.com:8080"] == "b.blogspot.com"
    assert got["user@www.example.com"] == "example.com"
    assert got["192.168.0.1"] is None
    assert got["10.0.0.1:8443"] is None
    assert got["[2001:db8::1]"] is None


def test_idn_rules_punycode_normalized(spark):
    """The published PSL stores IDN suffixes as Unicode; crawl hosts
    arrive ACE-encoded — rules must be punycode-normalized at parse
    time or multi-label IDN suffixes never match (review finding
    r5).  公司.cn encodes to xn--55qx5d.cn."""
    rules = rules_df(spark, ["cn", "公司.cn"])
    hosts = spark.createDataFrame(
        [("foo.xn--55qx5d.cn",), ("bar.foo.xn--55qx5d.cn",)],
        "host string",
    )
    got = {r["host"]: r["reg_domain"]
           for r in registered_domain_map(hosts, rules).collect()}
    # the 2-label IDN suffix matches, so foo registers under it —
    # without ACE normalization only 'cn' would match and every
    # registrant under the IDN registry would merge into one key
    assert got["foo.xn--55qx5d.cn"] == "foo.xn--55qx5d.cn"
    assert got["bar.foo.xn--55qx5d.cn"] == "foo.xn--55qx5d.cn"


def test_registered_domain_fqdn_and_empty_labels(spark):
    """Review finding r5: the FQDN trailing dot is the same DNS zone
    ('example.com.' -> 'example.com', not the garbage 'com.' the
    empty last label used to slice), and hosts with interior empty
    labels are invalid per RFC 1035 -> NULL, never '.com'."""
    rules = rules_df(spark, ["com"])
    hosts = spark.createDataFrame(
        [("example.com.",), ("a..com",), ("example.com",)],
        "host string",
    )
    got = {r["host"]: r["reg_domain"]
           for r in registered_domain_map(hosts, rules).collect()}
    assert got["example.com."] == "example.com"
    assert got["a..com"] is None
    assert got["example.com"] == "example.com"
