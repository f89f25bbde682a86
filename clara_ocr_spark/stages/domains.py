"""Registered-domain (public-suffix) resolution, PSL semantics.

Host-keyed grouping is the wrong site key at web scale: every
``*.blogspot.com`` subdomain is a distinct publisher, while
``www.example.co.uk`` and ``example.co.uk`` are one.  The public
registry boundary — the "registered domain" (eTLD+1) — is the key
production pipelines group quality stats, mixture weights, and mirror
detection by.  This stage resolves it declaratively against a
public-suffix rule list with the published PSL algorithm
(publicsuffix.org/list/ — public specification):

- a literal rule matches any host ending in it at a label boundary;
- a wildcard rule ``*.b`` matches one extra label in front of ``b``;
- an exception rule ``!x`` beats every wildcard/literal and declares
  ``x`` itself the registered domain;
- among matches the rule with the most labels wins; with no match the
  implicit ``*`` rule applies (top label is the suffix);
- a host that IS a public suffix has no registered domain (NULL).

Plan shape: candidate label-suffixes of each host are generated
JVM-side (split + slice + array_join over at most n_labels entries —
hostnames are ≤ 10ish labels, so the explode is bounded fan-out, not a
join blow-up), equi-joined against the BROADCAST expanded rule table,
and reduced with one max_by per host.  No Python, no skew risk: the
join key is the candidate suffix string, and the per-host reduction is
a map-side-partial groupBy on the ~unique host.

Reference analogue: the rule-precedence election (exception > longest
match > default) is the reference's classifier vote-preference order
(UTSEAN, revision.c neighborhood) applied to url space.
"""

from __future__ import annotations

from typing import Iterable, Optional

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

#: compact built-in default: enough of the published PSL shape to be
#: useful in tests and small runs (real deployments pass the full
#: publicsuffix.org list — same format, one rule per row).  Includes
#: each rule KIND the algorithm must handle.
DEFAULT_RULES = [
    "com", "org", "net", "edu", "gov", "io", "de", "fr", "br", "ru",
    "cn", "uk", "jp", "au", "nz",
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "co.jp", "ne.jp", "com.au", "org.au", "com.br", "com.cn",
    # private-registry entries: every subdomain is a distinct site
    "github.io", "blogspot.com",
    # wildcard + exception pair (the PSL's canonical .ck example)
    "*.ck", "!www.ck",
]


def parse_rules(
    rules: Optional[Iterable[str]] = None,
) -> list:
    """Parse PSL-format rules into the joinable shape:
    (key = the literal labels to equi-match, eff_labels = how many
    labels the EFFECTIVE public suffix has, exc = exception flag).
    A wildcard ``*.b`` matches candidates equal to ``b`` but its
    effective suffix is one label longer; an exception ``!x`` matches
    ``x`` with an effective suffix one label shorter (so ``x`` itself
    becomes the registered domain).

    Pure function so the catalog's ``registered_domain`` DuckDB
    oracle and the Spark broadcast table share ONE parse — the same
    single-source discipline as the robots ``_robots_rx`` VALUES."""
    def ace(rule: str) -> str:
        # the published PSL stores IDN suffixes as Unicode while crawl
        # hosts arrive ACE-encoded ("xn--…"), so every label is
        # punycode-normalized at parse time or multi-label IDN
        # suffixes would silently never match (review finding r5);
        # '*' labels and already-ASCII labels pass through
        out = []
        for lab in rule.split("."):
            if lab == "*" or lab.isascii():
                out.append(lab)
            else:
                try:
                    out.append(lab.encode("idna").decode("ascii"))
                except UnicodeError:
                    out.append(lab)
        return ".".join(out)

    parsed = []
    for r in rules if rules is not None else DEFAULT_RULES:
        r = r.strip().lower()
        if not r or r.startswith("//"):
            continue
        if r.startswith("!"):
            base = ace(r[1:])
            parsed.append((base, len(base.split(".")) - 1, True))
        elif r.startswith("*."):
            base = ace(r[2:])
            parsed.append((base, len(base.split(".")) + 1, False))
        else:
            base = ace(r)
            parsed.append((base, len(base.split(".")), False))
    return parsed


def rules_df(
    spark: SparkSession, rules: Optional[Iterable[str]] = None
) -> DataFrame:
    """``parse_rules`` output as the broadcastable Spark rule table."""
    return spark.createDataFrame(
        parse_rules(rules), "key string, eff_labels int, exc boolean"
    )


def registered_domain_map(
    hosts: DataFrame, rules: DataFrame, host_col: str = "host"
) -> DataFrame:
    """Distinct-host relation → (host, reg_domain) mapping under PSL
    semantics.  ``rules`` is ``rules_df`` output (broadcast — the full
    published list is ~15k rows, trivially broadcastable).
    ``reg_domain`` is NULL when the host is itself a public suffix or
    empty.

    ONE host-keyed shuffle total, and only host strings ever move:
    distinct partitions by host, the bounded candidate explode and the
    broadcast rule lookup are map-side, and the election groupBy
    reuses the distinct's partitioning.  There is deliberately NO
    join-back: the implicit ``*`` rule is folded into the left-joined
    lookup (an unmatched single-label candidate scores eff=1), so
    every host elects at least one candidate and ``reg_domain``
    projects directly off the group key.  Per-row attachment is
    ``with_registered_domain`` (one equi-join against this map — do it
    AFTER host-level rollups, where the relation is already
    host-sized, not across the raw corpus)."""
    from .crawl_audit import norm_host

    h = hosts.select(F.lower(F.col(host_col)).alias("host")).distinct()
    # authority cleanup (review finding r5): drop userinfo and :port
    # (the shared norm_host algebra) so 'a.blogspot.com:8080' keys as
    # a.blogspot.com instead of minting a bogus 'blogspot.com:8080'
    # eTLD+1 that merges distinct publishers; strip the FQDN trailing
    # dot ('example.com.' is the same zone as 'example.com' — without
    # the strip the empty last label elects the implicit-* rule and
    # slices a garbage 'com.' eTLD+1); IP literals get NULL below
    # (PSL defines no registered domain for them)
    clean = F.regexp_replace(norm_host(F.col("host")), r"\.$", "")
    labels = F.split(clean, r"\.")
    n = F.size(labels)
    # all label-suffixes of the host: join(labels[i:]) for i in 0..n-1
    cands = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.array_join(F.slice(labels, i + 1, n - i), "."),
    )
    keyed = h.select("host", F.explode(cands).alias("_cand"))
    hit = keyed.join(
        F.broadcast(rules), keyed["_cand"] == rules["key"], "left"
    )
    # implicit '*' rule: an unmatched TOP-LABEL candidate (no dot) is
    # a 1-label public suffix — present for every host, so the
    # election below always has at least one scored row per host
    eff0 = F.coalesce(
        F.col("eff_labels"),
        F.when(~F.col("_cand").contains("."), F.lit(1)),
    )
    scored = hit.select(
        "host",
        eff0.alias("_eff"),
        F.coalesce(F.col("exc"), F.lit(False)).alias("_exc"),
    ).filter(F.col("_eff").isNotNull())
    # election: exception beats all, then most effective labels.
    # Group on host ALONE so the agg reuses the distinct's
    # partitioning (one Exchange total — the plan pin); the cleaned
    # form is a pure function of host, recomputed in the projection
    best = scored.groupBy("host").agg(
        F.max_by(
            "_eff", F.struct(F.col("_exc").cast("int"), F.col("_eff"))
        ).alias("_eff")
    )
    clean2 = F.regexp_replace(norm_host(F.col("host")), r"\.$", "")
    is_ip2 = F.col("host").startswith("[") | clean2.rlike(
        r"^\d{1,3}(\.\d{1,3}){3}$"
    )
    labels2 = F.split(clean2, r"\.")
    n2 = F.size(labels2)
    # empty labels ('a..com') make the host invalid per RFC 1035 —
    # any slice would be garbage ('.com'), so resolve to NULL
    # (review finding r5)
    reg = F.when(
        (n2 > F.col("_eff"))
        & (F.length(clean2) > 0)
        & ~is_ip2
        & ~F.array_contains(labels2, ""),
        F.array_join(
            F.slice(labels2, n2 - F.col("_eff"), F.col("_eff") + 1), "."
        ),
    )
    return best.select("host", reg.alias("reg_domain"))


def with_registered_domain(
    df: DataFrame, rules: DataFrame, host_col: str = "host"
) -> DataFrame:
    """df + ``reg_domain`` column: one equi-join against the
    ``registered_domain_map`` of df's own distinct hosts.  Meant for
    host-level relations (per-host stats, mixture weights, mirror
    candidates) where the join input is |hosts|-sized; attaching to a
    raw corpus row-table works but shuffles the payload once on host."""
    m = registered_domain_map(
        df.select(F.col(host_col)), rules, host_col=host_col
    )
    return df.join(
        m.withColumnRenamed("host", "__rd_host"),
        F.lower(F.col(host_col)) == F.col("__rd_host"),
        "left",
    ).drop("__rd_host")
