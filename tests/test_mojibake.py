"""Encoding-damage (mojibake) repair + audit.

Unit table for the pure fixer (functions/mojibake), property fuzz
(never crashes, idempotent, conservative on clean text), and the two
Spark stages (curate.repair_text_encoding / encoding_damage_audit)
against hand-checked expectations.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from clara_ocr_spark.functions.mojibake import (
    MOJIBAKE_JAVA_RX,
    fix_mojibake,
    mojibake_score,
)

# (damaged, repaired) — each damaged form is the real cp1252
# mis-decode of the repaired form's UTF-8 bytes (checked in
# test_cases_are_real_misdecodes below, so the table can't drift).
REPAIRS = [
    ("Ã©", "é"),
    ("naÃ¯ve rÃ©sumÃ©", "naïve résumé"),
    ("â€™tis â€œquotedâ€\x9d", "’tis “quoted”"),
    ("Ð¿Ñ€Ð¸Ð²ÐµÑ‚ Ð¼Ð¸Ñ€", "привет мир"),
    ("ÎºÏŒÏƒÎ¼Î¿Ï‚", "κόσμος"),
    ("à¤¨à¤®à¤¸à¥\x8dà¤¤à¥‡", "नमस्ते"),
    ("ï»¿lead-BOM text", "﻿lead-BOM text"),
]

#: clean strings a conservative fixer must NOT touch
CLEAN = [
    "",
    "plain ascii",
    "São Paulo",
    "maçã Ã grande",  # standalone Ã before a space
    "Garçon à côté",
    "Käse & señor café",
    "数学 и физика",  # real CJK/Cyrillic (already correct)
]


def test_cases_are_real_misdecodes():
    for damaged, repaired in REPAIRS:
        # sloppy-cp1252 view of the true UTF-8 bytes == the damaged form
        raw = repaired.encode("utf-8")
        sloppy = "".join(
            bytes([b]).decode("cp1252")
            if b not in (0x81, 0x8D, 0x8F, 0x90, 0x9D)
            else chr(b)
            for b in raw
        )
        assert sloppy == damaged


def test_repair_table():
    for damaged, repaired in REPAIRS:
        assert fix_mojibake(damaged) == repaired
        assert mojibake_score(damaged) > 0
        assert mojibake_score(repaired) == 0


def test_double_encoding_unwinds():
    s = "don’t — it’s café"
    once = "".join(
        bytes([b]).decode("cp1252")
        if b not in (0x81, 0x8D, 0x8F, 0x90, 0x9D)
        else chr(b)
        for b in s.encode("utf-8")
    )
    twice = "".join(
        bytes([b]).decode("cp1252")
        if b not in (0x81, 0x8D, 0x8F, 0x90, 0x9D)
        else chr(b)
        for b in once.encode("utf-8")
    )
    assert fix_mojibake(once) == s
    assert fix_mojibake(twice) == s


def test_lossy_spot_does_not_veto_neighbors():
    """Upstream whitespace normalization that replaced an NBSP
    continuation byte with a plain space makes THAT word irrecoverable
    ("dÃ©jÃ " → trailing lead byte with no continuation); segment-wise
    repair still fixes every other word instead of bailing on the
    whole string."""
    s = "rÃ©sumÃ© dÃ©jÃ vu sÃ©ance"
    out = fix_mojibake(s)
    assert out == "résumé dÃ©jÃ vu séance"


def test_clean_text_untouched():
    for s in CLEAN:
        assert fix_mojibake(s) == s


def test_null_safe():
    assert fix_mojibake(None) is None


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=80))
def test_never_crashes_and_idempotent(s):
    out = fix_mojibake(s)
    assert isinstance(out, str)
    # a second pass finds nothing more to fix
    assert fix_mojibake(out) == out


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(max_codepoint=0x7F), max_size=80))
def test_pure_ascii_is_always_untouched(s):
    assert fix_mojibake(s) == s


@pytest.fixture(scope="module")
def damaged_docs(spark):
    rows = [("https://h%d.example/p%d" % (i % 3, i), t)
            for i, (t, _) in enumerate(REPAIRS)]
    rows += [("https://clean.example/p%d" % i, s)
             for i, s in enumerate(CLEAN) if s]
    rows.append(("https://clean.example/null", None))
    return spark.createDataFrame(rows, "url string, text string")


def test_repair_stage(spark, damaged_docs):
    from clara_ocr_spark.curate import repair_text_encoding

    out = repair_text_encoding(damaged_docs)
    assert out.columns == ["url", "text", "encoding_repaired"]
    rows = {r["url"]: r for r in out.collect()}
    assert len(rows) == damaged_docs.count()
    want = {t: f for t, f in REPAIRS}
    for r in rows.values():
        if r["url"].startswith("https://clean"):
            assert not r["encoding_repaired"]
        else:
            assert r["encoding_repaired"]
    fixed_texts = {r["text"] for r in rows.values()
                   if r["encoding_repaired"]}
    assert fixed_texts == set(want.values())
    assert rows["https://clean.example/null"]["text"] is None


def test_damage_audit(spark, damaged_docs):
    from clara_ocr_spark.curate import encoding_damage_audit

    led = {r["host"]: r for r in encoding_damage_audit(damaged_docs).collect()}
    # every damaged host fully damaged; the clean host reads zero
    for h in ("h0.example", "h1.example", "h2.example"):
        assert led[h]["damaged_pm"] == 1000
        assert led[h]["n_damaged"] == led[h]["n_docs"]
    clean = led["clean.example"]
    assert clean["n_damaged"] == 0 and clean["damaged_pm"] == 0
    assert clean["n_docs"] == len([s for s in CLEAN if s]) + 1  # + NULL row


def test_python_and_java_rx_agree(spark, damaged_docs):
    """The JVM audit regex and the Python fixer's marker regex score
    the same counts on the same strings (single-source-of-truth
    check)."""
    scored = damaged_docs.filter(F.col("text").isNotNull()).select(
        "text",
        F.regexp_count("text", F.lit(MOJIBAKE_JAVA_RX)).alias("n"),
    )
    for r in scored.collect():
        assert r["n"] == mojibake_score(r["text"]), r["text"]


def test_rollups_exact_under_hot_host(spark):
    """Hot-host discipline for the two new host rollups: one host owns
    50% of the corpus; the audits' counters must stay exact (the
    groupBys are map-side partial, so the hot key ships one partial
    row per partition, never its row set)."""
    from clara_ocr_spark.curate import encoding_damage_audit
    from clara_ocr_spark.stages.crawl_audit import soft404_audit

    rows = []
    for i in range(1000):
        # every 4th hot page is damaged; every 10th is a soft-404
        t = ("rÃ©sumÃ© cassÃ©" if i % 4 == 0
             else "Error 404 - page not found" if i % 10 == 5
             else "healthy page content")
        rows.append((f"https://hot.example/p{i}", t))
    for s in range(100):
        for i in range(10):
            rows.append((f"https://cold{s}.example/p{i}", "fine text"))
    docs = spark.createDataFrame(rows, "url string, text string")

    enc = {r["host"]: r for r in encoding_damage_audit(docs).collect()}
    assert enc["hot.example"]["n_docs"] == 1000
    assert enc["hot.example"]["n_damaged"] == 250
    assert enc["hot.example"]["damaged_pm"] == 250
    assert all(v["n_damaged"] == 0 for h, v in enc.items()
               if h != "hot.example")

    soft = {r["host"]: r for r in soft404_audit(docs).collect()}
    assert soft["hot.example"]["n_pages"] == 1000
    assert soft["hot.example"]["n_soft404"] == 100
    assert len(soft) == 101


def test_implausible_repairs_rejected():
    """A 'repair' whose output lands outside the major scripts is a
    false positive, not a fix: French NBSP-before-guillemet typography
    ('là\\xa0»' = bytes E0 A0 BB = valid UTF-8 for U+083B Samaritan)
    must survive untouched (review finding r5)."""
    assert fix_mojibake("il est là\xa0»") == "il est là\xa0»"
    assert fix_mojibake("Ï« test") == "Ï« test"


def test_four_byte_lead_repairs():
    """cp1252 mojibake of 4-byte UTF-8 (emoji) repairs too: the lead
    class covers F0-F4 (ð-ô)."""
    assert fix_mojibake("ðŸ˜€ ok") == "😀 ok"
    assert mojibake_score("ðŸ˜€") > 0


def test_normalize_text_stage(spark):
    """Unicode normalization: NFKC folds fullwidth/ligature forms, and
    NFC-vs-NFD variants of one page become byte-identical (the dedup
    prerequisite); NULL survives; bad form fails fast."""
    import unicodedata

    from clara_ocr_spark.curate import normalize_text

    nfc = unicodedata.normalize("NFC", "résumé déjà")
    nfd = unicodedata.normalize("NFD", "résumé déjà")
    assert nfc != nfd  # fixture sanity
    docs = spark.createDataFrame(
        [("u1", "Ｈｅｌｌｏ ﬁne ２０２４"),
         ("u2", nfc), ("u3", nfd), ("u4", None)],
        "url string, text string",
    )
    out = {r["url"]: r["text"]
           for r in normalize_text(docs, "NFKC").collect()}
    assert out["u1"] == "Hello fine 2024"
    assert out["u2"] == out["u3"] == nfc
    assert out["u4"] is None

    import pytest as _pytest
    with _pytest.raises(ValueError):
        normalize_text(docs, "nfkc-ish")


def test_world_scripts_and_symbols_repair():
    """Review finding r5: Georgian/Lao/Myanmar and common symbols
    (bullet, box drawing) are real web text whose mojibake must
    repair — the plausibility gate may not refuse them."""
    def misdecode(s):
        return "".join(
            bytes([b]).decode("cp1252")
            if b not in (0x81, 0x8D, 0x8F, 0x90, 0x9D)
            else chr(b)
            for b in s.encode("utf-8")
        )

    for s in ("ქართული", "ລາວ", "မြန်မာ", "● bullet", "│ box │",
              "ខ្មែរ", "አማርኛ"):
        assert fix_mojibake(misdecode(s)) == s, s
    # the false-positive class stays rejected
    assert fix_mojibake("il est là\xa0»") == "il est là\xa0»"
