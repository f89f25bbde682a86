"""Encoding-damage (mojibake) detection and repair, from scratch.

Web corpora carry a steady rate of UTF-8 text that was mis-decoded as
windows-1252/latin-1 somewhere upstream and re-encoded — "é" stored
as "Ã©", "'" as "â€™", whole Cyrillic pages as "Ð¿Ñ€Ð¸Ð²ÐµÑ‚".
The curation side repairs what the extraction side cannot: extraction
decodes the ORIGINAL bytes (domparse.decode_html) and stays
byte-identical to the reference, but damage baked into the source
document (the publisher's CMS already stored mojibake) survives
extraction by design and is a curation concern, exactly where
CCNet-style pipelines run their fixers.

Reference analogue: the repair is the text-side dual of the
reference's adaptive re-binarization (hqbin second pass — re-read the
symbols you distrust with a better transform, pbm2cl.c spyhole
neighborhood); the marker audit is its doubt accounting (step_14).

From public knowledge only: the windows-1252 byte↔char table is the
published WHATWG/Unicode mapping; the repair loop is the standard
"re-encode sloppy-cp1252, re-decode UTF-8 strict, accept iff damage
strictly decreases" construction described in the ftfy paper/docs —
implemented here from scratch against Python's stdlib codecs.
"""

from __future__ import annotations

import re
from typing import Optional

#: byte → char for "sloppy windows-1252": the 251 real cp1252
#: positions plus the 5 undefined holes (0x81 8D 8F 90 9D) mapped to
#: their C1 controls, which is what lenient web decoders emit and so
#: what damaged text actually contains.
_SLOPPY_CP1252 = {
    b: (
        bytes([b]).decode("cp1252")
        if b not in (0x81, 0x8D, 0x8F, 0x90, 0x9D)
        else chr(b)
    )
    for b in range(256)
}
#: char → byte, the encode direction of the same table.
_SLOPPY_ENCODE = {c: b for b, c in _SLOPPY_CP1252.items()}

#: chars a UTF-8 *continuation* byte (0x80-0xBF) renders as under
#: sloppy cp1252 — the second char of every mojibake pair.
_CONT_CHARS = "".join(sorted(_SLOPPY_CP1252[b] for b in range(0x80, 0xC0)))

#: high-signal mojibake markers: a 2-byte-sequence lead (Â..Ã, i.e.
#: UTF-8 lead bytes C2/C3 for Latin-1-range chars), a 3- or 4-byte
#: lead (à..ô covers E0-EF and F0-F4: "â€™", "ï»¿", Devanagari
#: "à¤...", emoji "ðŸ..."), or a Cyrillic/Greek 2-byte lead
#: (Ð/Ñ/Î/Ï = D0/D1/CE/CF) — each followed by a continuation-class
#: char.  Python regex form.
MOJIBAKE_RE = re.compile(
    "[ÂÃÐÑÎÏà-ô]"
    f"[{re.escape(_CONT_CHARS)}]"
)

#: the same marker as a Java-regex string for JVM-side audits
#: (F.regexp_count).  Character-class metachars are escaped; the
#: class content is identical to MOJIBAKE_RE's.
MOJIBAKE_JAVA_RX = (
    "[ÂÃÐÑÎÏà-ô]"
    "[" + _CONT_CHARS.replace("\\", "\\\\").replace("[", "\\[")
    .replace("]", "\\]").replace("^", "\\^").replace("&", "\\&")
    + "]"
)


def mojibake_score(s: str) -> int:
    """Number of mojibake marker bigrams in ``s`` (0 = looks clean)."""
    return len(MOJIBAKE_RE.findall(s))


def _reencode(s: str) -> Optional[bytes]:
    """``s`` back to the bytes a sloppy-cp1252 decode would have read,
    or None if any char has no cp1252 byte (then ``s`` cannot be a
    cp1252 mis-decode and must not be 'repaired')."""
    enc = _SLOPPY_ENCODE
    try:
        return bytes(enc[c] for c in s)
    except KeyError:
        return None


#: Unicode ranges a REPAIRED segment may land in — the major scripts
#: and symbol blocks real web text uses.  A "repair" whose output
#: falls outside (Samaritan, Ogham, unassigned planes …) is far more
#: likely a false positive than a real fix: e.g. the French segment
#: "là\xa0»" (NBSP before a guillemet, mandatory French typography)
#: re-encodes to E0 A0 BB — a VALID UTF-8 sequence for U+083B
#: (Samaritan) — and would otherwise pass every other gate (review
#: finding r5).  This is the lightweight form of ftfy's published
#: "badness" idea: judge the repair by where its output lands.
_PLAUSIBLE_RANGES = (
    (0x0009, 0x000D), (0x0020, 0x007E),          # ASCII + ws controls
    (0x00A0, 0x024F),                            # Latin-1 supp + ext A/B
    (0x0250, 0x036F),                            # IPA, modifiers, combining
    (0x0370, 0x03E1), (0x03F0, 0x052F),          # Greek (minus Coptic), Cyrillic
    (0x0590, 0x06FF),                            # Hebrew, Arabic
    # 0x0700-0x08FF deliberately EXCLUDED: Samaritan/Mandaic/… is
    # exactly where the "à + NBSP + x" false-positive class lands
    (0x0900, 0x0DFF),                            # Indic blocks
    # Thai through Khmer: Lao, Tibetan, Myanmar, Georgian, Jamo,
    # Ethiopic, Cherokee, UCAS, Khmer — real web scripts whose
    # mojibake must stay repairable (review finding r5)
    (0x0E00, 0x17FF),
    (0x1E00, 0x1FFF),                            # Latin ext add., Greek ext
    (0x2000, 0x27BF),                            # punct, currency, arrows,
                                                 # box drawing, geometric,
                                                 # misc symbols, dingbats
    (0x2E80, 0x9FFF),                            # CJK radicals … ideographs
    (0xAC00, 0xD7AF), (0xF900, 0xFAFF),          # Hangul, compat ideographs
    (0xFEFF, 0xFEFF), (0xFF00, 0xFFEF),          # BOM, full/half-width
    (0x1F000, 0x1FAFF),                          # emoji (4-byte repairs)
    (0x20000, 0x2FA1F),                          # CJK ext B+ planes
)


def _plausible(s: str) -> bool:
    return all(
        any(lo <= o <= hi for lo, hi in _PLAUSIBLE_RANGES)
        for o in map(ord, s)
    )


def _fix_segment(seg: str, max_rounds: int) -> str:
    cur = seg
    score = mojibake_score(cur)
    for _ in range(max_rounds):
        if score == 0:
            break
        raw = _reencode(cur)
        if raw is None:
            break
        try:
            fixed = raw.decode("utf-8")
        except UnicodeDecodeError:
            break
        new_score = mojibake_score(fixed)
        if new_score >= score or not _plausible(fixed):
            break
        cur, score = fixed, new_score
    return cur


#: ASCII whitespace only — \s would also split on NBSP/ideographic
#: space, and a mojibake continuation char is often exactly NBSP
#: (0xA0): splitting on it would cut the damaged sequence in half and
#: make it unrepairable.
_ASCII_WS = re.compile(r"([ \t\r\n\f\v]+)")


def fix_mojibake(s: Optional[str], max_rounds: int = 3) -> Optional[str]:
    """Repair UTF-8-as-cp1252 damage; returns ``s`` unchanged when no
    confident repair exists.  Conservative by construction: a repair
    is accepted only when (a) every char maps back to a cp1252 byte,
    (b) those bytes decode as STRICT UTF-8, and (c) the marker count
    strictly decreases — so clean French/Portuguese text with a
    legitimate standalone "Ã" is untouched (no continuation-class
    follower), and anything ambiguous stays as-is.  ``max_rounds`` > 1
    unwinds double/triple-encoded text ("Ã¢â‚¬â„¢" → "â€™" → "'").

    Repair is per ASCII-whitespace-delimited segment, not whole-
    string: real corpus damage is often lossy in spots (upstream
    whitespace normalization that replaced an NBSP continuation byte
    with a plain space destroys that one sequence irrecoverably), and
    an all-or-nothing whole-string gate would let a single lossy spot
    veto every repairable word around it.  NULL-safe, deterministic,
    idempotent; never raises."""
    if s is None:
        return None
    if mojibake_score(s) == 0:
        return s
    parts = _ASCII_WS.split(s)
    return "".join(
        _fix_segment(p, max_rounds) if i % 2 == 0 and p else p
        for i, p in enumerate(parts)
    )
