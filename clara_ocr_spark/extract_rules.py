"""Classification + assembly rule semantics (single source of truth).

The distributed pipeline (clara_ocr_spark.stages.*) re-expresses these
rules as Spark column expressions; byte-identity tests pin the two
implementations together (SURVEY §7 hard-part 1).

Reference mapping:

* rule chain ≈ ``classify`` scan-compare-argmax driver + ``avoid_*``
  rejection rules (symbol.c:3878-4384, symbol.c:1977-2041);
* strong/weak thresholds ≈ ``strong_match``/``weak_match``
  (common.h:1149-1150, symbol.c:4149-4230);
* pattern-library lookup ≈ bmpcmp_skel fingerprint containment
  (symbol.c:3286-3775) recast as tag-path fingerprint matching;
* assembly ≈ ``build`` + ``mk_page_output`` (build.c:940-1591,
  html.c:1986-2284): reading order (zone, pos), blocks joined by
  ``\\n``, empty blocks skipped (html.c:2255-2261).
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Tuple

from .domparse import Block, block_features, parse_blocks

# -- tunables (≈ checkvar CLI variables, clara.c:1855-1990) ---------------
NAV_COMPONENTS = frozenset({"nav", "header", "footer", "aside"})
LINK_DENSITY_MAX = 0.5  # ≈ m_msd-style magic number (build.c:62-79)
MIN_TEXT_LEN = 10  # ≈ sdim letter-size threshold (clara.c:1557)
STRONG_MATCH = 8  # ≈ strong_match[classifier] (common.h:1149)
WEAK_MATCH = 4  # ≈ weak_match[classifier] (common.h:1150)

LABEL_CONTENT = "content"
LABEL_BOILER = "boilerplate"
LABEL_NOISE = "noise"


def classify_block(
    tag_path: str,
    text_len: int,
    link_density: float,
    pattern_label: Optional[str] = None,
) -> Tuple[str, int]:
    """Ordered rule chain → (label, score 0-10).

    Pattern-library hits are authoritative strong matches
    (≈ classify early-exit on strong match, symbol.c:4149-4153);
    heuristics are the weak-match fallback.
    """
    if pattern_label is not None:
        return pattern_label, 10
    components = tag_path.split("/") if tag_path else []
    if any(c in NAV_COMPONENTS for c in components):  # R1 ≈ avoid_context
        return LABEL_BOILER, 7
    if text_len < MIN_TEXT_LEN:  # R3 ≈ sdim size gate
        return LABEL_NOISE, 6
    if link_density >= LINK_DENSITY_MAX:  # R2 ≈ avoid_geo
        return LABEL_BOILER, 6
    return LABEL_CONTENT, 5


def assemble_text(blocks: Iterable[Tuple[int, int, str]]) -> str:
    """(zone, pos, text) tuples → final extracted text.

    Total reading order (zone asc, pos asc) — the ``cmpln`` comparator
    made a strict total order; single ``\\n`` between non-empty blocks.
    """
    ordered = sorted(blocks, key=lambda t: (t[0], t[1]))
    return "\n".join(t[2] for t in ordered if t[2])


def reference_extract(
    html: bytes, patterns: Optional[Dict[str, str]] = None
) -> str:
    """Single-node reference extractor — the golden oracle
    (≈ the imre.pbm regression fixture role, book.c:982-984).

    ``patterns`` maps tag_path fingerprint → label (the broadcastable
    pattern library, common.h:937-965 ``pdesc``).
    """
    patterns = patterns or {}
    keep: List[Tuple[int, int, str]] = []
    for b in parse_blocks(html):
        link_density, _, _, _, _ = block_features(b)
        label, _score = classify_block(
            b.tag_path, b.text_len, link_density, patterns.get(b.tag_path)
        )
        if label == LABEL_CONTENT:
            keep.append((b.zone, b.pos, b.text))
    return assemble_text(keep)


#: emphasis span → markup wrapper (the reference's <I>/<B> word spans,
#: build.c:585-685, emitted in HTML output html.c:1966-1973)
_EMPH_WRAP = {
    "i": ("<i>", "</i>"),
    "b": ("<b>", "</b>"),
    "bi": ("<b><i>", "</i></b>"),
}


def markup_text(text: str, emph) -> str:
    """Insert <i>/<b> wrappers at the block's emphasis spans."""
    out: List[str] = []
    off = 0
    for s, e, kind in emph:
        pre, post = _EMPH_WRAP[kind]
        out.append(text[off:s])
        out.append(pre)
        out.append(text[s:e])
        out.append(post)
        off = e
    out.append(text[off:])
    return "".join(out)


def reference_extract_markup(
    html: bytes, patterns: Optional[Dict[str, str]] = None
) -> str:
    """Single-node oracle for the marked-up output variant
    (OE_FULL_HTML's <I>/<B> spans, html.c:1966-1973): identical block
    selection and reading order as :func:`reference_extract`, each
    block's text wrapped at its emphasis spans. With no emphasis in
    the document the output equals ``reference_extract`` byte-for-
    byte."""
    patterns = patterns or {}
    keep: List[Tuple[int, int, str]] = []
    for b in parse_blocks(html):
        link_density, _, _, _, _ = block_features(b)
        label, _score = classify_block(
            b.tag_path, b.text_len, link_density, patterns.get(b.tag_path)
        )
        if label == LABEL_CONTENT:
            keep.append((b.zone, b.pos, markup_text(b.text, b.emph)))
    return assemble_text(keep)
