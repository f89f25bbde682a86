"""Fast HTML tokenizer driving the same block builder as domparse.

≈ the reference's hand-rolled streaming PBM reader with bit-parallel
optimizations (pbm2cl.c:290-371, the i64/8-pixels-at-a-time rework
that made segmentation "50% faster", CHANGELOG:689-691): the stdlib
``html.parser`` spends most of its time in generic regex dispatch;
this tokenizer is a ``str.find``-driven scanner emitting the exact
same event stream into the same ``_BlockParser`` handlers.

Parity contract: for the whole corpus domain (all five templates,
malformed markup, Latin-1 decodes, entities, script/style content)
the produced block lists are IDENTICAL to the html.parser-based
implementation — enforced by tests/test_fastparse.py differential
tests.  ``parse_blocks_fast`` falls back to the stdlib parser for
any input where scanning raises.
"""

from __future__ import annotations

import re
from html import unescape
from typing import List

from .domparse import _BlockParser, Block, decode_html

#: tags whose content is raw text until the literal close tag
#: (html.parser's CDATA_CONTENT_ELEMENTS)
_RAWTEXT = ("script", "style")

_NAME_RE = re.compile(r"[a-zA-Z][-.a-zA-Z0-9:_]*")
_ATTR_ZONE_RE = re.compile(
    r"""data-zone\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]*))""", re.I
)


def _parse_events(s: str, p: _BlockParser) -> None:
    n = len(s)
    i = 0
    rawtext_until: str | None = None
    while i < n:
        if rawtext_until is not None:
            # inside <script>/<style>: scan for the literal close tag
            m = s.find(rawtext_until, i)
            if m < 0:
                p.handle_data(s[i:])
                break
            p.handle_data(s[i:m])
            gt = s.find(">", m)
            p.handle_endtag(rawtext_until[2:])
            i = n if gt < 0 else gt + 1
            rawtext_until = None
            continue
        lt = s.find("<", i)
        if lt < 0:
            p.handle_data(unescape(s[i:]))
            break
        if lt > i:
            p.handle_data(unescape(s[i:lt]))
        nxt = s[lt + 1 : lt + 2]
        if nxt == "!":
            if s.startswith("<!--", lt):
                end = s.find("-->", lt + 4)
                i = n if end < 0 else end + 3
            else:  # doctype / CDATA-ish declaration
                end = s.find(">", lt)
                i = n if end < 0 else end + 1
            continue
        if nxt == "?":  # processing instruction
            end = s.find(">", lt)
            i = n if end < 0 else end + 1
            continue
        if nxt == "/":
            m = _NAME_RE.match(s, lt + 2)
            end = s.find(">", lt)
            if m is None or end < 0:
                # html.parser: bogus end tag swallowed to '>'
                i = n if end < 0 else end + 1
                continue
            p.handle_endtag(m.group(0).lower())
            i = end + 1
            continue
        m = _NAME_RE.match(s, lt + 1)
        if m is None:
            # '<' followed by non-name: literal text (html.parser rule)
            p.handle_data("<")
            i = lt + 1
            continue
        tag = m.group(0).lower()
        # find tag end; the quote-aware scan only runs when a quote
        # char actually precedes the candidate '>' (rare fast path)
        e0 = m.end()
        j = s.find(">", e0)
        if j < 0:
            break  # unterminated tag at EOF: html.parser buffers/drops it
        if s.find('"', e0, j) != -1 or s.find("'", e0, j) != -1:
            quote = None
            j = e0
            while j < n:
                c = s[j]
                if quote is not None:
                    if c == quote:
                        quote = None
                elif c in "\"'":
                    quote = c
                elif c == ">":
                    break
                j += 1
            if j >= n:
                break
        attr_src = s[e0:j]
        self_closing = attr_src.rstrip().endswith("/")
        attrs = []
        if "data-zone" in attr_src:
            zm = _ATTR_ZONE_RE.search(attr_src)
            if zm:
                attrs.append(
                    ("data-zone", zm.group(1) or zm.group(2) or zm.group(3) or "")
                )
        p.handle_starttag(tag, attrs)
        if self_closing:
            p.handle_endtag(tag)
        i = j + 1
        if tag in _RAWTEXT and not self_closing:
            rawtext_until = f"</{tag}"


def parse_blocks_fast(html: bytes) -> List[Block]:
    """Drop-in replacement for domparse.parse_blocks."""
    text = decode_html(html)
    p = _BlockParser()
    try:
        _parse_events(text, p)
        p._flush()
    except Exception:
        from .domparse import parse_blocks as _slow

        return _slow(html)
    return p.blocks
