"""Deterministic synthetic PDF corpus (the layout-parse fixture set).

The PDF sibling of ``sources/corpus.py``: seeded, order-independent
(one RNG per doc), no external data — the corpus analogue of the
in-repo golden page (imre.pbm, book.c:982-984) for the geometric
pipeline.  Every generator choice exercises a layout operator:

* two-column pages with interleaved emission order → column split +
  reading-order reconstruction (emission order ≠ reading order, the
  same property the DOM corpus's data-zone template exercises);
* TJ kerning splits inside words → sub-KERN_TOL gap re-joining;
* hex strings, escapes, Tm-vs-Td positioning, FlateDecode streams →
  tokenizer coverage;
* trailing punctuation runs → the no-space-before attachment rule.

``expected_text`` is computed by construction (reading order is known
at generation time), so goldens do NOT depend on the parser under
test; a separate differential test pins ``pdf_reference_extract``
against it, and the Spark layout stage against both.
"""

from __future__ import annotations

import random
import zlib
from datetime import timedelta
from typing import List, Tuple

from .corpus import EPOCH, WORDS
from .pdfparse import CHAR_W

PAGE_W, PAGE_H = 612.0, 792.0
MARGIN = 72.0
LEADING = 14.0
SPACE_FACTOR = 0.5  #: space advance = SPACE_FACTOR * size (> KERN_TOL)


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


class _Line:
    """One laid-out line: list of (x, size, text) runs + its y."""

    __slots__ = ("y", "runs")

    def __init__(self, y: float):
        self.y = y
        self.runs: List[Tuple[float, float, str]] = []


def _layout_paragraph(
    rng: random.Random,
    lang: str,
    x0: float,
    width: float,
    y: float,
    size: float,
    n_words: int,
) -> Tuple[List[_Line], float, str]:
    """Greedy line fill; returns (lines, next_y, expected text)."""
    ws = WORDS[lang]
    words = [rng.choice(ws) for _ in range(n_words)]
    lines: List[_Line] = [_Line(y)]
    x = x0
    out_lines: List[List[str]] = [[]]
    for w in words:
        w_width = CHAR_W * size * len(w)
        if x > x0 and x + w_width > x0 + width:
            y -= LEADING
            lines.append(_Line(y))
            out_lines.append([])
            x = x0
        lines[-1].runs.append((x, size, w))
        out_lines[-1].append(w)
        x += w_width + SPACE_FACTOR * size
    if rng.random() < 0.3:
        # detached punctuation run: gap ∈ (KERN_TOL, space) → the
        # no-space-before rule must attach it to the previous word
        last_end = x - SPACE_FACTOR * size
        punct = rng.choice([".", ",", "!", "?", ";"])
        lines[-1].runs.append((last_end + 2.0, size, punct))
        out_lines[-1][-1] += punct
    expected = "\n".join(" ".join(l) for l in out_lines if l)
    return lines, y - LEADING, expected


def _emit_line_ops(line: _Line, rng: random.Random) -> List[str]:
    """Content-stream ops for one line; randomly picks positioning and
    string styles so the tokenizer paths all get exercised."""
    ops: List[str] = []
    for x, size, text in line.runs:
        style = rng.randint(0, 3)
        ops.append("BT")
        ops.append(f"/F1 {size:g} Tf")
        if style == 0:
            ops.append(f"{x:g} {line.y:g} Td")
            ops.append(f"({_esc(text)}) Tj")
        elif style == 1:
            ops.append(f"1 0 0 1 {x:g} {line.y:g} Tm")
            ops.append(f"({_esc(text)}) Tj")
        elif style == 2 and len(text) > 2:  # TJ kerning split mid-word
            k = rng.randint(1, len(text) - 1)
            a, b = text[:k], text[k:]
            ops.append(f"{x:g} {line.y:g} Td")
            ops.append(f"[({_esc(a)}) 0 ({_esc(b)})] TJ")
        else:  # hex string
            hexs = text.encode("latin-1").hex()
            ops.append(f"{x:g} {line.y:g} Td")
            ops.append(f"<{hexs}> Tj")
        ops.append("ET")
    return ops


def build_pdf(rng: random.Random, lang: str, n_pages: int) -> Tuple[bytes, str]:
    """One synthetic PDF; returns (bytes, expected reading-order text)."""
    page_streams: List[bytes] = []
    expected_pages: List[str] = []
    for _ in range(n_pages):
        two_col = rng.random() < 0.4
        col_texts: List[str] = []
        all_lines: List[_Line] = []
        if two_col:
            col_w = (PAGE_W - 2 * MARGIN - 60.0) / 2  # 60pt river ≥ COL_GAP
            xs = [MARGIN, MARGIN + col_w + 60.0]
        else:
            col_w = PAGE_W - 2 * MARGIN
            xs = [MARGIN]
        for x0 in xs:
            y = PAGE_H - MARGIN
            parts: List[str] = []
            for _ in range(rng.randint(1, 3)):
                size = rng.choice([10.0, 12.0])
                lines, y, text = _layout_paragraph(
                    rng, lang, x0, col_w, y, size, rng.randint(6, 28)
                )
                all_lines.extend(lines)
                parts.append(text)
                y -= LEADING  # paragraph gap
            col_texts.append("\n".join(p for p in parts if p))
        expected_pages.append("\n".join(t for t in col_texts if t))
        # emission order ≠ reading order: shuffle the lines
        order = list(range(len(all_lines)))
        rng.shuffle(order)
        ops: List[str] = []
        for i in order:
            ops.extend(_emit_line_ops(all_lines[i], rng))
        page_streams.append("\n".join(ops).encode("latin-1"))
    expected = "\n".join(p for p in expected_pages if p)
    return _assemble_pdf(page_streams, rng), expected


def _assemble_pdf(page_streams: List[bytes], rng: random.Random) -> bytes:
    """Wrap content streams in a minimal PDF 1.4 skeleton with a real
    xref table; streams randomly FlateDecode-compressed."""
    n = len(page_streams)
    objs: List[bytes] = []
    # 1 catalog, 2 pages, 3 font, then per page: page obj + content obj
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode()
    )
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    for i, data in enumerate(page_streams):
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W:g} "
                f"{PAGE_H:g}] /Resources << /Font << /F1 3 0 R >> >> "
                f"/Contents {5 + 2 * i} 0 R >>"
            ).encode()
        )
        if rng.random() < 0.5:
            comp = zlib.compress(data)
            objs.append(
                f"<< /Length {len(comp)} /Filter /FlateDecode >>".encode()
                + b"\nstream\n"
                + comp
                + b"\nendstream"
            )
        else:
            objs.append(
                f"<< /Length {len(data)} >>".encode()
                + b"\nstream\n"
                + data
                + b"\nendstream"
            )
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def ensure_pdf_corpus(path: str, n: int, seed: int = 42) -> str:
    """Sharded parquet PDF corpus — ``corpus.ensure_corpus`` with the
    PDF row generator (same shard layout, pool fan-out, atomic
    rename)."""
    from .corpus import ensure_corpus

    return ensure_corpus(path, n, seed, gen=gen_pdf_page)


def gen_pdf_page(i: int, seed: int = 42) -> dict:
    """One corpus row in the fixed pages schema — PDF bytes ride the
    ``html:binary`` column (Common-Crawl reality: mixed content types
    in one capture table), routed downstream by the %PDF- magic."""
    rng = random.Random((seed << 21) ^ i)
    host = f"pdfhost{rng.randint(1, 12):02d}.example"
    lang = rng.choices(["en", "pt", "de"], weights=[6, 2, 2])[0]
    raw, expected = build_pdf(rng, lang, rng.randint(1, 3))
    return {
        "url": f"https://{host}/doc/{i}.pdf",
        "warc_ts": EPOCH + timedelta(seconds=i),
        "html": raw,
        "text": expected,
        "lang": lang,
    }
