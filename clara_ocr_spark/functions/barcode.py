"""Barcode decode — the ``obd_main`` analogue (reference obd.c:1627,
pattern tables obd.c:70-130; SURVEY §2.13 listed it out of scope until
the multimodal stage gained a REAL image decode path in round 3).

The reference walks a bitmap's bar runs and classifies narrow/wide
element sequences against the Code 39 table. The corpus-scale
analogue: barcode images ride the media table as PNG payloads
(``sources/multimodal`` decodes them natively, stdlib-only), and the
decoder is a per-row numpy run-length pass inside the same
Arrow-batched ``mapInPandas`` stage — no per-pixel Python.

Code 39 (ISO/IEC 16388, public standard): each character is 9
elements — 5 bars and 4 spaces, alternating, exactly 3 of them wide
(the $ / + % specials carry their 3 wide elements on spaces only) —
with a narrow inter-character gap, framed by ``*`` start/stop
sentinels and white quiet zones. The table below is the standard's
published element map (1 = wide), not a port of the reference's
tables.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

#: char → 9 elements (bar,space,bar,space,bar,space,bar,space,bar),
#: '1' = wide, '0' = narrow — the public Code 39 assignment
CODE39 = {
    "0": "000110100", "1": "100100001", "2": "001100001",
    "3": "101100000", "4": "000110001", "5": "100110000",
    "6": "001110000", "7": "000100101", "8": "100100100",
    "9": "001100100", "A": "100001001", "B": "001001001",
    "C": "101001000", "D": "000011001", "E": "100011000",
    "F": "001011000", "G": "000001101", "H": "100001100",
    "I": "001001100", "J": "000011100", "K": "100000011",
    "L": "001000011", "M": "101000010", "N": "000010011",
    "O": "100010010", "P": "001010010", "Q": "000000111",
    "R": "100000110", "S": "001000110", "T": "000010110",
    "U": "110000001", "V": "011000001", "W": "111000000",
    "X": "010010001", "Y": "110010000", "Z": "011010000",
    "-": "010000101", ".": "110000100", " ": "011000100",
    "*": "010010100", "$": "010101000", "/": "010100010",
    "+": "010001010", "%": "000101010",
}
_DECODE = {v: k for k, v in CODE39.items()}


def encode_code39(
    text: str,
    narrow: int = 2,
    wide: int = 5,
    height: int = 24,
    quiet: int = 12,
) -> np.ndarray:
    """Render ``*text*`` as a Code 39 image (uint8, 0 = bar,
    255 = background) — the fixture generator; a real pipeline only
    DECODES. Raises on characters outside the symbology."""
    for c in text:
        if c not in CODE39 or c == "*":
            raise ValueError(f"not Code39-encodable: {c!r}")
    widths: List[int] = []  # alternating bar/space element widths
    for i, c in enumerate("*" + text + "*"):
        if i:
            widths.append(narrow)  # inter-character gap (space)
        widths.extend(wide if b == "1" else narrow for b in CODE39[c])
    row = [np.full(quiet, 255, np.uint8)]
    dark = True
    for w in widths:
        row.append(np.full(w, 0 if dark else 255, np.uint8))
        dark = not dark
    row.append(np.full(quiet, 255, np.uint8))
    line = np.concatenate(row)
    return np.tile(line, (height, 1))


def decode_code39_row(row: np.ndarray) -> Optional[str]:
    """One scanline → decoded text, or None when the line is not a
    readable Code 39 (the find_thing discipline: unreadable yields
    nothing, never an error).

    Vectorized run-length: threshold, diff for run boundaries,
    per-run widths; wide/narrow split at the midpoint of the observed
    width range (the reference's adaptive bar-width classification,
    obd.c:1627+ — tolerant of uniform scaling)."""
    dark = np.asarray(row) < 128
    if not dark.any():
        return None
    # trim quiet zones
    idx = np.flatnonzero(dark)
    dark = dark[idx[0] : idx[-1] + 1]
    # run-length encode
    change = np.flatnonzero(np.diff(dark.astype(np.int8))) + 1
    bounds = np.concatenate(([0], change, [dark.size]))
    widths = np.diff(bounds)
    # element count: chars × 9 + (chars−1) gaps ⇒ ≡ 9 (mod 10);
    # minimum is the bare start/stop frame (19 runs)
    if widths.size < 19 or (widths.size + 1) % 10:
        return None
    lo, hi = widths.min(), widths.max()
    if hi <= lo:  # all runs equal: no wide elements anywhere
        return None
    cut = (lo + hi) / 2.0
    wide = widths > cut
    chars: List[str] = []
    for start in range(0, widths.size, 10):
        elems = wide[start : start + 9]
        if elems.size < 9:
            return None
        if start + 9 < widths.size and wide[start + 9]:
            return None  # inter-character gap must be narrow
        chars.append(
            _DECODE.get("".join("1" if w else "0" for w in elems), "\0")
        )
    if "\0" in chars:
        return None
    if len(chars) < 2 or chars[0] != "*" or chars[-1] != "*":
        return None
    body = chars[1:-1]
    if "*" in body:
        return None
    return "".join(body)


def decode_code39_image(pixels: np.ndarray) -> Optional[str]:
    """2-D (or 3-channel) image → text via the middle scanline, with
    a quartile fallback pair for images whose center row is damaged."""
    px = np.asarray(pixels)
    if px.ndim == 3:
        px = px.mean(axis=2)
    h = px.shape[0]
    for frac in (0.5, 0.25, 0.75):
        got = decode_code39_row(px[int(h * frac) % h])
        if got is not None:
            return got
    return None


def scan_barcodes(media):
    """media(media_id, kind, payload) → (media_id, barcode) for PNG
    payloads that decode as Code 39; non-PNG / non-barcode rows yield
    NULL barcode. Arrow-batched, same stage shape as multimodal
    decode — at scale this rides the existing media scan, adding no
    shuffle (map-only)."""
    from typing import Iterator

    import pandas as pd
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from ..sources.multimodal import _PNG_SIG, _decode_png

    schema = StructType(
        [
            StructField("media_id", IntegerType(), False),
            StructField("barcode", StringType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                text = None
                raw = bytes(payload)
                decoder = None
                if raw[:8] == _PNG_SIG:
                    decoder = _decode_png
                elif raw[:2] == b"\xff\xd8":
                    # baseline JPEG decodes natively too (sources/
                    # jpeg.py); Code 39 bars survive the lossy round
                    # trip — the run-length thresholding reads the
                    # same widths
                    from ..sources.jpeg import decode_jpeg

                    decoder = decode_jpeg
                if decoder is not None:
                    try:
                        w, h, _frames, body = decoder(raw)
                        arr = np.frombuffer(body, np.uint8)
                        ch = arr.size // (w * h)
                        px = arr.reshape(h, w, ch) if ch > 1 else arr.reshape(h, w)
                        text = decode_code39_image(px)
                    except (ValueError, NotImplementedError):
                        text = None
                out.append((int(mid), text))
            yield pd.DataFrame(out, columns=["media_id", "barcode"])

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=schema
    )
