"""Barcode decode (obd_main analogue, obd.c:1627; Code 39 element
tables from the public ISO/IEC 16388 assignment, cf. obd.c:70-130):
table structure, encode→decode roundtrips (hypothesis), damage
rejection, and the Spark media-scan stage over PNG payloads."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from clara_ocr_spark.functions.barcode import (
    CODE39,
    decode_code39_image,
    decode_code39_row,
    encode_code39,
    scan_barcodes,
)

_ALPHABET = sorted(c for c in CODE39 if c != "*")


def test_table_structure():
    """Code 39 invariants: 43 + '*' distinct patterns; every normal
    character carries 2 wide bars + 1 wide space; the four specials
    carry 3 wide spaces and no wide bar."""
    assert len(CODE39) == 44
    assert len(set(CODE39.values())) == 44
    for c, p in CODE39.items():
        wb = sum(1 for i in range(0, 9, 2) if p[i] == "1")
        ws = sum(1 for i in range(1, 9, 2) if p[i] == "1")
        assert (wb, ws) == ((0, 3) if c in "$/+%" else (2, 1)), c


@settings(max_examples=60, deadline=None)
@given(
    st.text(alphabet=_ALPHABET, max_size=14),
    st.integers(1, 3),
    st.integers(4, 8),
)
def test_roundtrip_property(text, narrow, wide):
    img = encode_code39(text, narrow=narrow, wide=wide)
    assert decode_code39_image(img) == text


def test_rejects_unreadable():
    assert decode_code39_row(np.full(100, 255, np.uint8)) is None
    assert decode_code39_row(np.zeros(100, np.uint8)) is None
    assert decode_code39_image(np.full((10, 50), 255, np.uint8)) is None
    img = encode_code39("AB").copy()
    img[:, ::3] = 0  # stripe damage on every scanline
    assert decode_code39_image(img) is None
    with pytest.raises(ValueError):
        encode_code39("a")  # lowercase outside the symbology
    with pytest.raises(ValueError):
        encode_code39("*")  # sentinel is not encodable payload


def test_damaged_center_row_falls_back():
    """The quartile fallback reads a barcode whose middle scanline is
    destroyed (obd-style robustness without 2-D voting)."""
    img = encode_code39("FALLBACK-1").copy()
    h = img.shape[0]
    img[h // 2, :] = 0
    assert decode_code39_image(img) == "FALLBACK-1"


def test_scan_barcodes_stage(spark):
    """PNG-payload media rows → (media_id, barcode); RGB and grayscale
    renders both decode, non-barcode PNGs and fake-codec payloads come
    back NULL."""
    from clara_ocr_spark.sources.multimodal import (
        MEDIA_SCHEMA,
        encode_fake,
        encode_png,
    )

    gray = encode_code39("SKU-42")
    rgb = np.repeat(encode_code39("LOT 7/B")[:, :, None], 3, axis=2)
    noise = ((np.indices((20, 40)).sum(axis=0) * 37) % 256).astype(np.uint8)
    rows = [
        (0, "image", encode_png(gray, 0)),
        (1, "image", encode_png(rgb, 2)),
        (2, "image", encode_png(noise, 0)),
        (3, "image", encode_fake(3, 0, 32, 32, 1)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r.barcode for r in scan_barcodes(media).collect()}
    assert got == {0: "SKU-42", 1: "LOT 7/B", 2: None, 3: None}


def test_scan_barcodes_jpeg_payload(spark):
    """JPEG-encoded barcodes scan natively too (sources/jpeg.py):
    Code 39's wide/narrow run widths survive the lossy round trip."""
    import numpy as np

    from clara_ocr_spark.functions.barcode import (
        encode_code39,
        scan_barcodes,
    )
    from clara_ocr_spark.sources.jpeg import encode_jpeg

    img = encode_code39("JPEG-39")
    media = spark.createDataFrame(
        [
            (0, "image", encode_jpeg(img, quality=95)),
            (1, "image", encode_jpeg(img, quality=85)),
            (2, "image", b"\xff\xd8garbage"),
        ],
        "media_id bigint, kind string, payload binary",
    )
    got = {r.media_id: r.barcode for r in scan_barcodes(media).collect()}
    assert got == {0: "JPEG-39", 1: "JPEG-39", 2: None}
