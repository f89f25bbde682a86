"""Baseline JPEG codec (sources/jpeg.py): entropy-level exactness,
lossy round-trip bounds, corrupt/unsupported-input policy."""

from __future__ import annotations

import numpy as np
import pytest

from clara_ocr_spark.sources.jpeg import (
    HUFF_AC_CHROMA,
    HUFF_AC_LUM,
    HUFF_DC_CHROMA,
    HUFF_DC_LUM,
    QUANT_LUM,
    _BitReader,
    _BitWriter,
    _canonical_codes,
    _decode_plane_scan,
    _decode_table,
    _encode_plane,
    _quantized_coefficients,
    _scaled_quant,
    decode_jpeg,
    encode_jpeg,
)


def test_entropy_roundtrip_exact():
    """Huffman encode → decode must reproduce the quantized
    coefficients EXACTLY (the lossless half of JPEG) for both the
    luma and chroma Annex K tables."""
    rng = np.random.default_rng(11)
    plane = rng.integers(0, 256, size=(40, 56), dtype=np.uint8)
    q = _scaled_quant(QUANT_LUM, 85)
    zz = _quantized_coefficients(plane, q)
    for dc_spec, ac_spec in (
        (HUFF_DC_LUM, HUFF_AC_LUM),
        (HUFF_DC_CHROMA, HUFF_AC_CHROMA),
    ):
        w = _BitWriter()
        _encode_plane(
            w, zz, _canonical_codes(*dc_spec), _canonical_codes(*ac_spec), 0
        )
        w.flush()
        data = bytes(w.out) + b"\xff\xd9"
        r = _BitReader(data, 0)
        got = _decode_plane_scan(
            r, zz.shape[0], _decode_table(*dc_spec), _decode_table(*ac_spec)
        )
        assert np.array_equal(got, zz)


def test_roundtrip_error_bounds():
    """Lossy round trip stays within quantization-implied bounds:
    flat color ~exact, smooth gradient exact at q95, noise bounded."""
    rng = np.random.default_rng(5)

    flat = np.full((24, 24, 3), (200, 30, 90), dtype=np.uint8)
    w, h, f, body = decode_jpeg(encode_jpeg(flat, quality=90))
    assert (w, h, f) == (24, 24, 1)
    got = np.frombuffer(body, np.uint8).reshape(24, 24, 3)
    assert np.abs(got.astype(int) - flat.astype(int)).max() <= 2

    y, x = np.meshgrid(np.arange(64), np.arange(48), indexing="ij")
    grad = ((x * 2 + y) % 200 + 20).astype(np.uint8)
    w, h, f, body = decode_jpeg(encode_jpeg(grad, quality=95))
    got = np.frombuffer(body, np.uint8).reshape(64, 48)
    assert np.abs(got.astype(int) - grad.astype(int)).max() <= 1

    noise = rng.integers(0, 256, size=(33, 41), dtype=np.uint8)
    w, h, f, body = decode_jpeg(encode_jpeg(noise, quality=95))
    assert (w, h) == (41, 33)
    got = np.frombuffer(body, np.uint8).reshape(33, 41)
    assert np.abs(got.astype(int) - noise.astype(int)).max() <= 16


def test_roundtrip_property_shapes():
    """Arbitrary small shapes/qualities decode to the right geometry
    with bounded mean error (hypothesis-driven)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        st.integers(1, 20),
        st.integers(1, 20),
        st.sampled_from([1, 3]),
        st.sampled_from([60, 80, 95]),
        st.integers(0, 2**31 - 1),
    )
    def check(h, w, ch, quality, seed):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        arg = px[:, :, 0] if ch == 1 else px
        dw, dh, frames, body = decode_jpeg(encode_jpeg(arg, quality))
        assert (dw, dh, frames) == (w, h, 1)
        got = np.frombuffer(body, np.uint8).reshape(h, w, ch)
        # lossy, but a valid decode of a valid encode is never wild
        assert np.abs(got.astype(int) - px.astype(int)).mean() < 64

    check()


def test_corrupt_jpeg_raises_valueerror():
    good = encode_jpeg(np.zeros((16, 16), dtype=np.uint8))
    for blob in (
        b"\x00\x00",                          # not a JPEG
        b"\xff\xd8\xff\xe0\x00\x00",          # zero-length segment
        good[:20],                            # truncated mid-header
        good[:-30],                           # truncated entropy data
    ):
        with pytest.raises(ValueError):
            decode_jpeg(blob)
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((0, 4), dtype=np.uint8))


def _sof(tag: int, hv: int = 0x11) -> bytes:
    import struct

    sof = struct.pack(">BHHB", 8, 16, 16, 1) + struct.pack(
        ">BBB", 1, hv, 0
    )
    return (
        b"\xff\xd8"
        + struct.pack(">BBH", 0xFF, tag, len(sof) + 2)
        + sof
        + b"\xff\xd9"
    )


def test_unsupported_shapes_raise_notimplemented():
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(_sof(0xC2))  # progressive
    with pytest.raises(NotImplementedError, match="4:4:4"):
        decode_jpeg(_sof(0xC0, hv=0x22))  # 4:2:0


def test_real_decode_dispatch():
    """multimodal routes JPEG payloads through the native baseline
    decoder; non-baseline shapes still hit the Pillow gate."""
    from clara_ocr_spark.sources.multimodal import _decode_one

    px = np.full((12, 10, 3), (10, 200, 60), dtype=np.uint8)
    w, h, f, body = _decode_one(encode_jpeg(px, quality=90))
    assert (w, h, f) == (10, 12, 1)
    got = np.frombuffer(body, np.uint8).reshape(12, 10, 3)
    assert np.abs(got.astype(int) - px.astype(int)).max() <= 2

    with pytest.raises(NotImplementedError, match="Pillow"):
        _decode_one(_sof(0xC2))


def test_decode_stage_handles_jpeg_and_corrupt(spark):
    """End-to-end through the Spark decode stage: a valid baseline
    JPEG yields real dims/bytes; a truncated one maps to the empty
    row (corrupt-media policy), never a crash."""
    from clara_ocr_spark.sources.multimodal import MEDIA_SCHEMA, decode

    good = encode_jpeg(
        np.full((20, 30, 3), (120, 50, 220), dtype=np.uint8), quality=90
    )
    media = spark.createDataFrame(
        [(0, "image", good), (1, "image", good[:25])], MEDIA_SCHEMA
    )
    rows = {r.media_id: r for r in decode(media).collect()}
    assert rows[0].width == 30 and rows[0].height == 20
    assert rows[0].n_bytes == 20 * 30 * 3
    assert rows[1].width == 0 and rows[1].n_bytes == 0


def test_fuzz_only_sanctioned_exceptions_escape():
    """ADVICE r3 found struct.error and ZeroDivisionError escaping the
    PNG corrupt-media handlers; this pins the contract for BOTH native
    codecs: on arbitrary mutations of valid fixtures, decoders raise
    ValueError or NotImplementedError — never anything else — and
    never hang (truncations, bit flips, segment swaps, random blobs)."""
    rng = np.random.default_rng(17)
    from clara_ocr_spark.sources.multimodal import _decode_png, encode_png

    gray = rng.integers(0, 256, size=(12, 15), dtype=np.uint8)
    rgb = rng.integers(0, 256, size=(9, 11, 3), dtype=np.uint8)
    fixtures = [
        ("jpeg", encode_jpeg(gray, 90)),
        ("jpeg", encode_jpeg(rgb, 80)),
        ("png", encode_png(rgb)),
        ("png", encode_png(gray, 0)),
    ]

    def attempt(kind, blob):
        try:
            if kind == "jpeg":
                decode_jpeg(bytes(blob))
            else:
                _decode_png(bytes(blob))
        except (ValueError, NotImplementedError):
            pass  # the sanctioned corrupt/unsupported outcomes

    for kind, blob in fixtures:
        n = len(blob)
        # every truncation point (headers are where parsers break)
        for cut in range(n):
            attempt(kind, blob[:cut])
        # byte flips at random offsets
        for _ in range(300):
            m = bytearray(blob)
            i = int(rng.integers(0, n))
            m[i] ^= int(rng.integers(1, 256))
            attempt(kind, m)
        # random splices: copy a chunk over another location
        for _ in range(100):
            m = bytearray(blob)
            a, b = sorted(rng.integers(0, n, size=2).tolist())
            ln = min(b - a, 16)
            dst = int(rng.integers(0, max(n - ln, 1)))
            m[dst : dst + ln] = m[a : a + ln]
            attempt(kind, m)
    # pure garbage with valid magics
    for _ in range(200):
        blob = bytes(rng.integers(0, 256, size=64, dtype=np.uint8))
        attempt("jpeg", b"\xff\xd8" + blob)
        attempt("png", b"\x89PNG\r\n\x1a\n" + blob)
