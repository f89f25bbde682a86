"""From-scratch GIF decoder/encoder (stdlib + numpy only).

Fifth native container of the media family (PNG, baseline JPEG,
PCM WAV, MJPEG AVI, GIF): GIF87a/GIF89a with global/local color
tables, interlacing, and multi-frame streams, decoded via a
from-scratch variable-width LZW reader (the public GIF89a
specification's compression; no external codec).

Contract (same as the sibling codecs in ``sources/multimodal.py``):
``decode_gif`` returns ``(width, height, n_frames, concatenated RGB
frame bytes)``; malformed input raises ValueError (corrupt-media
policy: the decode stage maps failures to empty rows, never a crash);
a valid-but-unsupported shape (frames that are not full-canvas, which
would need disposal-method compositing) raises NotImplementedError
(optional-codec gate, like non-baseline JPEG).

Reference analogue: the reference's pbm2bm/loadpgm readers do the
same job for PBM/PGM containers (pgmblock.c:263-457) — parse a public
raster format into rows of pixels; this is that operator for the
dominant animated-image container of the early web.
"""

from __future__ import annotations

import struct

import numpy as np

_GIF_MAGICS = (b"GIF87a", b"GIF89a")


def _lzw_decode(data: bytes, min_code_size: int, max_out: int) -> bytes:
    """Variable-width LZW per the GIF89a spec, appendix F: code width
    starts at min_code_size+1 and grows to 12 bits as the dictionary
    fills; a Clear code resets it. LSB-first bit packing.

    Width-growth discipline: the encoder widens before emitting the
    code that follows its table reaching 2^width, so the decoder must
    count CODES CONSUMED since the last clear (the giflib
    ``RunningCode`` trick) — the first post-clear code stores no
    entry, and counting stored entries instead would widen one code
    too late."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    roots = [bytes([i]) for i in range(clear)]

    store: list[bytes] = []  # entry for code end+1+i
    width = min_code_size + 1
    counter = end + 1  # codes consumed since clear, offset like a code
    out = bytearray()
    prev: bytes | None = None
    bitpos, total_bits = 0, len(data) * 8
    while True:
        if bitpos + width > total_bits:
            raise ValueError("truncated LZW stream")
        byte_i = bitpos >> 3
        window = int.from_bytes(data[byte_i : byte_i + 4], "little")
        code = (window >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            store = []
            width = min_code_size + 1
            counter = end + 1
            prev = None
            continue
        if code == end:
            return bytes(out)
        counter += 1
        next_assignable = end + 1 + len(store)
        if code < clear:
            entry = roots[code]
        elif end + 1 <= code < next_assignable:
            entry = store[code - (end + 1)]
        elif code == next_assignable and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("LZW code beyond dictionary")
        if prev is not None and next_assignable < 4096:
            store.append(prev + entry[:1])
        out += entry
        prev = entry
        if len(out) > max_out:
            raise ValueError("LZW output exceeds pixel budget")
        if counter >= (1 << width) and width < 12:
            width += 1


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    """GIF 4-pass interlace: rows 0::8, 4::8, 2::4, 1::2."""
    h = idx.shape[0]
    out = np.empty_like(idx)
    src = 0
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        n = len(range(start, h, step))
        out[start::step] = idx[src : src + n]
        src += n
    return out


def _read_subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate GIF data sub-blocks starting at ``pos``; returns
    (data, position after the 0 terminator)."""
    parts = []
    n = len(payload)
    while True:
        if pos >= n:
            raise ValueError("unterminated GIF sub-blocks")
        ln = payload[pos]
        pos += 1
        if ln == 0:
            return b"".join(parts), pos
        if pos + ln > n:
            raise ValueError("truncated GIF sub-block")
        parts.append(payload[pos : pos + ln])
        pos += ln


def decode_gif(
    payload: bytes, max_pixels_total: int = 64_000_000
) -> tuple[int, int, int, bytes]:
    """GIF87a/GIF89a → (width, height, n_frames, RGB frame bytes).

    Frames must be full-canvas (left=top=0, size = logical screen) —
    partial frames need disposal-method compositing and raise
    NotImplementedError (optional-codec gate). Everything malformed
    raises ValueError."""
    if payload[:6] not in _GIF_MAGICS:
        raise ValueError("not a GIF")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    sw, sh, packed, _bg, _aspect = struct.unpack("<HHBBB", payload[6:13])
    if not sw or not sh:
        raise ValueError("zero-dimension GIF")
    pos = 13
    gct = None
    if packed & 0x80:
        n_colors = 2 << (packed & 0x07)
        if pos + 3 * n_colors > len(payload):
            raise ValueError("truncated GIF global color table")
        gct = np.frombuffer(
            payload[pos : pos + 3 * n_colors], dtype=np.uint8
        ).reshape(n_colors, 3)
        pos += 3 * n_colors

    frames: list[bytes] = []
    total_px = 0
    n = len(payload)
    while True:
        if pos >= n:
            raise ValueError("GIF missing trailer")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, skipped
            if pos >= n:
                raise ValueError("truncated GIF extension")
            pos += 1
            _, pos = _read_subblocks(payload, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        if pos + 9 > n:
            raise ValueError("truncated GIF image descriptor")
        left, top, fw, fh, fpacked = struct.unpack(
            "<HHHHB", payload[pos : pos + 9]
        )
        pos += 9
        lct = None
        if fpacked & 0x80:
            n_colors = 2 << (fpacked & 0x07)
            if pos + 3 * n_colors > n:
                raise ValueError("truncated GIF local color table")
            lct = np.frombuffer(
                payload[pos : pos + 3 * n_colors], dtype=np.uint8
            ).reshape(n_colors, 3)
            pos += 3 * n_colors
        if (left, top, fw, fh) != (0, 0, sw, sh):
            raise NotImplementedError(
                "partial-canvas GIF frame needs compositing"
            )
        if pos >= n:
            raise ValueError("truncated GIF image data")
        min_code = payload[pos]
        pos += 1
        data, pos = _read_subblocks(payload, pos)
        total_px += fw * fh
        if total_px > max_pixels_total:
            raise ValueError(f"GIF exceeds pixel budget ({total_px})")
        idx_bytes = _lzw_decode(data, min_code, fw * fh)
        if len(idx_bytes) < fw * fh:
            raise ValueError("GIF frame pixel data short")
        idx = np.frombuffer(
            idx_bytes[: fw * fh], dtype=np.uint8
        ).reshape(fh, fw)
        if fpacked & 0x40:
            idx = _deinterlace(idx)
        palette = lct if lct is not None else gct
        if palette is None:
            raise ValueError("GIF frame has no color table")
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("GIF pixel index beyond color table")
        frames.append(palette[idx].tobytes())
    if not frames:
        raise ValueError("GIF has no image frames")
    return sw, sh, len(frames), b"".join(frames)


def encode_gif(frames: "list[np.ndarray]", interlace: bool = False) -> bytes:
    """Minimal grayscale GIF writer (fixture writer, like encode_png /
    encode_avi_mjpeg): 256-entry gray palette, every frame full-canvas,
    LZW emitted as root codes at a fixed 9-bit width with a Clear code
    before the dictionary would force a width growth — valid spec LZW,
    trivially correct, enough for fixtures."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)  # GCT, 256 colors
    out += bytes(v for g in range(256) for v in (g, g, g))
    for f in frames:
        if f.shape != (h, w) or f.dtype != np.uint8:
            raise ValueError("frames must be uint8 and same-shape")
        pix = f
        if interlace:
            rows = [pix[s::t] for s, t in ((0, 8), (4, 8), (2, 4), (1, 2))]
            pix = np.concatenate(rows, axis=0)
        out += struct.pack(
            "<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0
        )
        out.append(8)  # LZW min code size
        bits = bytearray()
        acc = acc_n = 0
        emitted = 0

        def put(code: int) -> None:
            nonlocal acc, acc_n
            acc |= code << acc_n
            acc_n += 9
            while acc_n >= 8:
                bits.append(acc & 0xFF)
                acc >>= 8
                acc_n -= 8

        put(256)  # initial clear
        for b in pix.tobytes():
            if emitted == 253:  # table at 511: clear before width grows
                put(256)
                emitted = 0
            put(b)
            emitted += 1
        put(257)  # end of information
        if acc_n:
            bits.append(acc & 0xFF)
        for i in range(0, len(bits), 255):
            chunk = bits[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)  # sub-block terminator
    out.append(0x3B)
    return bytes(out)
