"""Perceptual image hashing + media near-duplicate detection.

The multimodal leg of the dedup family: `dedup_exact` catches
byte-identical payloads, but re-encoded / re-scaled / lightly-edited
images (the dominant duplication mode in crawled media) need a
PERCEPTUAL key.  dHash — row-wise brightness gradients of an
area-averaged 9×8 thumbnail, 64 bits — is the standard cheap one
(robust to scaling/compression, brittle to crops, which is the right
trade for crawl dedup).  Reference analogue: the bitmap-comparison
classifiers (`bmpcmp_skel`/`bmpcmp_map`, SURVEY §2.8) reduce a
bitmap to a comparable fingerprint before matching; this is the same
move over crawl media.

Scale shape mirrors `simhash_near_dup`'s pigeonhole banding: the
64-bit hash splits into 4×16-bit bands, and Hamming distance ≤ 3
guarantees at least one band matches exactly — so candidates come
from a band-keyed EQUI self-join (never all-pairs over images), and
the exact popcount verify (`F.bit_count(xor)`) runs only on
candidates, JVM-side.  Hashing itself is a map-only Arrow-batched
pass over the decoded pixels; payloads never shuffle.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: dHash thumbnail geometry: 9 columns × 8 rows → 8×8 = 64 gradient
#: bits (each bit: cell brighter than its right neighbor).
_DH_W, _DH_H = 9, 8


def dhash64(
    w: int, h: int, channels: int, body: bytes
) -> Optional[int]:
    """64-bit difference hash of a decoded image (row-major uint8
    pixels, ``channels`` per sample).  Deterministic area-mean
    downsample (np.array_split — no interpolation library), gray =
    channel mean.  Degenerate input (zero dims, short body) → None,
    the corrupt-media discipline."""
    if w < _DH_W or h < _DH_H or channels <= 0:
        # sub-thumbnail images (icons, 1×1 tracking pixels) carry no
        # gradient signal, and empty array_split chunks would mean()
        # to NaN — unhashable, not hash-0
        return None
    arr = np.frombuffer(body, dtype=np.uint8)
    if arr.size < w * h * channels:
        return None
    px = arr[: w * h * channels].reshape(h, w, channels)
    gray = px.astype(np.float64).mean(axis=2)
    # area-mean resize to (_DH_H, _DH_W): split each axis into
    # near-equal runs and average — deterministic for any input size
    rows = [r.mean(axis=0) for r in np.array_split(gray, _DH_H, axis=0)]
    thumb = np.stack(
        [
            np.array([c.mean() for c in np.array_split(row, _DH_W)])
            for row in rows
        ]
    )
    if np.all(thumb == thumb.flat[0]):
        # flat/solid-color image: every such image would hash to the
        # SAME value (0), making a white banner a hamming-0 "dup" of
        # a black divider and piling the whole class onto one join
        # key — no perceptual signal, so no hash
        return None
    bits = (thumb[:, :-1] > thumb[:, 1:]).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    # map to signed 64-bit so the value round-trips through Spark's
    # LongType (bit 63 set would otherwise overflow)
    return v - (1 << 64) if v >= (1 << 63) else v


def _is_image_payload(raw: bytes) -> bool:
    """Container sniff: only payloads whose magic says IMAGE get an
    image hash — a WAV would otherwise 'decode' to w=sample_rate rows
    of waveform bytes and emit a garbage-but-valid dhash that can
    band-collide with real images (review finding)."""
    from ..sources.multimodal import _MAGIC, _PNG_SIG

    return (
        raw[:8] == _PNG_SIG
        or raw[:6] in (b"GIF87a", b"GIF89a")
        or raw[:2] == b"\xff\xd8"
        or (raw[:4] == _MAGIC and len(raw) >= 5 and raw[4] == 0)
    )


def _image_dhash(raw: bytes) -> Optional[int]:
    """Decode an image payload and dHash its FIRST frame.  ``_decode_one``
    concatenates all frames (a GIF animation returns frames*h rows of
    bytes), so channels must be inferred as len/(w*h*frames) and the
    hash taken over the first frame only — dividing by w*h alone reads
    ch=3*frames and reshapes frame-major bytes as per-pixel channels, a
    deterministic but perceptually meaningless hash that can never
    match the same animation re-encoded at a different frame count
    (ADVICE r4)."""
    from ..sources.multimodal import _decode_one

    try:
        w, h, frames, body = _decode_one(raw)
    except (ValueError, NotImplementedError):
        return None
    if w <= 0 or h <= 0 or frames <= 0:
        return None
    ch = len(body) // (w * h * frames)
    return dhash64(w, h, ch, body[: w * h * ch])


def media_dhash(media: DataFrame) -> DataFrame:
    """(media_id, kind, payload) → (media_id, dhash:bigint).

    Map-only Arrow-batched decode+hash (payloads die inside the
    batch); NULL payloads, corrupt media, codec-gated shapes
    (NotImplementedError) and non-image containers all yield a NULL
    dhash row — coverage is total and NOTHING fails the task, so the
    downstream anti-join can separate 'unhashable' from 'unique'."""
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                dh = _image_dhash(raw) if _is_image_payload(raw) else None
                out.append((int(mid), dh))
            yield pd.DataFrame(out, columns=["media_id", "dhash"])

    return media.mapInPandas(batches, schema="media_id bigint, dhash bigint")


def audio_fp64(
    channels: int, n_frames: int, pcm: bytes
) -> Optional[int]:
    """64-bit audio fingerprint: sign of the energy delta across 65
    equal time chunks of the channel-mixed waveform.  Gain-invariant
    (uniform volume scaling preserves energy ordering) — the audio
    twin of dHash's brightness gradients; the same
    :func:`dhash_near_dup` banding join dedups either (it only sees a
    64-bit column).  Sample width inferred from the body length
    (8-bit unsigned / 16-bit signed PCM, the `_decode_wav` contract);
    degenerate input → None."""
    if channels <= 0 or n_frames < 65:
        return None
    width = len(pcm) // (n_frames * channels)
    if width == 2:
        arr = np.frombuffer(
            pcm[: n_frames * channels * 2], dtype="<i2"
        ).astype(np.float64)
    elif width == 1:
        arr = (
            np.frombuffer(pcm[: n_frames * channels], dtype=np.uint8)
            .astype(np.float64)
            - 128.0
        )
    else:
        return None
    mono = arr.reshape(n_frames, channels).mean(axis=1)
    energies = np.array(
        [np.mean(c * c) for c in np.array_split(mono, 65)]
    )
    bits = energies[:-1] > energies[1:]
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def media_audio_fp(media: DataFrame) -> DataFrame:
    """(media_id, kind, payload) → (media_id, dhash:bigint) over
    RIFF/WAVE payloads (column named ``dhash`` so
    :func:`dhash_near_dup` consumes it unchanged).  Non-audio,
    corrupt, or codec-gated payloads yield NULL — total coverage,
    same contract as :func:`media_dhash`."""
    import pandas as pd

    from ..sources.multimodal import _decode_wav

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                fp: Optional[int] = None
                raw = bytes(payload) if payload is not None else b""
                if raw[:4] == b"RIFF":
                    try:
                        _rate, ch, n, pcm = _decode_wav(raw)
                        fp = audio_fp64(ch, n, pcm)
                    except (ValueError, NotImplementedError):
                        fp = None
                out.append((int(mid), fp))
            yield pd.DataFrame(out, columns=["media_id", "dhash"])

    return media.mapInPandas(batches, schema="media_id bigint, dhash bigint")


def media_fingerprints(media: DataFrame) -> DataFrame:
    """(media_id, kind, payload) → (media_id, image_dhash,
    audio_fp): BOTH perceptual keys from ONE Arrow-batched payload
    scan — the job surface uses this instead of running
    :func:`media_dhash` and :func:`media_audio_fp` back-to-back,
    which would read and Python-decode every payload twice.  Exactly
    one of the two columns can be non-NULL per row (a payload is one
    container); the same total-coverage NULL contract as both
    single-key functions."""
    import pandas as pd

    from ..sources.multimodal import _decode_wav

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                dh: Optional[int] = None
                fp: Optional[int] = None
                raw = bytes(payload) if payload is not None else b""
                if _is_image_payload(raw):
                    dh = _image_dhash(raw)
                elif raw[:4] == b"RIFF":
                    try:
                        _rate, ch, n, pcm = _decode_wav(raw)
                        fp = audio_fp64(ch, n, pcm)
                    except (ValueError, NotImplementedError):
                        fp = None
                out.append((int(mid), dh, fp))
            yield pd.DataFrame(
                out, columns=["media_id", "image_dhash", "audio_fp"]
            )

    return media.mapInPandas(
        batches,
        schema="media_id bigint, image_dhash bigint, audio_fp bigint",
    )


def dhash_near_dup(
    hashes: DataFrame, max_dist: int = 3, band_cap: int = 64
) -> DataFrame:
    """(media_id, dhash) → near-dup pairs (id_a < id_b, hamming ≤
    max_dist).

    Pigeonhole banding: with 4 disjoint 16-bit bands, any pair at
    Hamming ≤ 3 shares at least one EXACT band (max_dist must stay
    < 4 for the guarantee) — candidates are a band-keyed equi
    self-join, the popcount verify is `bit_count(a ^ b)` JVM-side on
    candidates only, and duplicate candidate pairs (two shared bands)
    collapse with distinct ON IDS before the verify join re-attaches
    hashes.  The same ids-only-shuffle discipline as
    `near_dup_cosine` — and the same hot-key guard as
    `host_mirror_jaccard`/`shingle_containment`: a (band, key) group
    larger than ``band_cap`` is dropped BEFORE the self-join, because
    one degenerate band value shared by n images would emit C(n, 2)
    candidate rows from a single key (a template thumbnail re-used
    site-wide is the realistic case), while a ≥-cap-sized identical
    band carries near-zero discriminating signal."""
    if not 0 <= max_dist < 4:
        raise ValueError("banding guarantees Hamming <= 3 only")
    h = hashes.filter(F.col("dhash").isNotNull())
    bands = h.select(
        "media_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("dhash"), 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select("media_id", "b.band", "b.key")
    keep = (
        bands.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") <= band_cap)
        .select("band", "key")
    )
    bands = bands.join(keep, ["band", "key"])
    cand = (
        bands.select(F.col("media_id").alias("id_a"), "band", "key")
        .join(
            bands.select(F.col("media_id").alias("id_b"), "band", "key"),
            ["band", "key"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    ha = h.select(F.col("media_id").alias("id_a"), F.col("dhash").alias("ha"))
    hb = h.select(F.col("media_id").alias("id_b"), F.col("dhash").alias("hb"))
    return (
        cand.join(ha, "id_a")
        .join(hb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.bit_count(
                F.col("ha").bitwiseXOR(F.col("hb"))
            ).cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_dist)
    )
