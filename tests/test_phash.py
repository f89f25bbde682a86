"""Perceptual media dedup: dHash determinism and robustness, the
banded Hamming join's guarantee, corrupt-media tolerance, and the
plan shape (payloads never shuffle; candidates via equi-join)."""

from __future__ import annotations

import numpy as np
import pytest

from clara_ocr_spark.functions.phash import (
    dhash64,
    dhash_near_dup,
    media_dhash,
)
from clara_ocr_spark.sources.multimodal import encode_png


def _img(seed: int, w: int = 45, h: int = 32) -> np.ndarray:
    # random 8×9 block pattern upscaled to (h, w): per-seed structure
    # COARSER than the dHash thumbnail, so distinct seeds land far
    # apart (a monotone gradient would hash to 0 for every seed)
    rng = np.random.RandomState(seed)
    cells = rng.randint(0, 255, (8, 9)).astype(np.uint8)
    return np.kron(cells, np.ones((h // 8, w // 9), dtype=np.uint8))


def test_dhash_deterministic_and_scale_robust():
    a = _img(1)
    h1 = dhash64(45, 32, 1, a.tobytes())
    assert h1 == dhash64(45, 32, 1, a.tobytes())
    # 2x nearest-neighbor upscale: same gradients, same hash (or a
    # couple of boundary bits)
    big = np.kron(a, np.ones((2, 2), dtype=np.uint8))
    h2 = dhash64(90, 64, 1, big.tobytes())
    assert bin((h1 ^ h2) & (2**64 - 1)).count("1") <= 3
    # a different image is far away
    h3 = dhash64(45, 32, 1, _img(99).tobytes())
    assert bin((h1 ^ h3) & (2**64 - 1)).count("1") > 10


def test_dhash_degenerate_inputs():
    assert dhash64(0, 10, 1, b"") is None
    assert dhash64(10, 10, 1, b"short") is None
    assert dhash64(10, 10, 0, b"") is None


def test_media_dhash_and_near_dup_end_to_end(spark):
    base = _img(7)
    tweak = base.copy()
    tweak[0, 0] = 255 - tweak[0, 0]  # one-pixel edit → near-dup
    other = _img(8191)
    rows = [
        (1, 0, bytearray(encode_png(base, color_type=0))),
        (2, 0, bytearray(encode_png(tweak, color_type=0))),
        (3, 0, bytearray(encode_png(other, color_type=0))),
        (4, 0, bytearray(b"\x89PNG\r\n\x1a\ncorrupt")),
    ]
    media = spark.createDataFrame(
        rows, "media_id bigint, kind int, payload binary"
    )
    hashes = media_dhash(media)
    got = {r["media_id"]: r["dhash"] for r in hashes.collect()}
    assert set(got) == {1, 2, 3, 4}  # total coverage
    assert got[4] is None  # corrupt → NULL, never a crash
    assert got[1] is not None and got[1] == got[1]
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dhash_near_dup(hashes).collect()
    }
    assert (1, 2) in pairs  # the one-pixel edit is found
    assert all(k in ((1, 2),) or 3 not in k for k in pairs)
    assert not any(3 in k for k in pairs)  # distinct image not paired


def test_near_dup_plan_is_banded_equi_join(spark):
    df = spark.createDataFrame(
        [(i, i * 7919) for i in range(50)], "media_id bigint, dhash bigint"
    )
    plan = (
        dhash_near_dup(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "NestedLoop" not in plan


def test_near_dup_rejects_unguaranteed_distance(spark):
    df = spark.createDataFrame([(1, 2)], "media_id bigint, dhash bigint")
    with pytest.raises(ValueError, match="Hamming"):
        dhash_near_dup(df, max_dist=4)


def test_pigeonhole_guarantee_exhaustive():
    """Any 64-bit pair at Hamming <= 3 shares an exact 16-bit band —
    the join's correctness, checked against brute force on crafted
    worst cases (3 flipped bits spread across distinct bands)."""
    rng = np.random.RandomState(3)
    for _ in range(200):
        a = int(rng.randint(0, 2**31)) | (int(rng.randint(0, 2**31)) << 32)
        flips = rng.choice(64, size=3, replace=False)
        b = a
        for f in flips:
            b ^= 1 << int(f)
        shares = any(
            ((a >> (16 * i)) & 0xFFFF) == ((b >> (16 * i)) & 0xFFFF)
            for i in range(4)
        )
        assert shares  # 3 flips cannot touch all 4 bands


def test_audio_fp_gain_invariant_and_discriminative():
    from clara_ocr_spark.functions.phash import audio_fp64

    rng = np.random.RandomState(5)
    # structured energy envelope: 65 chunks of distinct loudness
    env = np.repeat(rng.randint(1, 100, 65), 100).astype(np.float64)
    sig = (env * np.sin(np.arange(env.size))).astype(np.int16)
    f1 = audio_fp64(1, sig.size, sig.astype("<i2").tobytes())
    half = (sig // 2).astype("<i2")  # -6 dB gain: same envelope order
    f2 = audio_fp64(1, half.size, half.tobytes())
    assert f1 == f2  # gain-invariant
    rng2 = np.random.RandomState(77)
    env3 = np.repeat(rng2.randint(1, 100, 65), 100).astype(np.float64)
    sig3 = (env3 * np.sin(np.arange(env3.size))).astype("<i2")
    f3 = audio_fp64(1, sig3.size, sig3.tobytes())
    assert bin((f1 ^ f3) & (2**64 - 1)).count("1") > 10
    assert audio_fp64(1, 64, b"\x00" * 128) is None  # < 65 frames


def test_media_audio_fp_end_to_end(spark):
    from clara_ocr_spark.functions.phash import media_audio_fp
    from clara_ocr_spark.sources.multimodal import encode_wav

    rng = np.random.RandomState(9)
    env = np.repeat(rng.randint(1, 100, 65), 80).astype(np.float64)
    base = (env * np.sin(np.arange(env.size))).astype(np.int16)
    quieter = (base * 3) // 4  # gain change → same fingerprint
    rng2 = np.random.RandomState(4242)
    env2 = np.repeat(rng2.randint(1, 100, 65), 80).astype(np.float64)
    other = (env2 * np.cos(np.arange(env2.size))).astype(np.int16)
    rows = [
        (1, 1, bytearray(encode_wav(base))),
        (2, 1, bytearray(encode_wav(quieter.astype(np.int16)))),
        (3, 1, bytearray(encode_wav(other))),
        (4, 1, bytearray(b"RIFFcorrupt")),
        (5, 0, bytearray(b"\x89PNGnot-audio")),
    ]
    media = spark.createDataFrame(
        rows, "media_id bigint, kind int, payload binary"
    )
    fps = media_audio_fp(media)
    got = {r["media_id"]: r["dhash"] for r in fps.collect()}
    assert set(got) == {1, 2, 3, 4, 5}  # total coverage
    assert got[4] is None and got[5] is None
    pairs = {(r["id_a"], r["id_b"]) for r in dhash_near_dup(fps).collect()}
    assert (1, 2) in pairs  # the re-gained copy is found
    assert not any(3 in p for p in pairs)


def test_media_dhash_total_coverage_hardening(spark):
    """Review findings: NULL payloads, codec-gated media
    (NotImplementedError), and non-image containers must yield NULL
    rows — never a task failure, never a garbage image hash."""
    from clara_ocr_spark.sources.multimodal import encode_fake, encode_wav

    wav = encode_wav(np.zeros(200, dtype=np.int16))
    # float-format WAVE → NotImplementedError inside the decoder
    float_wav = bytearray(wav)
    float_wav[20] = 3  # audio_format = IEEE float
    rows = [
        (1, 0, bytearray(encode_png(_img(3), color_type=0))),
        (2, 1, bytearray(wav)),          # valid audio: not an image
        (3, 1, bytes(float_wav)),        # codec-gated
        (4, 0, None),                    # NULL payload
        (5, 2, bytearray(encode_fake(5, 2, 32, 32, 4))),  # fake video
    ]
    got = {
        r["media_id"]: r["dhash"]
        for r in media_dhash(
            spark.createDataFrame(
                rows, "media_id bigint, kind int, payload binary"
            )
        ).collect()
    }
    assert set(got) == {1, 2, 3, 4, 5}
    assert got[1] is not None
    assert got[2] is None and got[3] is None
    assert got[4] is None and got[5] is None


def test_dhash_flat_and_tiny_images_are_unhashable():
    """Solid-color images would ALL hash to 0 (hamming-0 false dups +
    one hot join key); sub-thumbnail images would mean() empty chunks
    to NaN — both must be None."""
    flat = np.full((32, 45), 200, dtype=np.uint8)
    assert dhash64(45, 32, 1, flat.tobytes()) is None
    assert dhash64(1, 1, 1, b"\x80") is None  # 1x1 tracking pixel
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # NaN mean would warn → fail
        assert dhash64(5, 4, 1, bytes(20)) is None


def test_multiframe_gif_hashes_first_frame(spark):
    """A GIF animation must dHash its FIRST frame only: _decode_one
    concatenates frames, so inferring channels as len/(w*h) reads
    ch=3*frames and reshapes frame-major bytes as per-pixel channels —
    the same animation re-encoded at a different frame count could
    then never near-match (ADVICE r4). The hash of a 1-frame and a
    3-frame encoding of the same first frame must be IDENTICAL."""
    from clara_ocr_spark.sources.gif import encode_gif

    f0, f1, f2 = _img(5), _img(6), _img(7)
    rows = [
        (1, "image", bytearray(encode_gif([f0]))),
        (2, "image", bytearray(encode_gif([f0, f1, f2]))),
    ]
    df = spark.createDataFrame(
        rows, "media_id bigint, kind string, payload binary"
    )
    got = {r["media_id"]: r["dhash"] for r in media_dhash(df).collect()}
    assert got[1] is not None
    assert got[1] == got[2]


def test_near_dup_hot_band_cap(spark):
    """A degenerate band value shared by > band_cap images is dropped
    before the self-join (quadratic-candidate guard); distinct pairs
    that share a healthy band still verify."""
    # 40 hashes sharing band0 == 0x1234 but differing elsewhere: with
    # band_cap=8 that band dies; each pair still differs by > 3 bits
    rows = [(i, 0x1234 | (i << 16)) for i in range(40)]
    rows += [(100, 7 | (9 << 16)), (101, 7 | (9 << 16))]  # true dup pair
    df = spark.createDataFrame(rows, "media_id bigint, dhash bigint")
    pairs = {(r["id_a"], r["id_b"]) for r in
             dhash_near_dup(df, band_cap=8).collect()}
    assert (100, 101) in pairs
    assert all(p == (100, 101) for p in pairs)


def test_media_job_end_to_end(tmp_path):
    """jobs/media_job.py in a fresh interpreter: decode + image dups +
    audio dups + barcodes from one media table, NULL-tolerant, with
    lineage metrics."""
    import os
    import subprocess
    import sys

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from clara_ocr_spark.sources.multimodal import encode_wav

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = _img(13)
    tweak = base.copy()
    tweak[0, 0] ^= 0xFF
    rng = np.random.RandomState(6)
    env = np.repeat(rng.randint(1, 100, 65), 80).astype(np.float64)
    snd = (env * np.sin(np.arange(env.size))).astype(np.int16)
    louder = np.clip(snd.astype(np.int32) * 2, -32768, 32767).astype(
        np.int16
    )
    rows = [
        (1, "image", encode_png(base, color_type=0)),
        (2, "image", encode_png(tweak, color_type=0)),
        (3, "audio", encode_wav(snd)),
        (4, "audio", encode_wav(louder)),
        (5, "image", b"\x89PNG\r\n\x1a\ncorrupt"),
    ]
    inp = tmp_path / "media.parquet"
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array([r[0] for r in rows], pa.int32()),
                "kind": [r[1] for r in rows],
                "payload": pa.array([r[2] for r in rows], pa.binary()),
            }
        ),
        str(inp),
    )
    envv = dict(os.environ, SPARK_GRAFT_CPUS="8")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(root, "jobs", "media_job.py"),
            "--input", str(inp),
            "--decoded", str(tmp_path / "dec"),
            "--image-dups", str(tmp_path / "idups"),
            "--audio-dups", str(tmp_path / "adups"),
            "--barcodes", str(tmp_path / "bc"),
            "--metrics", str(tmp_path / "metrics"),
        ],
        capture_output=True, text=True, env=envv, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    dec = duckdb.sql(
        f"select media_id, width from '{tmp_path}/dec/*.parquet'"
    ).fetchall()
    assert {r[0] for r in dec} == {1, 2, 3, 4, 5}  # corrupt row kept
    idups = duckdb.sql(
        f"select id_a, id_b from '{tmp_path}/idups/*.parquet'"
    ).fetchall()
    assert (1, 2) in {(r[0], r[1]) for r in idups}
    adups = duckdb.sql(
        f"select id_a, id_b from '{tmp_path}/adups/*.parquet'"
    ).fetchall()
    assert (3, 4) in {(r[0], r[1]) for r in adups}
    bc = duckdb.sql(
        f"select media_id, barcode from '{tmp_path}/bc/*.parquet'"
    ).fetchall()
    # total coverage: every row present, none of these carry a Code 39
    assert {r[0] for r in bc} == {1, 2, 3, 4, 5}
    assert all(r[1] is None for r in bc)
    n_m = duckdb.sql(
        f"select count(*) from '{tmp_path}/metrics/*.parquet'"
    ).fetchone()[0]
    assert n_m >= 1


# ---- hypothesis fuzz: the pure functions must never crash and must
# ---- stay inside their contracts on ARBITRARY bytes (the link-parser
# ---- fuzz discipline applied to the media keys)
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    w=st.integers(-2, 40),
    h=st.integers(-2, 40),
    ch=st.integers(-1, 5),
    body=st.binary(max_size=4096),
)
def test_dhash64_fuzz_never_raises(w, h, ch, body):
    out = dhash64(w, h, ch, body)
    assert out is None or (
        isinstance(out, int) and -(2**63) <= out < 2**63
    )


@settings(max_examples=200, deadline=None)
@given(
    ch=st.integers(-1, 4),
    n=st.integers(-1, 400),
    pcm=st.binary(max_size=2048),
)
def test_audio_fp64_fuzz_never_raises(ch, n, pcm):
    from clara_ocr_spark.functions.phash import audio_fp64

    out = audio_fp64(ch, n, pcm)
    assert out is None or (
        isinstance(out, int) and -(2**63) <= out < 2**63
    )


def test_media_fingerprints_matches_single_key_passes(spark):
    """The combined one-scan pass must agree exactly with the two
    single-key functions on a mixed media frame — the equivalence the
    media_job rewrite relies on."""
    from clara_ocr_spark.functions.phash import (
        media_audio_fp,
        media_fingerprints,
    )
    from clara_ocr_spark.sources.multimodal import encode_wav

    rng = np.random.RandomState(2)
    env = np.repeat(rng.randint(1, 100, 65), 70).astype(np.float64)
    snd = (env * np.sin(np.arange(env.size))).astype(np.int16)
    rows = [
        (1, 0, bytearray(encode_png(_img(21), color_type=0))),
        (2, 1, bytearray(encode_wav(snd))),
        (3, 0, bytearray(b"corrupt")),
        (4, 0, None),
    ]
    media = spark.createDataFrame(
        rows, "media_id bigint, kind int, payload binary"
    )
    combined = {
        r["media_id"]: (r["image_dhash"], r["audio_fp"])
        for r in media_fingerprints(media).collect()
    }
    img = {r["media_id"]: r["dhash"] for r in media_dhash(media).collect()}
    aud = {r["media_id"]: r["dhash"]
           for r in media_audio_fp(media).collect()}
    assert set(combined) == {1, 2, 3, 4}
    for mid in combined:
        assert combined[mid] == (img[mid], aud[mid]), mid
    assert combined[1][0] is not None and combined[2][1] is not None
