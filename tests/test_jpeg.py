"""Baseline JPEG codec tests.

JPEG's transform stage is lossy, so exactness is pinned where it
exists: the entropy layer (Huffman + DC prediction + zigzag + byte
stuffing + restart markers) is lossless and compared coefficient-for-
coefficient; the IDCT is compared against an independent direct
cosine-sum implementation; a hand-assembled single-block stream
decodes to analytically known pixels. End-to-end quality is bounded
by PSNR.
"""

import numpy as np
import pytest


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _smooth_img(h, w, seed=5):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            128 + 100 * np.sin(xx / 9) * np.cos(yy / 7),
            128 + 80 * np.cos(xx / 13 + yy / 5),
            128 + 60 * np.sin((xx + yy) / 11),
        ],
        axis=2,
    )
    return (img + rng.normal(0, 2, img.shape)).clip(0, 255).astype(np.uint8)


def test_jpeg_entropy_layer_is_bit_exact():
    """Quantized coefficients recovered by the decoder equal the
    encoder's exactly — for 4:4:4 and 4:2:0, with and without restart
    markers, at several qualities (the lossless layers really are
    lossless)."""
    from tl_spark.operators.jpeg import jpeg_bytes, jpeg_decode_coefficients

    img = _smooth_img(45, 61)
    for sub in ("444", "420"):
        for ri in (0, 2, 5):
            for q in (25, 75, 95):
                sink = []
                payload = jpeg_bytes(
                    img, quality=q, subsample=sub,
                    restart_interval=ri, _coef_sink=sink,
                )
                _, coefs, _ = jpeg_decode_coefficients(payload)
                assert len(sink) == len(coefs) == 3
                for a, b in zip(sink, coefs):
                    assert np.array_equal(a, b), (sub, ri, q)


def test_jpeg_idct_matches_direct_cosine_sum():
    """The matrix IDCT equals the T.81 A.3.3 direct formula, written
    here independently as an explicit double sum."""
    from tl_spark.operators.jpeg import _C

    rng = np.random.default_rng(9)
    F = rng.integers(-500, 500, (8, 8)).astype(np.float64)
    fast = _C.T @ F @ _C
    ref = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * F[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            ref[x, y] = s / 4.0
    assert np.allclose(fast, ref, atol=1e-9)


def test_jpeg_handbuilt_single_block_decodes_analytically():
    """A hand-assembled grayscale one-block stream whose only nonzero
    coefficient is DC=4 with q=16 must decode to the flat value
    round(4*16/8) + 128 = 136 everywhere (orthonormal DC basis is
    1/8 per pixel)."""
    import struct

    from tl_spark.operators.jpeg import (
        DC_LUMA,
        AC_LUMA,
        ZIGZAG,
        _build_huffman,
        jpeg_decode,
    )

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    q = np.full(64, 16, np.uint8)
    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(q))
    out += seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    out += seg(
        0xC4, bytes([0x00]) + bytes(DC_LUMA[0]) + bytes(DC_LUMA[1])
    )
    out += seg(
        0xC4, bytes([0x10]) + bytes(AC_LUMA[0]) + bytes(AC_LUMA[1])
    )
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    # entropy data: DC category 3 + amplitude bits '100' (value 4), EOB
    _, enc_dc = _build_huffman(*DC_LUMA)
    _, enc_ac = _build_huffman(*AC_LUMA)
    acc, nbits = 0, 0
    for code, ln in (
        (enc_dc[3][1], enc_dc[3][0]),
        (0b100, 3),
        (enc_ac[0x00][1], enc_ac[0x00][0]),
    ):
        acc = (acc << ln) | code
        nbits += ln
    pad = (8 - nbits % 8) % 8
    acc = (acc << pad) | ((1 << pad) - 1)
    out += acc.to_bytes((nbits + pad) // 8, "big")
    out += b"\xff\xd9"
    dec = jpeg_decode(bytes(out))
    assert dec.shape == (8, 8, 3)
    assert np.array_equal(dec, np.full((8, 8, 3), 136, np.uint8))


def test_jpeg_roundtrip_psnr_bounds():
    from tl_spark.operators.jpeg import jpeg_bytes, jpeg_decode

    img = _smooth_img(45, 61)
    d444 = jpeg_decode(jpeg_bytes(img, quality=90, subsample="444"))
    d420 = jpeg_decode(jpeg_bytes(img, quality=90, subsample="420"))
    assert d444.shape == img.shape == d420.shape
    assert _psnr(img, d444) > 38
    assert _psnr(img, d420) > 30
    flat = np.full((16, 16, 3), 130, np.uint8)
    assert np.array_equal(
        jpeg_decode(jpeg_bytes(flat, quality=95)), flat
    )


def test_jpeg_decode_is_deterministic_and_odd_sizes():
    """Odd, non-MCU-aligned dimensions decode to exactly the declared
    size; decoding the same payload twice is byte-identical."""
    from tl_spark.operators.jpeg import jpeg_bytes, jpeg_decode

    for h, w in [(1, 1), (7, 9), (17, 23), (8, 8), (33, 31)]:
        img = _smooth_img(h, w, seed=h * 100 + w)
        payload = jpeg_bytes(img, quality=85, subsample="420")
        a = jpeg_decode(payload)
        b = jpeg_decode(payload)
        assert a.shape == (h, w, 3)
        assert np.array_equal(a, b)


def test_jpeg_rejects_unsupported_and_malformed():
    from tl_spark.operators.jpeg import jpeg_bytes, jpeg_decode

    img = _smooth_img(16, 16)
    good = bytearray(jpeg_bytes(img, quality=90))
    with pytest.raises(ValueError, match="not a JPEG"):
        jpeg_decode(b"\x89PNG" + bytes(good[2:]))
    # flip SOF0 -> SOF3 (lossless; progressive SOF2 is supported now)
    sof = bytes(good).find(b"\xff\xc0")
    lossless = bytearray(good)
    lossless[sof + 1] = 0xC3
    with pytest.raises(ValueError, match="SOF3"):
        jpeg_decode(bytes(lossless))
    # truncated segment
    with pytest.raises(ValueError, match="truncated|missing"):
        jpeg_decode(bytes(good[: sof + 6]))


def test_jpeg_payloads_decode_for_real_in_spark(spark):
    """Baseline JPEG payloads take the REAL decode path in
    image_features even with decode_stub='error': features equal a
    local decode of the identical payload (decode determinism), and
    the decoded gray plane is PSNR-close to the pre-encode original."""
    from tl_spark.operators.jpeg import jpeg_decode
    from tl_spark.operators.multimodal import (
        image_features,
        synth_jpeg_media,
    )

    media = synth_jpeg_media(spark, n_rows=9, width=48, height=32, seed=42)
    got = {
        r["media_id"]: (list(r["hist16"]), r["mean_px"], r["std_px"])
        for r in image_features(media, decode_stub="error").collect()
    }
    payloads = {
        r["media_id"]: bytes(r["payload"]) for r in media.collect()
    }
    assert len(got) == 9
    for i in range(9):
        rgb = jpeg_decode(payloads[i])
        gray = (rgb.astype(np.uint16).sum(axis=2) // 3).astype(np.uint8)
        hist = [int(x) for x in np.bincount(gray.ravel() >> 4, minlength=16)]
        assert got[i][0] == hist, f"media {i}: histogram mismatch"
        assert got[i][1] == float(gray.mean())
        assert got[i][2] == float(gray.std())


def test_progressive_jpeg_equals_baseline_exactly():
    """jpeg_bytes_progressive shares jpeg_bytes' quantization front
    half, so decoding its SOF2 multi-scan stream (spectral selection +
    successive approximation: DC first/refine, AC first at Al 1-2, AC
    refine with correction bits, EOB runs, ZRL) must recover the SAME
    quantized coefficients on the visible block grid — and the SAME
    pixels — as the baseline encoding. Exactness across a completely
    different scan structure pins the whole progressive path."""
    from tl_spark.operators.jpeg import (
        jpeg_bytes,
        jpeg_bytes_progressive,
        jpeg_decode,
        jpeg_decode_coefficients,
    )

    img = _smooth_img(45, 61)
    for sub in ("444", "420"):
        for q in (25, 75, 95):
            sink_b, sink_p = [], []
            base = jpeg_bytes(
                img, quality=q, subsample=sub, _coef_sink=sink_b
            )
            prog = jpeg_bytes_progressive(
                img, quality=q, subsample=sub, _coef_sink=sink_p
            )
            assert all(
                np.array_equal(a, b) for a, b in zip(sink_b, sink_p)
            )
            fb, cb, _ = jpeg_decode_coefficients(base)
            _, cp, _ = jpeg_decode_coefficients(prog)
            for ci, c in enumerate(fb["comps"]):
                bw, bh = c["_bw"], c["_bh"]
                assert np.array_equal(
                    cb[ci][:bh, :bw], cp[ci][:bh, :bw]
                ), (sub, q, ci)
            assert np.array_equal(jpeg_decode(base), jpeg_decode(prog))


def test_progressive_jpeg_long_eob_runs():
    """A mostly-flat image at low quality produces multi-block EOB
    runs in the AC-first scans (run > 1 requires the EOBn extra-bits
    path); decode must still be coefficient-exact."""
    import numpy as np

    from tl_spark.operators.jpeg import (
        jpeg_bytes,
        jpeg_bytes_progressive,
        jpeg_decode,
        jpeg_decode_coefficients,
    )

    img = np.full((64, 64, 3), 120, np.uint8)
    img[30:34, 30:34] = 250  # one feature so not everything is EOB
    base = jpeg_bytes(img, quality=25, subsample="420")
    prog = jpeg_bytes_progressive(img, quality=25, subsample="420")
    fb, cb, _ = jpeg_decode_coefficients(base)
    _, cp, _ = jpeg_decode_coefficients(prog)
    for ci, c in enumerate(fb["comps"]):
        bw, bh = c["_bw"], c["_bh"]
        assert np.array_equal(cb[ci][:bh, :bw], cp[ci][:bh, :bw])
    assert np.array_equal(jpeg_decode(base), jpeg_decode(prog))
