"""Multimodal plumbing + parse_nodes + embedding near-dup pairs."""

import pyspark.sql.functions as F
import pytest


def test_media_meta_and_image_features(spark):
    from tl_spark.operators.multimodal import image_features, synth_media

    media = synth_media(spark, n_rows=60)
    assert dict(media.dtypes)["payload"] == "binary"
    feats = image_features(media, decode_stub="fake")
    rows = feats.collect()
    assert len(rows) == 60
    for r in rows:
        assert len(r["hist16"]) == 16
        assert 0.0 <= r["mean_px"] <= 255.0
        # histogram sums to pixel count (width*height from metadata)
    # determinism: same seed -> same values
    again = image_features(synth_media(spark, n_rows=60), decode_stub="fake")
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))


def test_image_decode_stub_errors_by_default(spark):
    from tl_spark.operators.multimodal import image_features, synth_media

    media = synth_media(spark, n_rows=4)
    with pytest.raises(Exception) as ei:
        image_features(media).collect()
    assert "NotImplementedError" in str(ei.value) or "codec" in str(ei.value)


def test_frame_sampling_row_expansion(spark):
    from tl_spark.operators.multimodal import sample_frames, synth_media

    media = synth_media(spark, n_rows=120)
    n_videos = media.filter(F.col("media.media_type") == "video").count()
    frames = sample_frames(media, every_k=10, decode_stub="fake")
    got = frames.collect()
    assert n_videos > 0
    assert {r["media_id"] for r in got} == {
        r["media_id"]
        for r in media.filter(F.col("media.media_type") == "video").collect()
    }
    # every kept frame index is a multiple of k and within n_frames
    meta = {
        r["media_id"]: r["media"]["n_frames"]
        for r in media.collect()
    }
    for r in got:
        assert r["frame_idx"] % 10 == 0
        assert r["frame_idx"] < meta[r["media_id"]]


def test_parse_nodes_dataframe(spark):
    from tl_spark.functions.extract import parse_nodes

    df = spark.createDataFrame(
        [
            (1, "<p>test</p><div><span>test2</span></div>"),
            (2, "plain"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    out = parse_nodes(df).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    d1 = sorted(by_doc[1], key=lambda r: r["node_idx"])
    assert [r["kind"] for r in d1] == [0, 1, 0, 0, 1]
    assert [r["name"] for r in d1] == ["p", None, "div", "span", None]
    assert [r["parent"] for r in d1] == [-1, 0, -1, 2, 3]
    assert (d1[0]["start"], d1[0]["end"]) == (0, 10)
    assert len(by_doc[2]) == 1 and by_doc[2][0]["kind"] == 1
    assert 3 not in by_doc  # empty doc -> zero nodes


def test_embedding_neardup_pairs(spark):
    from tl_spark.operators.similarity import embedding_neardup_pairs

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    # plant an exact duplicate vector pair
    twin = e.limit(1).select(
        (F.col("vec_id") + 900000).alias("vec_id"),
        F.col("embedding"),
        F.col("label"),
    )
    base_id = e.limit(1).collect()[0]["vec_id"]
    corpus = e.unionByName(twin)
    pairs = embedding_neardup_pairs(corpus, threshold=0.999)
    got = {(r["id_a"], r["id_b"]): r["cosine"] for r in pairs.collect()}
    assert (base_id, base_id + 900000) in got
    assert abs(got[(base_id, base_id + 900000)] - 1.0) < 1e-5


# ------------------------------------------------- round-3 additions


def test_ppm_payloads_decode_for_real(spark):
    """P6/PPM payloads take the REAL decode path (pure numpy, no codec
    lib) even with decode_stub='error': features equal ground truth
    recomputed locally from the identically-seeded rasters."""
    import numpy as np

    from tl_spark.operators.multimodal import image_features, synth_ppm_media

    W, H, SEED = 16, 12, 42
    media = synth_ppm_media(spark, n_rows=20, width=W, height=H, seed=SEED)
    got = {
        r["media_id"]: (list(r["hist16"]), r["mean_px"], r["std_px"])
        for r in image_features(media, decode_stub="error").collect()
    }
    assert len(got) == 20
    for i in range(20):
        rng = np.random.default_rng(SEED * 1000003 + i)
        raster = rng.integers(0, 256, size=(H, W, 3), dtype=np.uint8)
        gray = (raster.astype(np.uint16).sum(axis=2) // 3).astype(np.uint8)
        hist = [int(x) for x in np.bincount(gray.ravel() >> 4, minlength=16)]
        assert got[i][0] == hist, f"media {i}: histogram mismatch"
        assert got[i][1] == float(gray.mean())
        assert got[i][2] == float(gray.std())


def test_bmp_payloads_decode_for_real(spark):
    """Uncompressed 24-bpp BMP payloads (both bottom-up and top-down
    rasters, 4-byte row padding) take the REAL decode path even with
    decode_stub='error': features equal ground truth recomputed from
    the identically-seeded rasters. Width 15 forces nonzero padding."""
    import numpy as np

    from tl_spark.operators.multimodal import image_features, synth_bmp_media

    W, H, SEED = 15, 12, 42
    media = synth_bmp_media(spark, n_rows=20, width=W, height=H, seed=SEED)
    got = {
        r["media_id"]: (list(r["hist16"]), r["mean_px"], r["std_px"])
        for r in image_features(media, decode_stub="error").collect()
    }
    assert len(got) == 20
    for i in range(20):
        rng = np.random.default_rng(SEED * 1000003 + i)
        raster = rng.integers(0, 256, size=(H, W, 3), dtype=np.uint8)
        gray = (raster.astype(np.uint16).sum(axis=2) // 3).astype(np.uint8)
        hist = [int(x) for x in np.bincount(gray.ravel() >> 4, minlength=16)]
        assert got[i][0] == hist, f"media {i}: histogram mismatch"
        assert got[i][1] == float(gray.mean())
        assert got[i][2] == float(gray.std())


def test_bmp_roundtrip_and_rejects_malformed():
    """bmp_bytes -> _parse_bmp round-trips pixels exactly in both row
    orders; compressed/other-bpp BMPs raise ValueError (they stay on
    the stub policy), truncated rasters raise too."""
    import numpy as np
    import pytest as _pytest

    from tl_spark.operators.multimodal import _parse_bmp, bmp_bytes

    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    for td in (False, True):
        assert np.array_equal(_parse_bmp(bmp_bytes(rgb, top_down=td)), rgb)
    good = bytearray(bmp_bytes(rgb))
    bad_bpp = bytearray(good)
    bad_bpp[28] = 32  # bpp field
    with _pytest.raises(ValueError, match="bpp=32"):
        _parse_bmp(bytes(bad_bpp))
    bad_comp = bytearray(good)
    bad_comp[30] = 1  # BI_RLE8
    with _pytest.raises(ValueError, match="compression=1"):
        _parse_bmp(bytes(bad_comp))
    with _pytest.raises(ValueError, match="truncated"):
        _parse_bmp(bytes(good[:-4]))
    with _pytest.raises(ValueError, match="not a BMP"):
        _parse_bmp(b"XX" + bytes(good[2:]))


def test_gif_payloads_decode_for_real(spark):
    """GIF89a payloads — the first COMPRESSED format off the stub
    policy — take the REAL decode path (LZW + interlace + palette in
    pure Python/numpy) even with decode_stub='error': features equal
    ground truth recomputed from the identically-seeded rasters across
    all four producer shapes (interlaced x compressed)."""
    import numpy as np

    from tl_spark.operators.multimodal import image_features, synth_gif_media

    W, H, NC, SEED = 16, 12, 64, 42
    media = synth_gif_media(
        spark, n_rows=20, width=W, height=H, n_colors=NC, seed=SEED
    )
    got = {
        r["media_id"]: (list(r["hist16"]), r["mean_px"], r["std_px"])
        for r in image_features(media, decode_stub="error").collect()
    }
    assert len(got) == 20
    for i in range(20):
        rng = np.random.default_rng(SEED * 1000003 + i)
        palette = rng.integers(0, 256, size=(NC, 3), dtype=np.uint8)
        idx = rng.integers(0, NC, size=(H, W), dtype=np.uint8)
        rgb = palette[idx]
        gray = (rgb.astype(np.uint16).sum(axis=2) // 3).astype(np.uint8)
        hist = [int(x) for x in np.bincount(gray.ravel() >> 4, minlength=16)]
        assert got[i][0] == hist, f"media {i}: histogram mismatch"
        assert got[i][1] == float(gray.mean())
        assert got[i][2] == float(gray.std())


def test_gif_roundtrip_all_shapes():
    """gif_bytes -> _parse_gif round-trips pixels exactly across
    raster sizes, palette sizes (width-growth from small min-code-
    sizes), interlacing, real-LZW vs uncompressed-LZW producers, the
    4096-entry dictionary cap (deferred-clear stream), and the KwKwK
    self-referential code case (long runs)."""
    import numpy as np

    from tl_spark.operators.multimodal import _parse_gif, gif_bytes

    rng = np.random.default_rng(7)
    for trial in range(10):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        nc = int(rng.integers(2, 257))
        palette = rng.integers(0, 256, size=(nc, 3), dtype=np.uint8)
        idx = rng.integers(0, nc, size=(h, w), dtype=np.uint8)
        for inter in (False, True):
            for comp in (False, True):
                payload = gif_bytes(idx, palette, interlaced=inter, compress=comp)
                assert np.array_equal(_parse_gif(payload), palette[idx]), (
                    trial, inter, comp,
                )
    # dictionary cap: 8192 random pixels push next_code past 4096
    palette = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, size=(64, 128), dtype=np.uint8)
    for comp in (False, True):
        payload = gif_bytes(idx, palette, compress=comp)
        assert np.array_equal(_parse_gif(payload), palette[idx]), f"cap {comp}"
    # KwKwK: repetitive rows build deep chains immediately
    idx = np.zeros((32, 32), dtype=np.uint8)
    idx[::2] = 1
    assert np.array_equal(_parse_gif(gif_bytes(idx, palette[:4])), palette[:4][idx])


def test_animated_gif_frame_sampling_is_real(spark):
    """sample_frames takes the REAL decode path for GIF payloads (the
    header is authoritative, whatever the synthetic media_type says):
    every every_k-th frame's grayscale mean equals ground truth
    recomputed from the identically-seeded frame rasters."""
    import numpy as np

    from tl_spark.operators.multimodal import (
        sample_frames,
        synth_animated_gif_media,
    )

    W, H, NF, NC, SEED, K = 16, 12, 12, 32, 42, 5
    media = synth_animated_gif_media(
        spark, n_rows=8, width=W, height=H, n_frames=NF, n_colors=NC, seed=SEED
    )
    rows = sample_frames(media, every_k=K, decode_stub="error").collect()
    got = {(r["media_id"], r["frame_idx"]): r["frame_mean"] for r in rows}
    expect_idx = list(range(0, NF, K))
    assert len(got) == 8 * len(expect_idx)
    for i in range(8):
        rng = np.random.default_rng(SEED * 1000003 + i)
        palette = rng.integers(0, 256, size=(NC, 3), dtype=np.uint8)
        frames = [
            rng.integers(0, NC, size=(H, W), dtype=np.uint8) for _ in range(NF)
        ]
        for fidx in expect_idx:
            rgb = palette[frames[fidx]]
            gray = (rgb.astype(np.uint16).sum(axis=2) // 3).astype(np.uint8)
            assert got[(i, fidx)] == float(gray.mean()), (i, fidx)


def test_gif_animation_composition_semantics():
    """Frame composition follows the GIF89a graphic-control rules:
    transparent pixels leave the previous screen visible (disposal 1)
    and disposal 2 restores the region to background before the next
    frame."""
    import numpy as np

    from tl_spark.operators.multimodal import (
        _parse_gif_frames,
        gif_animation_bytes,
    )

    palette = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
    )
    base = np.full((4, 4), 1, dtype=np.uint8)  # all red
    overlay = np.full((4, 4), 3, dtype=np.uint8)  # transparent where 3
    overlay[0, :] = 2  # top row green, rest transparent
    final = np.full((4, 4), 2, dtype=np.uint8)

    # disposal 1 on base: overlay's transparent pixels show base
    payload = gif_animation_bytes(
        [base, overlay, final],
        palette,
        gce=[(1, None), (1, 3), (1, None)],
    )
    f = list(_parse_gif_frames(payload))
    assert len(f) == 3
    assert np.array_equal(f[0], palette[base])
    want1 = palette[base].copy()
    want1[0, :] = palette[2]
    assert np.array_equal(f[1], want1)
    assert np.array_equal(f[2], palette[final])

    # disposal 2 on base: the region is CLEARED before the overlay, so
    # transparent pixels show background (black), not base
    payload2 = gif_animation_bytes(
        [base, overlay],
        palette,
        gce=[(2, None), (1, 3)],
    )
    f2 = list(_parse_gif_frames(payload2))
    want = np.zeros((4, 4, 3), dtype=np.uint8)
    want[0, :] = palette[2]
    assert np.array_equal(f2[1], want)

    # the still-image API stays = first frame
    from tl_spark.operators.multimodal import _parse_gif

    assert np.array_equal(_parse_gif(payload), palette[base])


def test_gif_disposal_3_restores_previous_screen():
    """Disposal 3 (restore-to-previous, VERDICT r4 item 5): after a
    disposal-3 frame is shown, its region reverts to the PRE-frame
    pixels — so a later transparent frame composes over the restored
    content, not over the disposal-3 frame. Hand-computed snapshots:
    frame0 all red (disposal 1); frame1 all green (disposal 3);
    frame2 transparent except one blue corner -> shows RED (restored)
    under the transparency, which leave-in-place would render GREEN."""
    import numpy as np

    from tl_spark.operators.multimodal import (
        _parse_gif_frames,
        gif_animation_bytes,
    )

    palette = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
    )
    f0 = np.full((4, 4), 1, dtype=np.uint8)  # red
    f1 = np.full((4, 4), 2, dtype=np.uint8)  # green, disposal 3
    f2 = np.zeros((4, 4), dtype=np.uint8)  # transparent where 0
    f2[0, 0] = 3  # one blue pixel
    payload = gif_animation_bytes(
        [f0, f1, f2],
        palette,
        gce=[(1, None), (3, None), (1, 0)],
    )
    snaps = list(_parse_gif_frames(payload))
    assert len(snaps) == 3
    assert np.array_equal(snaps[0], palette[f0])
    assert np.array_equal(snaps[1], palette[f1])
    want2 = palette[f0].copy()  # restored to frame-0 screen...
    want2[0, 0] = palette[3]  # ...plus the blue corner
    assert np.array_equal(snaps[2], want2)

    # disposal 3 with transparency in the d3 frame itself: the restore
    # must bring back the pre-frame region exactly, including pixels
    # the d3 frame never painted
    g1 = np.zeros((4, 4), dtype=np.uint8)
    g1[1, :] = 2  # green stripe, rest transparent
    payload_b = gif_animation_bytes(
        [f0, g1, f2],
        palette,
        gce=[(1, None), (3, 0), (1, 0)],
    )
    sb = list(_parse_gif_frames(payload_b))
    want1 = palette[f0].copy()
    want1[1, :] = palette[2]
    assert np.array_equal(sb[1], want1)
    assert np.array_equal(sb[2], want2)  # full restore, blue corner


def test_gif_parser_rejects_malformed():
    import numpy as np
    import pytest as _pytest

    from tl_spark.operators.multimodal import _parse_gif, gif_bytes

    rng = np.random.default_rng(5)
    palette = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    idx = rng.integers(0, 8, size=(6, 6), dtype=np.uint8)
    good = gif_bytes(idx, palette)
    with _pytest.raises(ValueError, match="not a GIF"):
        _parse_gif(b"GIF90a" + good[6:])
    with _pytest.raises(ValueError, match="truncated"):
        _parse_gif(good[:20])
    with _pytest.raises(ValueError, match="no image"):
        _parse_gif(good[:13] + bytes(palette_size_bytes(good)) + b"\x3b")
    # palette index beyond the declared color table: palette of 2
    # entries (k=1) but min-code-size 2 makes literal 3 a VALID LZW
    # code — the decoder must reject it at palette-lookup time
    bad_idx = np.full((4, 4), 3, dtype=np.uint8)
    with _pytest.raises(ValueError, match="palette index"):
        _parse_gif(gif_bytes(bad_idx, palette[:2]))


def palette_size_bytes(payload):
    packed = payload[10]
    return payload[13 : 13 + 3 * (2 << (packed & 7))]


def test_ppm_parser_rejects_malformed(spark):
    """Truncated rasters and unsupported maxval raise ValueError; a
    non-PPM payload under decode_stub='error' still raises
    NotImplementedError (compressed formats stay honestly stubbed)."""
    import pytest as _pytest

    from tl_spark.operators.multimodal import _decode_image, _parse_ppm

    with _pytest.raises(ValueError, match="truncated"):
        _parse_ppm(b"P6\n4 4\n255\n" + b"\x00" * 10)
    with _pytest.raises(ValueError, match="maxval"):
        _parse_ppm(b"P6\n2 2\n65535\n" + b"\x00" * 24)
    with _pytest.raises(NotImplementedError):
        _decode_image(b"\x89PNG....", 4, 4, "error")


def test_wav_payloads_decode_for_real(spark):
    """RIFF/WAV PCM16 payloads take the REAL audio decode path even
    with decode_stub='error': features equal ground truth recomputed
    locally from the identically-seeded clips."""
    import numpy as np

    from tl_spark.operators.multimodal import audio_features, synth_wav_media

    N, RATE, SEED = 800, 8000, 42
    media = synth_wav_media(spark, n_rows=10, n_samples=N, rate=RATE, seed=SEED)
    got = {
        r["media_id"]: (r["duration_ms"], r["rms"], r["zcr"], r["peak"])
        for r in audio_features(media, decode_stub="error").collect()
    }
    assert len(got) == 10
    for i in range(10):
        rng = np.random.default_rng(SEED * 7919 + i)
        t = np.arange(N)
        freq = 100 + (i % 10) * 50
        wave = 8000 * np.sin(2 * np.pi * freq * t / RATE)
        wave = (wave + rng.integers(-500, 500, N)).astype("<i2")
        mono = wave.astype(np.float64)
        rms = round(float(np.sqrt(np.mean(mono**2))), 6)
        zcr = round(
            float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))), 6
        )
        assert got[i] == (
            int(round(N * 1000 / RATE)),
            rms,
            zcr,
            int(np.abs(wave).max()),
        ), f"clip {i}"


def test_ppm_header_comments_are_spec_valid():
    """ADVICE r3: '#' comment lines between PPM header tokens are
    spec-valid; the parser must skip them (including comments that
    contain digits) and still locate the raster after exactly one
    whitespace byte past maxval."""
    import numpy as np

    from tl_spark.operators.multimodal import _parse_ppm

    raster = bytes(range(2 * 2 * 3))
    plain = b"P6\n2 2\n255\n" + raster
    commented = b"P6\n# made by tool 99\n2 # width\n2\n# 777\n255\n" + raster
    a, b = _parse_ppm(plain), _parse_ppm(commented)
    assert a.shape == b.shape == (2, 2, 3)
    assert np.array_equal(a, b)


def test_wav_peak_full_scale_negative_clip(spark):
    """ADVICE r3: np.abs on int16 wraps -32768 to -32768; peak must be
    computed on a widened dtype so a full-scale-negative clip reports
    32768."""
    import struct

    import numpy as np

    from tl_spark.operators.multimodal import audio_features

    wave = np.full(16, -32768, dtype="<i2")
    data = wave.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    payload = b"RIFF" + struct.pack("<I", len(chunks)) + chunks
    df = spark.createDataFrame(
        [(0, payload)], "media_id long, payload binary"
    )
    row = audio_features(df, decode_stub="error").collect()[0]
    assert row["peak"] == 32768


def test_wav_parser_rejects_malformed():
    """Truncated chunks, non-PCM formats and stray bytes raise
    ValueError; non-RIFF payloads under decode_stub='error' raise
    NotImplementedError (compressed audio stays honestly stubbed)."""
    import struct

    import pytest as _pytest

    from tl_spark.operators.multimodal import _parse_wav

    with _pytest.raises(ValueError, match="RIFF"):
        _parse_wav(b"OggS....")
    # valid RIFF but fmt says IEEE float (3), not PCM (1)
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 16000, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", 4) + b"\x00" * 4
    with _pytest.raises(ValueError, match="PCM16"):
        _parse_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    # truncated data chunk
    body2 = b"WAVE" + b"data" + struct.pack("<I", 100) + b"\x00" * 10
    with _pytest.raises(ValueError, match="truncated"):
        _parse_wav(b"RIFF" + struct.pack("<I", len(body2)) + body2)


def test_resize_images_ppm_ground_truth(spark):
    """resize_images on real PPM payloads equals the locally computed
    nearest-neighbor downsample of the identically-seeded rasters;
    output plane is exactly out_h*out_w bytes."""
    import numpy as np

    from tl_spark.operators.multimodal import resize_images, synth_ppm_media

    W, H, SEED, OW, OH = 16, 12, 42, 6, 4
    media = synth_ppm_media(spark, n_rows=8, width=W, height=H, seed=SEED)
    got = {
        r["media_id"]: (r["pixels"], r["out_w"], r["out_h"], r["mean_px"])
        for r in resize_images(
            media, out_w=OW, out_h=OH, decode_stub="error"
        ).collect()
    }
    assert len(got) == 8
    for i in range(8):
        rng = np.random.default_rng(SEED * 1000003 + i)
        raster = rng.integers(0, 256, size=(H, W, 3), dtype=np.uint8)
        gray = (raster.astype(np.uint16).sum(axis=2) // 3).astype(np.uint8)
        ys = np.minimum((np.arange(OH) * H) // OH, H - 1)
        xs = np.minimum((np.arange(OW) * W) // OW, W - 1)
        small = gray[np.ix_(ys, xs)]
        blob, ow, oh, mean = got[i]
        assert bytes(blob) == small.tobytes()
        assert (ow, oh) == (OW, OH) and len(bytes(blob)) == OW * OH
        assert mean == float(small.mean())


def test_png_payloads_decode_for_real(spark):
    """8-bit RGB PNG payloads (per-row filters cycling 0-4, odd ids
    Adam7-interlaced, multi-IDAT streams) take the REAL decode path
    (stdlib zlib + numpy unfiltering) even with decode_stub='error':
    features equal ground truth recomputed from the identically-seeded
    rasters. Width/height not multiples of 8 stress the interlace
    edge passes."""
    import numpy as np

    from tl_spark.operators.multimodal import image_features, synth_png_media

    W, H, SEED = 17, 13, 42
    media = synth_png_media(spark, n_rows=20, width=W, height=H, seed=SEED)
    got = {
        r["media_id"]: (list(r["hist16"]), r["mean_px"], r["std_px"])
        for r in image_features(media, decode_stub="error").collect()
    }
    assert len(got) == 20
    for i in range(20):
        rng = np.random.default_rng(SEED * 1000003 + i)
        raster = rng.integers(0, 256, size=(H, W, 3), dtype=np.uint8)
        gray = (raster.astype(np.uint16).sum(axis=2) // 3).astype(np.uint8)
        hist = [int(x) for x in np.bincount(gray.ravel() >> 4, minlength=16)]
        assert got[i][0] == hist, f"media {i}: histogram mismatch"
        assert got[i][1] == float(gray.mean())
        assert got[i][2] == float(gray.std())


def test_png_roundtrip_all_color_types_filters_interlace():
    """png_bytes -> _parse_png round-trips every supported combination:
    color types 0/2/3/4/6 x filters 0-4 (and mixed cycles) x
    {non-interlaced, Adam7}, plus tiny shapes where some Adam7 passes
    are empty. Alpha drops; gray replicates; palette resolves."""
    import numpy as np

    from tl_spark.operators.multimodal import _parse_png, png_bytes

    rng = np.random.default_rng(7)
    h, w = 13, 17
    rgb = rng.integers(0, 256, (h, w, 3), np.uint8)
    gray = rng.integers(0, 256, (h, w), np.uint8)
    rgba = rng.integers(0, 256, (h, w, 4), np.uint8)
    ga = rng.integers(0, 256, (h, w, 2), np.uint8)
    pal = rng.integers(0, 256, (256, 3), np.uint8)
    idx = rng.integers(0, 256, (h, w), np.uint8)
    for il in (False, True):
        for ft in (0, 1, 2, 3, 4, [0, 1, 2, 3, 4], [4, 3, 2, 1, 0]):
            assert np.array_equal(
                _parse_png(png_bytes(rgb, 2, ft, il)), rgb
            ), (il, ft)
        assert np.array_equal(
            _parse_png(png_bytes(gray, 0, 4, il)),
            np.repeat(gray[:, :, None], 3, 2),
        )
        assert np.array_equal(
            _parse_png(png_bytes(rgba, 6, 4, il)), rgba[:, :, :3]
        )
        assert np.array_equal(
            _parse_png(png_bytes(ga, 4, 3, il)),
            np.repeat(ga[:, :, :1], 3, 2),
        )
        assert np.array_equal(
            _parse_png(png_bytes(idx, 3, 2, il, palette=pal)), pal[idx]
        )
    for hh, ww in [(1, 1), (2, 3), (3, 2), (7, 9), (8, 8), (1, 20), (20, 1)]:
        a = rng.integers(0, 256, (hh, ww, 3), np.uint8)
        for il in (False, True):
            assert np.array_equal(
                _parse_png(png_bytes(a, 2, [0, 1, 2, 3, 4], il)), a
            ), (hh, ww, il)


def test_png_parser_rejects_malformed():
    """Bad signature, corrupted chunk (CRC), truncation, unsupported
    bit depth, and missing PLTE for a paletted image all raise
    ValueError; non-PNG payloads stay on the stub policy."""
    import numpy as np
    import pytest as _pytest

    from tl_spark.operators.multimodal import (
        _decode_image,
        _parse_png,
        png_bytes,
    )

    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, (7, 5, 3), np.uint8)
    good = bytearray(png_bytes(rgb))
    with _pytest.raises(ValueError, match="not a PNG"):
        _parse_png(b"\x89PNX" + bytes(good[4:]))
    bad = bytearray(good)
    bad[30] ^= 0xFF
    with _pytest.raises(ValueError, match="CRC"):
        _parse_png(bytes(bad))
    with _pytest.raises(ValueError, match="truncated|missing"):
        _parse_png(bytes(good[: len(good) - 20]))
    deep = bytearray(good)
    deep[24] = 4  # IHDR bit-depth byte (16 is SUPPORTED now; 4 is not)
    # CRC must be recomputed or the corruption reads as a CRC error
    import struct
    import zlib

    ihdr = bytes(deep[16:29])
    deep[29:33] = struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    with _pytest.raises(ValueError, match="depth=4"):
        _parse_png(bytes(deep))
    idx = rng.integers(0, 4, (4, 4), np.uint8)
    pal = rng.integers(0, 256, (4, 3), np.uint8)
    paletted = png_bytes(idx, 3, 0, palette=pal)
    # strip the PLTE chunk (starts after IHDR at byte 33)
    plte_len = struct.unpack_from(">I", paletted, 33)[0]
    no_plte = paletted[:33] + paletted[33 + 12 + plte_len:]
    with _pytest.raises(ValueError, match="PLTE"):
        _parse_png(no_plte)
    # unsupported-format payload (WebP magic) under the error policy
    # -> NotImplementedError (JPEG and TIFF now decode for real, so
    # their magics no longer reach the stub)
    with _pytest.raises(NotImplementedError):
        _decode_image(b"RIFF\x04\x00\x00\x00WEBP", 4, 4, "error")


def test_g711_decode_tables_match_itu_formulas():
    """The vectorized mu-law/A-law decode LUTs equal the classic
    public-domain g711.c expansion formulas, re-derived here with
    independent scalar code for all 256 codes."""
    from tl_spark.operators.multimodal import _ALAW_LUT, _ULAW_LUT

    for c in range(256):
        u = (~c) & 0xFF
        t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
        assert int(_ULAW_LUT[c]) == ((0x84 - t) if (u & 0x80) else (t - 0x84))
        a = c ^ 0x55
        seg = (a & 0x70) >> 4
        q = (a & 0x0F) << 4
        m = q + 8 if seg == 0 else (q + 0x108) << max(seg - 1, 0)
        assert int(_ALAW_LUT[c]) == (m if (a & 0x80) else -m)


def test_g711_wav_roundtrip_nearest_code():
    """wav_bytes(fmt 6/7) -> _parse_wav returns, for every input
    sample, a decoded value at least as close as the best code in the
    table (the encoder is an exact nearest-code quantizer)."""
    import numpy as np

    from tl_spark.operators.multimodal import (
        _ALAW_LUT,
        _ULAW_LUT,
        _parse_wav,
        wav_bytes,
    )

    rng = np.random.default_rng(11)
    x = rng.integers(-32768, 32768, (300, 1), np.int16)
    for fmt, lut in ((6, _ALAW_LUT), (7, _ULAW_LUT)):
        dec, rate = _parse_wav(wav_bytes(x, 8000, fmt))
        assert rate == 8000 and dec.shape == x.shape
        vals = np.unique(lut.astype(np.int32))
        best = vals[np.argmin(np.abs(vals[None, :] - x.astype(np.int32)), 1)]
        assert (
            np.abs(dec.ravel().astype(np.int32) - x.ravel())
            <= np.abs(best - x.ravel())
        ).all()


def test_ima_adpcm_decode_matches_independent_reference():
    """wav_bytes(fmt 0x11) encodes with the spec quantizer; _parse_wav
    must reproduce, bit-exactly, an independently-written scalar IMA
    decoder on the same block stream — mono and stereo, including the
    padded tail block."""
    import struct

    import numpy as np

    from tl_spark.operators.multimodal import (
        _IMA_INDEX,
        _IMA_STEPS,
        _parse_wav,
        wav_bytes,
    )

    def ref_decode(data, channels, block_align):
        chans = [[] for _ in range(channels)]
        for b0 in range(0, len(data), block_align):
            blk = data[b0 : b0 + block_align]
            st = []
            for c in range(channels):
                p = int.from_bytes(blk[4 * c : 4 * c + 2], "little", signed=True)
                st.append([p, blk[4 * c + 2]])
                chans[c].append(p)
            body = blk[4 * channels :]
            for w0 in range(0, len(body), 4):
                c = (w0 // 4) % channels
                for byte in body[w0 : w0 + 4]:
                    for nib in (byte & 15, byte >> 4):
                        p, i = st[c]
                        s = int(_IMA_STEPS[i])
                        d = s >> 3
                        if nib & 1:
                            d += s >> 2
                        if nib & 2:
                            d += s >> 1
                        if nib & 4:
                            d += s
                        p = p - d if nib & 8 else p + d
                        p = max(-32768, min(32767, p))
                        i = max(0, min(88, i + int(_IMA_INDEX[nib & 7])))
                        st[c] = [p, i]
                        chans[c].append(p)
        n = min(len(ch) for ch in chans)
        return np.array([ch[:n] for ch in chans], np.int16).T

    t = np.arange(373)  # NOT a multiple of samples-per-block
    for ch in (1, 2):
        sig = np.stack(
            [
                (6000 * np.sin(2 * np.pi * t * (0.01 + 0.005 * c))).astype(
                    np.int16
                )
                for c in range(ch)
            ],
            axis=1,
        )
        payload = wav_bytes(sig, 8000, 0x11)
        dec, rate = _parse_wav(payload)
        pos, data, fmtc = 12, None, None
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            if cid == b"fmt ":
                fmtc = struct.unpack_from("<HHIIHH", payload, pos + 8)
            if cid == b"data":
                data = payload[pos + 8 : pos + 8 + size]
            pos += 8 + size + (size & 1)
        assert np.array_equal(dec, ref_decode(data, ch, fmtc[4]))
        # adaptation error is bounded: the decoded prefix tracks the
        # original within a generous envelope (sanity, not exactness)
        err = np.abs(
            dec[: len(sig)].astype(np.int32) - sig.astype(np.int32)
        ).max()
        assert err < 4000, err


def test_compressed_wav_payloads_decode_for_real(spark):
    """G.711 and IMA ADPCM WAV payloads take the REAL decode path in
    audio_features even with decode_stub='error': features equal
    ground truth computed locally from the same encode->decode."""
    import numpy as np

    from tl_spark.operators.multimodal import (
        _parse_wav,
        audio_features,
        synth_compressed_wav_media,
    )

    N, RATE, SEED = 400, 8000, 42
    media = synth_compressed_wav_media(
        spark, n_rows=12, n_samples=N, rate=RATE, seed=SEED
    )
    got = {
        r["media_id"]: (r["duration_ms"], r["rms"], r["zcr"], r["peak"])
        for r in audio_features(media, decode_stub="error").collect()
    }
    assert len(got) == 12
    payloads = {
        r["media_id"]: bytes(r["payload"]) for r in media.collect()
    }
    for i in range(12):
        samples, rate = _parse_wav(payloads[i])
        mono = samples.astype(np.float64).mean(axis=1)
        n = len(mono)
        exp = (
            int(round(n * 1000 / rate)),
            round(float(np.sqrt(np.mean(mono**2))), 6),
            round(
                float(
                    np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))
                ),
                6,
            ),
            int(np.abs(samples.astype(np.int32)).max()),
        )
        assert got[i] == exp, f"media {i}: {got[i]} != {exp}"


def test_wav_parser_rejects_unsupported_and_malformed():
    import numpy as np
    import pytest as _pytest

    from tl_spark.operators.multimodal import _parse_wav, wav_bytes

    sig = (np.arange(64) * 100).astype(np.int16)[:, None]
    good = bytearray(wav_bytes(sig, 8000, 0x11))
    # format tag nobody supports (e.g. MP3 = 0x55)
    bad_fmt = bytearray(wav_bytes(sig, 8000, 1))
    bad_fmt[20] = 0x55
    with _pytest.raises(ValueError, match="fmt=85"):
        _parse_wav(bytes(bad_fmt))
    # step index byte > 88 in the first ADPCM block header
    bad_idx = bytearray(good)
    bad_idx[46] = 99  # 44-byte RIFF/fmt preamble + 2-byte predictor
    with _pytest.raises(ValueError, match="> 88"):
        _parse_wav(bytes(bad_idx))


def test_avi_dib_roundtrip_exact_and_mjpg_consistent():
    """avi_bytes('DIB ') -> _parse_avi_frames is pixel-lossless;
    MJPG frames equal the standalone JPEG codec on the same encode;
    stripping DHT (MJPEG convention) decodes identically via the
    Annex-K fallback."""
    import numpy as np

    from tl_spark.operators.jpeg import jpeg_bytes, jpeg_decode
    from tl_spark.operators.multimodal import _parse_avi_frames, avi_bytes

    yy, xx = np.mgrid[0:24, 0:32]
    frames = [
        (128 + 90 * np.sin(xx / 5 + k) * np.cos(yy / 4))
        .clip(0, 255)
        .astype(np.uint8)[..., None]
        .repeat(3, 2)
        for k in range(5)
    ]
    dec = list(_parse_avi_frames(avi_bytes(frames, codec="DIB ")))
    assert len(dec) == 5
    assert all(np.array_equal(a, b) for a, b in zip(dec, frames))

    full = avi_bytes(frames, codec="MJPG", quality=85)
    exp = [
        jpeg_decode(jpeg_bytes(f, quality=85, subsample="420"))
        for f in frames
    ]
    assert all(
        np.array_equal(a, b)
        for a, b in zip(_parse_avi_frames(full), exp)
    )
    stripped = avi_bytes(frames, codec="MJPG", quality=85, strip_dht=True)
    assert len(stripped) < len(full)
    assert all(
        np.array_equal(a, b)
        for a, b in zip(_parse_avi_frames(stripped), exp)
    )


def test_avi_parser_rejects_malformed():
    import numpy as np
    import pytest as _pytest

    from tl_spark.operators.multimodal import _parse_avi_frames, avi_bytes

    frames = [np.zeros((8, 8, 3), np.uint8)]
    good = avi_bytes(frames, codec="DIB ")
    with _pytest.raises(ValueError, match="not a RIFF/AVI"):
        list(_parse_avi_frames(b"RIFF\x08\x00\x00\x00WAVEdata"))
    with _pytest.raises(ValueError, match="truncated"):
        list(_parse_avi_frames(good[:100]))
    assert len(list(_parse_avi_frames(good, max_frames=1))) == 1


def test_avi_frame_sampling_is_real(spark):
    """AVI payloads take the REAL video path in sample_frames with
    decode_stub='error': per-frame grayscale means equal a local
    decode of the identical payloads, for DIB, MJPG, and
    DHT-stripped MJPG alike."""
    import numpy as np

    from tl_spark.operators.multimodal import (
        _parse_avi_frames,
        sample_frames,
        synth_avi_media,
    )

    media = synth_avi_media(spark, n_rows=6, n_frames=6)
    got = {
        (r["media_id"], r["frame_idx"]): r["frame_mean"]
        for r in sample_frames(
            media, every_k=2, decode_stub="error"
        ).collect()
    }
    payloads = {
        r["media_id"]: bytes(r["payload"]) for r in media.collect()
    }
    assert len(payloads) == 6
    expected = {}
    for i, p in payloads.items():
        for fidx, frame in enumerate(_parse_avi_frames(p)):
            if fidx % 2:
                continue
            gray = (frame.astype(np.uint16).sum(axis=2) // 3).astype(
                np.uint8
            )
            expected[(i, fidx)] = float(gray.mean())
    assert got == expected
    assert len(got) == 6 * 3  # 6 clips x frames 0,2,4


def test_tiff_roundtrip_all_shapes():
    """tiff_bytes -> _parse_tiff round-trips exactly across byte
    orders (II/MM), compressions (none/LZW/Deflate/PackBits),
    predictors (none/horizontal-differencing), strip layouts, and
    gray vs RGB; LZW survives the early-change width boundaries and
    table resets; PackBits compresses run-heavy rasters; malformed
    and unsupported inputs raise ValueError."""
    import numpy as np
    import pytest as _pytest

    from tl_spark.operators.multimodal import (
        _packbits_decode,
        _packbits_encode,
        _parse_tiff,
        tiff_bytes,
    )

    rng = np.random.default_rng(13)
    rgb = rng.integers(0, 256, (13, 17, 3), np.uint8)
    gray = rng.integers(0, 256, (13, 17), np.uint8)
    for bo in ("II", "MM"):
        for comp in (1, 5, 8, 32773):
            for pred in (1, 2):
                for rps in (None, 4):
                    assert np.array_equal(
                        _parse_tiff(tiff_bytes(rgb, bo, comp, rps, pred)),
                        rgb,
                    ), (bo, comp, pred, rps)
                    assert np.array_equal(
                        _parse_tiff(tiff_bytes(gray, bo, comp, rps, pred)),
                        np.repeat(gray[:, :, None], 3, 2),
                    ), (bo, comp, pred, rps)
    # LZW round-trips across code-width boundaries and table resets
    from tl_spark.operators.multimodal import (
        _tiff_lzw_decode,
        _tiff_lzw_encode,
    )

    for data in (
        b"aaaa",
        bytes(rng.integers(0, 4, 5000, np.uint8)),
        bytes(rng.integers(0, 256, 30000, np.uint8)),
        b"abc" * 8000,
    ):
        assert _tiff_lzw_decode(_tiff_lzw_encode(data), len(data)) == data
    # horizontal differencing makes smooth rasters compress better
    smooth = np.cumsum(
        rng.integers(0, 3, (13, 17, 3), np.uint8), axis=1
    ).astype(np.uint8)
    assert len(tiff_bytes(smooth, "II", 5, None, 2)) < len(
        tiff_bytes(smooth, "II", 5, None, 1)
    )
    for row in (b"\x00" * 300, bytes(range(200)), b"aaabbbccc" + b"z" * 130):
        assert _packbits_decode(_packbits_encode(row), len(row)) == row
    runny = np.repeat(rng.integers(0, 4, (13, 3, 3), np.uint8) * 60, 6, 1)
    assert len(tiff_bytes(runny, "II", 32773)) < len(tiff_bytes(runny))
    good = tiff_bytes(rgb)
    with _pytest.raises(ValueError, match="not a TIFF"):
        _parse_tiff(b"II+\x00" + good[4:])
    with _pytest.raises(ValueError):
        _parse_tiff(good[:40])


def test_tiff_payloads_decode_for_real(spark):
    """TIFF payloads take the REAL decode path in image_features even
    with decode_stub='error': features equal ground truth recomputed
    from the identically-seeded rasters across all producer shapes."""
    import numpy as np

    from tl_spark.operators.multimodal import image_features, synth_tiff_media

    W, H, SEED = 17, 13, 42
    media = synth_tiff_media(spark, n_rows=24, width=W, height=H, seed=SEED)
    got = {
        r["media_id"]: (list(r["hist16"]), r["mean_px"], r["std_px"])
        for r in image_features(media, decode_stub="error").collect()
    }
    assert len(got) == 24
    for i in range(24):
        rng = np.random.default_rng(SEED * 1000003 + i)
        if i % 5 == 0:
            gray = rng.integers(0, 256, (H, W), np.uint8)
        else:
            raster = rng.integers(0, 256, (H, W, 3), np.uint8)
            gray = (raster.astype(np.uint16).sum(axis=2) // 3).astype(
                np.uint8
            )
        hist = [int(x) for x in np.bincount(gray.ravel() >> 4, minlength=16)]
        assert got[i][0] == hist, f"media {i}: histogram mismatch"
        assert got[i][1] == float(gray.mean())
        assert got[i][2] == float(gray.std())


def test_audio_spectral_features_match_direct_dft(spark):
    """Spark-side spectral features equal a reference computed with an
    independent O(n^2) direct DFT (no np.fft) on the same decoded
    samples — pinning the rfft path, the bin-frequency mapping, and
    every descriptor formula. A pure sine's centroid must also land
    near its true frequency (physics sanity)."""
    import numpy as np

    from tl_spark.operators.multimodal import (
        _parse_wav,
        audio_spectral_features,
        synth_wav_media,
    )

    N, RATE = 256, 8000
    media = synth_wav_media(spark, n_rows=6, n_samples=N, rate=RATE, seed=42)
    got = {
        r["media_id"]: (
            r["centroid_hz"], r["bandwidth_hz"], r["flatness"],
            r["rolloff_hz"],
        )
        for r in audio_spectral_features(
            media, decode_stub="error"
        ).collect()
    }
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    assert len(got) == 6
    for i, p in payloads.items():
        samples, rate = _parse_wav(p)
        mono = samples.astype(np.float64).mean(axis=1)
        n = len(mono)
        # direct DFT, rfft bins only
        k = np.arange(n // 2 + 1)
        ang = -2j * np.pi * np.outer(k, np.arange(n)) / n
        m = np.abs((np.exp(ang) @ mono))
        f = k * rate / n
        tot = m.sum()
        centroid = (f * m).sum() / tot
        bandwidth = np.sqrt((((f - centroid) ** 2) * m).sum() / tot)
        body = m[1:]
        flat = (
            float(np.exp(np.mean(np.log(body))) / body.mean())
            if (body > 0).all()
            else 0.0
        )
        ro = f[int(np.searchsorted(np.cumsum(m), 0.85 * tot))]
        exp = (centroid, bandwidth, flat, ro)
        for a, b in zip(got[i], exp):
            assert abs(a - b) < 1e-4, (i, got[i], exp)

    # physics sanity on a NOISELESS sine (the synth clips carry
    # broadband noise, which legitimately drags a magnitude-weighted
    # centroid far above the tone): centroid ~ tone frequency
    from tl_spark.operators.multimodal import wav_bytes

    t = np.arange(2048)
    tone = (8000 * np.sin(2 * np.pi * 500 * t / RATE)).astype(np.int16)
    clean = spark.createDataFrame(
        [(99, bytearray(wav_bytes(tone[:, None], RATE, 1)))],
        "media_id long, payload binary",
    )
    row = audio_spectral_features(clean, decode_stub="error").collect()[0]
    assert abs(row["centroid_hz"] - 500) < 60, row["centroid_hz"]
    assert row["flatness"] < 0.5  # a tone is the opposite of flat


def test_media_on_error_skip_policy(spark):
    """on_error='skip': one corrupt payload in the batch drops its row
    instead of failing the whole task (the corpus-scale posture);
    on_error='raise' (default) still fails; bad policy values are
    rejected eagerly. Exercised for image, audio, spectral, resize,
    and frame-sampling ops."""
    import pyspark.sql.functions as F
    import pytest as _pytest
    import numpy as np

    from tl_spark.operators.multimodal import (
        attach_media_meta,
        audio_features,
        audio_spectral_features,
        avi_bytes,
        bmp_bytes,
        image_features,
        resize_images,
        sample_frames,
        wav_bytes,
    )

    rng = np.random.default_rng(5)
    good_img = bmp_bytes(rng.integers(0, 256, (8, 8, 3), np.uint8))
    corrupt_img = good_img[:30]  # truncated BMP
    imgs = attach_media_meta(
        spark.createDataFrame(
            [(1, bytearray(good_img)), (2, bytearray(corrupt_img))],
            "media_id long, payload binary",
        )
    )
    with _pytest.raises(Exception):
        image_features(imgs, decode_stub="error").collect()
    kept = image_features(imgs, decode_stub="error", on_error="skip").collect()
    assert [r["media_id"] for r in kept] == [1]
    kept = resize_images(imgs, decode_stub="error", on_error="skip").collect()
    assert [r["media_id"] for r in kept] == [1]
    with _pytest.raises(ValueError, match="on_error"):
        image_features(imgs, on_error="ignore")

    good_wav = wav_bytes(
        (1000 * np.ones(64, np.int16))[:, None], 8000, 1
    )
    bad_wav = good_wav[:20]  # truncated RIFF
    auds = spark.createDataFrame(
        [(1, bytearray(good_wav)), (2, bytearray(bad_wav))],
        "media_id long, payload binary",
    )
    kept = audio_features(auds, decode_stub="error", on_error="skip").collect()
    assert [r["media_id"] for r in kept] == [1]
    kept = audio_spectral_features(
        auds, decode_stub="error", on_error="skip"
    ).collect()
    assert [r["media_id"] for r in kept] == [1]
    with _pytest.raises(Exception):
        audio_features(auds, decode_stub="error").collect()

    frames = [np.zeros((8, 8, 3), np.uint8)] * 3
    good_avi = avi_bytes(frames, codec="DIB ")
    bad_avi = good_avi[:60]
    vids = attach_media_meta(
        spark.createDataFrame(
            [(1, bytearray(good_avi)), (2, bytearray(bad_avi))],
            "media_id long, payload binary",
        )
    )
    kept = sample_frames(
        vids, every_k=1, decode_stub="error", on_error="skip"
    ).collect()
    assert {r["media_id"] for r in kept} == {1}
    assert len(kept) == 3
    with _pytest.raises(Exception):
        sample_frames(vids, every_k=1, decode_stub="error").collect()


def test_decoders_never_leak_raw_exceptions():
    """Untrusted-payload boundary: arbitrary bytes behind every
    supported magic — random tails, truncations, and bit-flips of
    valid files — must either decode or raise ValueError /
    NotImplementedError, NEVER IndexError/struct.error/KeyError/...
    (those would bypass the on_error='skip' policy and kill a
    corpus-scale job)."""
    import numpy as np

    from tl_spark.operators.jpeg import jpeg_bytes
    from tl_spark.operators.multimodal import (
        _decode_image,
        _malformed_as_valueerror,
        _parse_wav,
        avi_bytes,
        bmp_bytes,
        gif_bytes,
        png_bytes,
        tiff_bytes,
        wav_bytes,
    )

    rng = np.random.default_rng(99)
    img = rng.integers(0, 256, (9, 11, 3), np.uint8)
    sig = rng.integers(-5000, 5000, (64, 1)).astype(np.int16)
    valid = [
        b"P6\n11 9\n255\n" + img.tobytes(),
        bmp_bytes(img),
        gif_bytes(
            np.ascontiguousarray(img[:, :, 0] % 64),
            rng.integers(0, 256, (64, 3), np.uint8),
        ),
        png_bytes(img),
        jpeg_bytes(img),
        tiff_bytes(img, compression=5, predictor=2),
    ]
    magics = [
        b"P6 ", b"BM", b"GIF89a", b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff",
        b"II*\x00", b"MM\x00*",
    ]
    payloads = []
    for m in magics:
        for ln in (0, 3, 17, 120):
            payloads.append(m + bytes(rng.integers(0, 256, ln, np.uint8)))
    for v in valid:
        for cut in (5, len(v) // 3, len(v) - 2):
            payloads.append(v[:cut])
        for _ in range(10):
            b = bytearray(v)
            for _ in range(3):
                b[int(rng.integers(0, len(b)))] ^= int(
                    rng.integers(1, 256)
                )
            payloads.append(bytes(b))
    ok = bad = 0
    for p in payloads:
        try:
            _decode_image(p, 4, 4, "error")
            ok += 1
        except (ValueError, NotImplementedError):
            bad += 1
    assert ok + bad == len(payloads)

    wav_payloads = [wav_bytes(sig, 8000, f) for f in (1, 6, 7, 0x11)]
    for v in wav_payloads:
        for cut in (5, 20, len(v) - 3):
            try:
                _malformed_as_valueerror(_parse_wav, v[:cut], "WAV")
            except (ValueError, NotImplementedError):
                pass


def test_png_16bit_depth_roundtrip():
    """depth=16 PNGs (all non-palette color types, every filter, both
    interlace modes) decode back to the 8-bit original via the
    high-byte reduction; filters operate on bpp = channels * 2 bytes
    per the spec. Palette at depth 16 is spec-invalid and rejected."""
    import numpy as np
    import pytest as _pytest

    from tl_spark.operators.multimodal import _parse_png, png_bytes

    rng = np.random.default_rng(7)
    h, w = 13, 17
    rgb = rng.integers(0, 256, (h, w, 3), np.uint8)
    gray = rng.integers(0, 256, (h, w), np.uint8)
    rgba = rng.integers(0, 256, (h, w, 4), np.uint8)
    ga = rng.integers(0, 256, (h, w, 2), np.uint8)
    for il in (False, True):
        for ft in (0, 1, 2, 3, 4, [0, 1, 2, 3, 4]):
            assert np.array_equal(
                _parse_png(png_bytes(rgb, 2, ft, il, depth=16)), rgb
            ), (il, ft)
        assert np.array_equal(
            _parse_png(png_bytes(gray, 0, 4, il, depth=16)),
            np.repeat(gray[:, :, None], 3, 2),
        )
        assert np.array_equal(
            _parse_png(png_bytes(rgba, 6, 3, il, depth=16)),
            rgba[:, :, :3],
        )
        assert np.array_equal(
            _parse_png(png_bytes(ga, 4, 2, il, depth=16)),
            np.repeat(ga[:, :, :1], 3, 2),
        )
    with _pytest.raises(ValueError, match="depth 16"):
        png_bytes(gray, 3, 0, palette=np.zeros((4, 3), np.uint8), depth=16)


def test_wav_pcm_bit_depths():
    """PCM WAV at 8/16/24 bits: 24-bit round-trips int16 exactly
    (top 16 of the widened 24 preserved), 8-bit preserves the high
    byte, and the unsupported-depth error path still fires."""
    import numpy as np
    import pytest as _pytest

    from tl_spark.operators.multimodal import _parse_wav, wav_bytes

    rng = np.random.default_rng(2)
    for ch in (1, 2):
        x = rng.integers(-32768, 32768, (100, ch)).astype(np.int16)
        d, r = _parse_wav(wav_bytes(x, 8000, 1, pcm_bits=24))
        assert np.array_equal(d, x)
        d, r = _parse_wav(wav_bytes(x, 8000, 1, pcm_bits=8))
        assert np.array_equal(
            d, (x.astype(np.int32) & 0xFFFFFF00).astype(np.int16)
        )
    bad = bytearray(wav_bytes(x, 8000, 1))
    bad[34] = 32  # bits-per-sample field
    with _pytest.raises(ValueError, match="bits=32"):
        _parse_wav(bytes(bad))
