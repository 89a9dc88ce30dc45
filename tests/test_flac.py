"""FLAC codec leg: lossless round-trip ground truth over the full
subframe/channel/residual grid, three integrity layers (CRC-8, CRC-16,
STREAMINFO MD5), mutation fuzz, and cross-checks against the WAV
decode path (same PCM, two containers, equal features).

See tl_spark/operators/flac.py's module docstring for why FLAC gets a
REAL decoder while MP3/AAC stay honest stubs."""

import random

import duckdb
import numpy as np
import pytest

from tl_spark.operators.flac import (
    flac_bytes,
    flac_decode,
    flac_stream_info,
    synth_flac_media,
    synth_pcm,
)


def _roundtrip(pcm, **kw):
    enc = flac_bytes(pcm, kw.pop("sample_rate", 44100), **kw)
    dec, sr = flac_decode(enc)
    assert dec.shape == (pcm.shape if pcm.ndim == 2 else pcm.reshape(-1, 1).shape)
    assert (dec == np.asarray(pcm).reshape(dec.shape).astype(np.int16)).all()
    return enc


@pytest.mark.parametrize(
    "strategy",
    ["auto", "constant", "verbatim", "fixed0", "fixed1", "fixed2",
     "fixed3", "fixed4", "lpc1", "lpc8", "lpc32"],
)
def test_roundtrip_every_subframe_type(strategy):
    pcm = (
        np.full((1500, 2), -7, dtype=np.int64)
        if strategy == "constant"
        else synth_pcm(3, 1500, 2)
    )
    _roundtrip(pcm, strategy=strategy, block_size=576)


@pytest.mark.parametrize(
    "mode", ["indep", "left_side", "right_side", "mid_side"]
)
def test_roundtrip_every_channel_assignment(mode):
    _roundtrip(synth_pcm(5, 2500, 2), channel_mode=mode, block_size=1152)


@pytest.mark.parametrize("nch", [1, 2, 3, 4, 8])
def test_roundtrip_channel_counts(nch):
    _roundtrip(synth_pcm(7, 2000, nch), block_size=1000)


@pytest.mark.parametrize(
    "bs,porder,rice2",
    [(192, 0, False), (576, 1, True), (1152, 2, False),
     (4096, 3, True), (1000, 2, False), (37, 0, False)],
)
def test_roundtrip_blocking_and_partitions(bs, porder, rice2):
    _roundtrip(
        synth_pcm(11, 2500, 2),
        block_size=bs,
        rice_partition_order=porder,
        rice2=rice2,
    )


def test_roundtrip_noise_hits_verbatim_fallback_territory():
    rng = np.random.default_rng(0)
    pcm = rng.integers(-32768, 32768, size=(3000, 2))
    _roundtrip(pcm, strategy="verbatim")
    _roundtrip(pcm, strategy="auto")  # rice on white noise still exact


def test_roundtrip_wasted_bits_and_escapes():
    pcm = (synth_pcm(9, 2048, 2) >> 4) << 4
    _roundtrip(pcm, strategy="fixed2", wasted_bits=4)
    pcm = synth_pcm(1, 2048, 2)
    _roundtrip(pcm, strategy="fixed1", escape_raw=20, rice_partition_order=2)
    _roundtrip(
        np.zeros((1024, 1), dtype=np.int64), strategy="fixed1", escape_raw=0
    )


@pytest.mark.parametrize("bps", [8, 12, 16, 20, 24])
def test_bps_variants_scale_to_int16_like_wav(bps):
    base = synth_pcm(5, 2000, 2)
    pcm = base >> (16 - bps) if bps < 16 else base << (bps - 16)
    enc = flac_bytes(pcm, 32000, bps=bps)
    dec, sr = flac_decode(enc)
    expect = (pcm << (16 - bps) if bps < 16 else pcm >> (bps - 16)).astype(
        np.int16
    )
    assert sr == 32000 and (dec == expect).all()
    info = flac_stream_info(enc)
    assert info["bps"] == bps and info["n_samples"] == 2000


def test_stream_info_exact():
    enc = flac_bytes(synth_pcm(2, 3000, 2), 48000, block_size=1152)
    info = flac_stream_info(enc)
    assert info == {
        "container": "flac",
        "sample_rate": 48000,
        "channels": 2,
        "bps": 16,
        "n_samples": 3000,
        "duration_ms": round(3000 * 1000 / 48000),
    }


def test_malformed_raises_valueerror_only():
    enc = flac_bytes(synth_pcm(4, 1500, 1), 44100)
    for bad in (b"", b"fLa", b"OggSnot-flac", enc[:20], enc[:100]):
        with pytest.raises(ValueError):
            flac_decode(bad)
    # frame CRC corruption
    buf = bytearray(enc)
    buf[-3] ^= 0x40
    with pytest.raises(ValueError):
        flac_decode(bytes(buf))
    # STREAMINFO MD5 tamper: decode must refuse silently-wrong audio
    buf = bytearray(enc)
    buf[4 + 4 + 18] ^= 0xFF  # first MD5 byte
    with pytest.raises(ValueError, match="MD5"):
        flac_decode(bytes(buf))
    # ... unless the caller opts out of MD5 verification
    dec, _ = flac_decode(bytes(buf), verify_md5=False)
    assert dec.shape == (1500, 1)


def test_mutation_fuzz_never_silently_wrong():
    random.seed(7)
    pcm = synth_pcm(11, 2500, 2)
    enc = flac_bytes(pcm, 44100, block_size=1152)
    ref = pcm.astype(np.int16)
    benign = 0
    for _ in range(600):
        buf = bytearray(enc)
        k = random.randrange(3)
        if k == 0:
            buf[random.randrange(len(buf))] ^= 1 << random.randrange(8)
        elif k == 1:
            buf = buf[: random.randrange(len(buf))]
        else:
            for _ in range(random.randrange(1, 8)):
                buf[random.randrange(len(buf))] ^= random.randrange(1, 256)
        try:
            dec, sr = flac_decode(bytes(buf))
        except ValueError:
            continue  # the only allowed failure type
        # survived: must be byte-identical output (mutation hit a
        # don't-care field like min/max framesize)
        assert sr == 44100 and dec.shape == ref.shape and (dec == ref).all()
        benign += 1
    assert benign < 20  # almost every mutation must be caught


def test_flac_features_equal_wav_features(spark):
    """Same PCM through two containers -> identical features (the
    FLAC decode path is exactly the WAV decode contract)."""
    from tl_spark.operators.multimodal import audio_features, wav_bytes

    pcm = synth_pcm(13, 4000, 2)
    rows = []
    rows.append((0, bytearray(wav_bytes(pcm.astype(np.int16), 16000))))
    rows.append((1, bytearray(flac_bytes(pcm, 16000, block_size=1152))))
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in audio_features(df).collect()}
    a, b = got[0], got[1]
    assert (a["duration_ms"], a["rms"], a["zcr"], a["peak"]) == (
        b["duration_ms"], b["rms"], b["zcr"], b["peak"],
    )


def test_audio_stream_info_flac_duckdb_oracle(spark):
    from tl_spark.operators.mp3 import audio_stream_info

    rows = sorted(
        (r["media_id"], r["container"], r["duration_ms"], r["sample_rate"],
         r["channels"], r["n_frames"], r["clean"])
        for r in audio_stream_info(synth_flac_media(spark, 30)).collect()
    )
    duck = sorted(
        tuple(r)
        for r in duckdb.sql(
            """
            SELECT id AS media_id, 'flac' AS container,
                   CAST(round((2003 + (id % 5) * 499) * 1000.0 /
                        CASE id % 3 WHEN 0 THEN 44100
                                    WHEN 1 THEN 48000
                                    ELSE 32000 END) AS BIGINT) AS duration_ms,
                   CASE id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                        ELSE 32000 END AS sample_rate,
                   CASE WHEN id % 2 = 1 THEN 1 ELSE 2 END AS channels,
                   2003 + (id % 5) * 499 AS n_frames,
                   true AS clean
            FROM range(30) t(id)
            """
        ).fetchall()
    )
    assert rows == duck


def test_media_router_flac():
    from tl_spark.operators.media_info import media_payload_info

    enc = flac_bytes(synth_pcm(6, 2400, 2), 48000)
    info = media_payload_info(enc)
    assert info["kind"] == "audio" and info["container"] == "flac"
    assert info["sample_rate"] == 48000 and info["channels"] == 2
    assert info["n_samples"] == 2400
    assert info["duration_ms"] == round(2400 * 1000 / 48000)
    assert info["bitrate_kbps"] == round(len(enc) * 8 * 48000 / (2400 * 1000))
