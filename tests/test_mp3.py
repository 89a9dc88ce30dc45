"""MPEG audio frame layer: exact-walk tests + a DuckDB oracle for the
synthetic table (the writer's ground truth is closed-form). Sample
decode stays an honest stub — see tl_spark/operators/mp3.py."""

import duckdb
import pytest

from tl_spark.operators.mp3 import (
    audio_stream_info,
    mp3_frame_bytes,
    mp3_stream_info,
    synth_mp3_media,
)


def test_walk_exact_cbr():
    d = mp3_frame_bytes(25, bitrates=128, sample_rate=44100, channels=2)
    info = mp3_stream_info(d)
    assert info["n_frames"] == 25
    assert info["sample_rate"] == 44100
    assert info["channels"] == 2
    assert info["bitrate_kbps"] == 128
    assert info["vbr"] is False
    assert info["clean"] is True
    assert info["duration_ms"] == round(25 * 1152 * 1000 / 44100)
    assert info["version"] == 1.0 and info["layer"] == 3


def test_walk_vbr_mean_bitrate():
    d = mp3_frame_bytes(30, bitrates=[64, 128, 192], sample_rate=32000)
    info = mp3_stream_info(d)
    assert info["vbr"] is True
    assert info["bitrate_kbps"] == 128  # mean of an even cycle
    assert info["n_frames"] == 30
    assert info["duration_ms"] == round(30 * 1152 * 1000 / 32000)


def test_id3_envelopes_skipped():
    d = mp3_frame_bytes(8, id3v2_size=300, id3v1=True)
    info = mp3_stream_info(d)
    assert info["n_frames"] == 8 and info["clean"] is True


def test_truncation_and_junk():
    d = mp3_frame_bytes(10)
    cut = mp3_stream_info(d[: len(d) - 7])
    assert cut["n_frames"] == 9 and cut["clean"] is False
    with pytest.raises(ValueError):
        mp3_stream_info(b"not audio at all")
    with pytest.raises(ValueError):
        mp3_stream_info(b"")
    # a stray sync byte inside junk must not fake a stream (the walker
    # demands a consistent SECOND frame)
    junk = b"junk\xff\xfb\x90\x00" + b"x" * 50
    with pytest.raises(ValueError):
        mp3_stream_info(junk)


def test_junk_prefix_then_real_stream():
    d = b"\x00garbage\xff!" + mp3_frame_bytes(6)
    info = mp3_stream_info(d)
    assert info["n_frames"] == 6 and info["clean"] is True


def test_xing_count_wins_on_dirty_walk():
    # hand-patch a Xing header into frame 1 (MPEG-1 stereo: offset
    # 4 + 32) claiming 500 frames, then truncate so the walk is dirty
    d = bytearray(mp3_frame_bytes(10, bitrates=192))
    p = 4 + 32
    d[p : p + 4] = b"Xing"
    d[p + 4 : p + 8] = (0x1).to_bytes(4, "big")  # FRAMES flag
    d[p + 8 : p + 12] = (500).to_bytes(4, "big")
    info = mp3_stream_info(bytes(d[: len(d) - 5]))
    assert info["clean"] is False
    assert info["duration_ms"] == round(500 * 1152 * 1000 / 44100)


def test_layer_variants_parse():
    # frame-length arithmetic for MPEG-2 Layer III (576 spf, LSF
    # bitrate table): craft one header by hand
    h = (0x7FF << 21) | (2 << 19) | (1 << 17) | (1 << 16) | (4 << 12) | (1 << 10) | (3 << 6)
    flen = 576 // 8 * 1000 * 32 // 24000
    frame = h.to_bytes(4, "big") + bytes(flen - 4)
    info = mp3_stream_info(frame * 3)
    assert info["version"] == 2.0 and info["sample_rate"] == 24000
    assert info["channels"] == 1 and info["n_frames"] == 3
    assert info["duration_ms"] == round(3 * 576 * 1000 / 24000)


def test_audio_stream_info_spark_with_duckdb_oracle(spark):
    rows = sorted(
        (r["media_id"], r["duration_ms"], r["sample_rate"], r["channels"],
         r["vbr"], r["n_frames"])
        for r in audio_stream_info(synth_mp3_media(spark, 40)).collect()
    )
    # the generator's ground truth is closed-form over id — exact SQL
    duck = sorted(
        tuple(r)
        for r in duckdb.sql(
            """
            SELECT id AS media_id,
                   CAST(round((20 + id % 11) * 1152 * 1000.0 /
                        CASE id % 3 WHEN 0 THEN 44100
                                    WHEN 1 THEN 48000
                                    ELSE 32000 END) AS BIGINT) AS duration_ms,
                   CASE id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                        ELSE 32000 END AS sample_rate,
                   CASE WHEN id % 2 = 1 THEN 1 ELSE 2 END AS channels,
                   id % 3 = 0 AS vbr,
                   20 + id % 11 AS n_frames
            FROM range(40) t(id)
            """
        ).fetchall()
    )
    assert rows == duck


def test_audio_stream_info_wav_and_skip(spark):
    from tl_spark.operators.multimodal import synth_wav_media

    wav = audio_stream_info(synth_wav_media(spark, 5, n_samples=800, rate=8000))
    got = {r["media_id"]: r for r in wav.collect()}
    assert len(got) == 5
    for r in got.values():
        assert r["container"] == "wav"
        assert r["duration_ms"] == 100  # 800 samples @ 8 kHz
        assert r["sample_rate"] == 8000 and r["clean"]
    # a poisoned payload: on_error="skip" drops it, "raise" fails
    import pyarrow  # noqa: F401
    bad = spark.createDataFrame(
        [(99, bytearray(b"\xff\xfb garbage"))], "media_id long, payload binary"
    )
    assert audio_stream_info(bad, on_error="skip").count() == 0
    with pytest.raises(Exception, match="MPEG|ValueError|no MPEG"):
        audio_stream_info(bad, on_error="raise").collect()


def test_mp3_still_an_honest_stub_in_audio_features(spark):
    """audio_features must keep REFUSING MP3 payloads (no sample
    decode) — the metadata path is audio_stream_info."""
    from tl_spark.operators.multimodal import audio_features

    df = synth_mp3_media(spark, 3)
    with pytest.raises(Exception, match="codec|NotImplemented"):
        audio_features(df).collect()
