"""ISO BMFF / AVI container layer: exact parse tests + a DuckDB oracle
over the closed-form synthetic writer (see tl_spark/operators/mp4.py
for the honest-scope rationale: containers real, bitstreams stubbed)."""

import struct

import duckdb
import pytest

from tl_spark.operators.mp4 import (
    _avi_stream_info,
    mp4_bytes,
    mp4_stream_info,
    synth_mp4_media,
    video_stream_info,
)


def test_roundtrip_v0_and_v1():
    for v1 in (False, True):
        d = mp4_bytes(1234, timescale=600, width=640, height=360,
                      n_samples=30, audio=True, version1=v1)
        info = mp4_stream_info(d)
        assert info["duration_ms"] == round(1234 * 1000 / 600)
        assert (info["width"], info["height"]) == (640, 360)
        assert info["n_tracks"] == 2 and info["has_audio"]
        assert info["video_codec"] == "avc1"
        assert info["audio_codec"] == "mp4a"
        assert info["n_samples"] == 30
        assert info["brand"] == "isom" and info["clean"]


def test_largesize_and_size0_boxes():
    d = mp4_bytes(1000, timescale=1000)
    # rewrite the trailing mdat as a largesize box, then as size==0
    at = d.rindex(b"mdat") - 4
    (sz,) = struct.unpack_from(">I", d, at)
    body = d[at + 8 : at + sz]
    large = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + len(body)) + body
    assert mp4_stream_info(d[:at] + large)["duration_ms"] == 1000
    tail0 = struct.pack(">I", 0) + b"mdat" + body
    assert mp4_stream_info(d[:at] + tail0)["duration_ms"] == 1000


def test_malformed_raises():
    with pytest.raises(ValueError):
        mp4_stream_info(b"garbage not a box tree!!")
    with pytest.raises(ValueError):
        mp4_stream_info(b"")
    d = mp4_bytes(100)
    # truncated mid-moov
    with pytest.raises(ValueError):
        mp4_stream_info(d[: len(d) // 2])
    # mdat alone (no moov): refused, not misreported
    with pytest.raises(ValueError, match="moov"):
        mp4_stream_info(struct.pack(">I", 16) + b"mdat" + bytes(8))


def test_box_bomb_capped():
    # 200k empty boxes: must ValueError (cap), not spin
    bomb = (struct.pack(">I", 8) + b"free") * 200_000
    with pytest.raises(ValueError, match="cap"):
        mp4_stream_info(bomb)


def test_avi_info_from_synth(spark):
    from tl_spark.operators.multimodal import synth_avi_media

    rows = video_stream_info(synth_avi_media(spark, 4)).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["container"] == "avi"
        assert r["width"] > 0 and r["height"] > 0
        assert r["n_samples"] > 0 and r["duration_ms"] > 0


def test_video_stream_info_duckdb_oracle(spark):
    rows = sorted(
        (r["media_id"], r["duration_ms"], r["width"], r["height"],
         r["n_samples"], r["n_tracks"], r["video_codec"])
        for r in video_stream_info(synth_mp4_media(spark, 40)).collect()
    )
    duck = sorted(
        tuple(r)
        for r in duckdb.sql(
            """
            SELECT id AS media_id,
                   CAST(round((500 + id*37) * 1000.0 /
                        (600 + (id % 3) * 400)) AS BIGINT) AS duration_ms,
                   320 + (id % 4) * 160 AS width,
                   180 + (id % 4) * 90 AS height,
                   24 + id % 7 AS n_samples,
                   CASE WHEN id % 3 = 0 THEN 2 ELSE 1 END AS n_tracks,
                   CASE WHEN id % 2 = 0 THEN 'avc1' ELSE 'hvc1' END
                       AS video_codec
            FROM range(40) t(id)
            """
        ).fetchall()
    )
    assert rows == duck


def test_on_error_policy(spark):
    bad = spark.createDataFrame(
        [(7, bytearray(b"RIFF\x00\x00\x00\x00AVI garbage"))],
        "media_id long, payload binary",
    )
    assert video_stream_info(bad, on_error="skip").count() == 0
    with pytest.raises(Exception):
        video_stream_info(bad, on_error="raise").collect()
