"""AAC/ADTS, Ogg (Vorbis/Opus), EBML (Matroska/WebM), and H.264-SPS
container layers: exact walks, closed-form DuckDB oracles for the
synth tables, malformed-input contracts, and unified-router dispatch.

Sample decode for all of these codecs stays an honest stub — these
layers recover the metadata a corpus-scale curation pipeline gates on
BEFORE any decode (duration, resolution, codec, rate/channels)."""

import struct

import duckdb
import pytest

from tl_spark.operators.aac import (
    aac_adts_bytes,
    aac_stream_info,
    synth_aac_media,
)
from tl_spark.operators.ebml import mkv_bytes, mkv_stream_info, synth_mkv_media
from tl_spark.operators.mp4 import _sps_dims, avcc_bytes, mp4_bytes, sps_bytes
from tl_spark.operators.ogg import ogg_bytes, ogg_stream_info, synth_ogg_media

# ---------------------------------------------------------------------------
# AAC / ADTS
# ---------------------------------------------------------------------------


def test_adts_walk_exact():
    d = aac_adts_bytes(20, sample_rate=48000, channels=2)
    info = aac_stream_info(d)
    assert info["n_frames"] == 20
    assert info["sample_rate"] == 48000 and info["channels"] == 2
    assert info["duration_ms"] == round(20 * 1024 * 1000 / 48000)
    assert info["profile"] == "lc" and info["clean"] and not info["vbr"]


def test_adts_crc_and_vbr_and_mpeg2():
    d = aac_adts_bytes(
        12, frame_body=[150, 260, 210], sample_rate=44100, crc=True, mpeg2=True
    )
    info = aac_stream_info(d)
    assert info["vbr"] is True and info["mpeg_version"] == 2
    assert info["n_frames"] == 12 and info["clean"]


def test_adts_junk_and_truncation():
    with pytest.raises(ValueError):
        aac_stream_info(b"not audio")
    with pytest.raises(ValueError):
        aac_stream_info(b"")
    # a stray ADTS-looking sync inside junk: second-frame rule rejects
    junk = b"xx\xff\xf1\x50\x80\x01\x00\xfc" + b"y" * 40
    with pytest.raises(ValueError):
        aac_stream_info(junk)
    d = aac_adts_bytes(8)
    cut = aac_stream_info(d[: len(d) - 5])
    assert cut["n_frames"] == 7 and cut["clean"] is False


def test_adts_junk_prefix_then_stream():
    d = b"\x00skip\xff me" + aac_adts_bytes(6, sample_rate=32000)
    info = aac_stream_info(d)
    assert info["n_frames"] == 6 and info["clean"]


def test_aac_synth_duckdb_oracle(spark):
    rows = sorted(
        (r["media_id"], r["duration_ms"], r["sample_rate"], r["channels"],
         r["n_frames"], r["vbr"])
        for r in __import__(
            "tl_spark.operators.mp3", fromlist=["audio_stream_info"]
        ).audio_stream_info(synth_aac_media(spark, 30)).collect()
    )
    duck = sorted(
        tuple(r)
        for r in duckdb.sql(
            """
            SELECT id AS media_id,
                   CAST(round((15 + id % 9) * 1024 * 1000.0 /
                        CASE id % 3 WHEN 0 THEN 48000
                                    WHEN 1 THEN 44100
                                    ELSE 32000 END) AS BIGINT) AS duration_ms,
                   CASE id % 3 WHEN 0 THEN 48000 WHEN 1 THEN 44100
                        ELSE 32000 END AS sample_rate,
                   1 + id % 2 AS channels,
                   15 + id % 9 AS n_frames,
                   id % 4 = 0 AS vbr
            FROM range(30) t(id)
            """
        ).fetchall()
    )
    assert rows == duck


# ---------------------------------------------------------------------------
# Ogg
# ---------------------------------------------------------------------------


def test_ogg_vorbis_exact():
    d = ogg_bytes("vorbis", 96000, sample_rate=48000, channels=2)
    info = ogg_stream_info(d)
    assert info["codec"] == "vorbis" and info["channels"] == 2
    assert info["sample_rate"] == 48000 and info["n_samples"] == 96000
    assert info["duration_ms"] == 2000 and info["clean"]
    assert info["bitrate_kbps"] == 96  # nominal from the ident header


def test_ogg_opus_preskip_and_48k_granules():
    d = ogg_bytes("opus", 24000, sample_rate=16000, channels=1, pre_skip=312)
    info = ogg_stream_info(d)
    assert info["codec"] == "opus" and info["sample_rate"] == 16000
    assert info["n_samples"] == 24000  # granule minus pre-skip
    assert info["duration_ms"] == 500  # at 48 kHz, NOT the input rate


def test_ogg_crc_is_verified():
    d = bytearray(ogg_bytes("vorbis", 48000))
    d[-1] ^= 0x01  # flip a byte in the last page body
    with pytest.raises(ValueError, match="CRC"):
        ogg_stream_info(bytes(d))
    # truncated page
    with pytest.raises(ValueError):
        ogg_stream_info(bytes(d[: len(d) // 2]))
    with pytest.raises(ValueError):
        ogg_stream_info(b"OggS but not really")


def test_ogg_missing_eos_marks_dirty():
    d = ogg_bytes("vorbis", 48000, n_data_pages=4)
    # drop the final page (which carries EOS): parse stays OK but dirty
    pages = []
    pos = 0
    while pos < len(d):
        nseg = d[pos + 26]
        body = sum(d[pos + 27 : pos + 27 + nseg])
        end = pos + 27 + nseg + body
        pages.append(d[pos:end])
        pos = end
    info = ogg_stream_info(b"".join(pages[:-1]))
    assert info["clean"] is False and info["n_samples"] < 48000


def test_ogg_synth_duckdb_oracle(spark):
    from tl_spark.operators.mp3 import audio_stream_info

    rows = sorted(
        (r["media_id"], r["duration_ms"], r["sample_rate"], r["channels"],
         r["n_frames"])
        for r in audio_stream_info(synth_ogg_media(spark, 30)).collect()
    )
    duck = sorted(
        tuple(r)
        for r in duckdb.sql(
            """
            WITH p AS (
              SELECT id, 9600 + (id % 7) * 480 AS n FROM range(30) t(id)
            )
            SELECT id AS media_id,
                   CAST(CASE WHEN id % 2 = 0
                        THEN round(n * 1000.0 /
                             CASE id % 3 WHEN 0 THEN 48000
                                         WHEN 1 THEN 44100
                                         ELSE 32000 END)
                        ELSE round(n * 1000.0 / 48000)
                   END AS BIGINT) AS duration_ms,
                   CASE WHEN id % 2 = 0 THEN
                        CASE id % 3 WHEN 0 THEN 48000 WHEN 1 THEN 44100
                             ELSE 32000 END
                        ELSE 48000 END AS sample_rate,
                   CASE WHEN id % 2 = 0
                        THEN 1 + (id % 2) + CASE WHEN id % 3 = 0 THEN 1 ELSE 0 END
                        ELSE 1 + id % 3 END AS channels,
                   n AS n_frames
            FROM p
            """
        ).fetchall()
    )
    assert rows == duck


# ---------------------------------------------------------------------------
# EBML / Matroska / WebM
# ---------------------------------------------------------------------------


def test_mkv_exact():
    d = mkv_bytes("webm", 12345, video=("V_VP9", 1920, 1080),
                  audio=("A_OPUS", 48000, 2))
    info = mkv_stream_info(d)
    assert info["container"] == "webm"
    assert info["duration_ms"] == 12345
    assert (info["width"], info["height"]) == (1920, 1080)
    assert info["video_codec"] == "V_VP9" and info["audio_codec"] == "A_OPUS"
    assert info["sample_rate"] == 48000 and info["channels"] == 2


def test_mkv_timestamp_scale_applies():
    d = mkv_bytes("matroska", 5000, timestamp_scale=500_000,
                  video=None, audio=("A_VORBIS", 44100, 2))
    info = mkv_stream_info(d)
    assert info["duration_ms"] == 5000  # ticks * scale / 1e6 round-trips
    assert info["has_video"] is False and info["has_audio"] is True


def test_mkv_malformed():
    with pytest.raises(ValueError):
        mkv_stream_info(b"not ebml at all")
    d = mkv_bytes("webm", 1000)
    with pytest.raises(ValueError):
        mkv_stream_info(d[: len(d) // 2])
    # wrong doctype is refused, not misreported
    bad = d.replace(b"webm", b"webZ")
    with pytest.raises(ValueError, match="doctype"):
        mkv_stream_info(bad)
    # nesting bomb: 20 levels of unknown-size masters must not spin
    deep = b"\x1aE\xdf\xa3" + b"\xff" * 0  # minimal: doctype missing
    with pytest.raises(ValueError):
        mkv_stream_info(deep)


def test_mkv_synth_duckdb_oracle(spark):
    from tl_spark.operators.mp4 import video_stream_info

    rows = sorted(
        (r["media_id"], r["container"], r["duration_ms"], r["width"],
         r["height"], r["has_video"], r["video_codec"])
        for r in video_stream_info(synth_mkv_media(spark, 30)).collect()
    )
    duck = sorted(
        tuple(r)
        for r in duckdb.sql(
            """
            SELECT id AS media_id,
                   CASE WHEN id % 2 = 0 THEN 'webm' ELSE 'matroska' END
                       AS container,
                   3000 + (id % 11) * 700 AS duration_ms,
                   CASE WHEN id % 7 = 0 THEN 0
                        ELSE 640 + (id % 4) * 320 END AS width,
                   CASE WHEN id % 7 = 0 THEN 0
                        ELSE 360 + (id % 4) * 180 END AS height,
                   id % 7 <> 0 AS has_video,
                   CASE WHEN id % 7 = 0 THEN ''
                        ELSE CASE id % 3 WHEN 0 THEN 'V_VP9'
                                         WHEN 1 THEN 'V_VP8'
                                         ELSE 'V_MPEG4/ISO/AVC' END
                   END AS video_codec
            FROM range(30) t(id)
            """
        ).fetchall()
    )
    assert rows == duck


# ---------------------------------------------------------------------------
# H.264 SPS / avcC
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "w,h", [(1920, 1080), (1280, 720), (640, 360), (112, 86), (16, 16),
            (1918, 1078), (3840, 2160)]
)
def test_sps_dims_roundtrip(w, h):
    assert _sps_dims(sps_bytes(w, h)) == (w, h)


def test_sps_emulation_prevention_handled():
    sps = sps_bytes(640, 360)
    # trailing zero bytes are EP-encoded as 00 00 03 00 on the wire;
    # the parser must strip them without disturbing the fields
    assert _sps_dims(sps + b"\x00\x00\x03\x00") == (640, 360)


def test_sps_malformed():
    with pytest.raises(ValueError):
        _sps_dims(b"")
    with pytest.raises(ValueError):
        _sps_dims(b"\x68\x00\x00")  # PPS, not SPS
    with pytest.raises(ValueError):
        _sps_dims(b"\x67\x42")  # truncated


def test_mp4_coded_dims_from_avcc(spark):
    from tl_spark.operators.mp4 import mp4_stream_info, video_stream_info

    d = mp4_bytes(1000, width=1280, height=720, avcc_dims=(1918, 1078))
    info = mp4_stream_info(d)
    assert (info["width"], info["height"]) == (1280, 720)  # tkhd display
    assert (info["coded_width"], info["coded_height"]) == (1918, 1078)
    # no avcC -> coded dims stay 0
    d2 = mp4_bytes(1000, width=640, height=360)
    info2 = mp4_stream_info(d2)
    assert (info2["coded_width"], info2["coded_height"]) == (0, 0)
    # through the Spark operator
    df = spark.createDataFrame(
        [(1, bytearray(d)), (2, bytearray(d2))], "media_id long, payload binary"
    )
    got = {r["media_id"]: r for r in video_stream_info(df).collect()}
    assert (got[1]["coded_width"], got[1]["coded_height"]) == (1918, 1078)
    assert (got[2]["coded_width"], got[2]["coded_height"]) == (0, 0)


def test_avcc_record_shape():
    sps = sps_bytes(320, 180)
    rec = avcc_bytes(sps)
    assert rec[0] == 1 and rec[5] & 0x1F == 1
    (ln,) = struct.unpack_from(">H", rec, 6)
    assert rec[8 : 8 + ln] == sps


# ---------------------------------------------------------------------------
# Unified router dispatch
# ---------------------------------------------------------------------------


def test_router_dispatches_new_containers():
    from tl_spark.operators.media_info import media_payload_info

    info = media_payload_info(aac_adts_bytes(10, sample_rate=48000, channels=2))
    assert (info["kind"], info["container"]) == ("audio", "aac")
    assert info["duration_ms"] == round(10 * 1024 * 1000 / 48000)

    info = media_payload_info(ogg_bytes("opus", 48000, channels=2))
    assert (info["kind"], info["container"]) == ("audio", "ogg")
    assert info["duration_ms"] == 1000

    info = media_payload_info(mkv_bytes("webm", 7000))
    assert (info["kind"], info["container"]) == ("video", "webm")
    assert (info["width"], info["height"]) == (1280, 720)

    info = media_payload_info(
        mkv_bytes("matroska", 7000, video=None, audio=("A_AAC", 44100, 2))
    )
    assert (info["kind"], info["container"]) == ("audio", "matroska")

    # MP3 still routes as MP3 (layer bits disambiguate from ADTS)
    from tl_spark.operators.mp3 import mp3_frame_bytes

    info = media_payload_info(mp3_frame_bytes(8))
    assert info["container"] == "mp3" and info["n_samples"] == 8


def test_adts_id3_envelopes(spark):
    from tl_spark.operators.media_info import media_payload_info
    from tl_spark.operators.mp3 import audio_stream_info

    d = aac_adts_bytes(
        10, sample_rate=48000, channels=2, id3v2_size=250, id3v1=True, seed=4
    )
    info = aac_stream_info(d)
    assert info["n_frames"] == 10 and info["clean"]
    assert media_payload_info(d)["container"] == "aac"
    df = spark.createDataFrame(
        [(1, bytearray(d))], "media_id long, payload binary"
    )
    rows = audio_stream_info(df).collect()
    assert rows[0]["container"] == "aac" and rows[0]["n_frames"] == 10


def test_avcc_corrupt_sps_length_is_refused():
    # an SPS length claiming bytes beyond the avcC box must raise,
    # not read dims out of sibling boxes (review finding)
    import struct as _s

    from tl_spark.operators.mp4 import _avcc_sps_dims

    sps = sps_bytes(320, 180)
    rec = bytearray(avcc_bytes(sps))
    rec[6:8] = _s.pack(">H", len(sps) + 500)  # lie about the length
    payload = bytes(rec)
    with pytest.raises(ValueError, match="truncated avcC"):
        _avcc_sps_dims(payload, 0, len(payload))
