"""Unified media router: header-only image dims + audio/video
container dispatch by magic bytes, and the WARC media leg."""

import struct

import pytest

from tl_spark.operators.media_info import (
    image_header_info,
    media_payload_info,
    media_stream_info,
)


def _png(w, h):
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    )


def test_image_header_dims_match_full_decoders(spark):
    """Header-only dims must agree with the REAL decoders over every
    synthetic image table (the decoders are the ground truth)."""
    from tl_spark.operators import multimodal as M

    tables = [
        ("ppm", M.synth_ppm_media(spark, 6)),
        ("bmp", M.synth_bmp_media(spark, 6)),
        ("gif", M.synth_gif_media(spark, 6)),
        ("png", M.synth_png_media(spark, 6)),
        ("tiff", M.synth_tiff_media(spark, 6)),
        ("jpeg", M.synth_jpeg_media(spark, 6)),
    ]
    for name, df in tables:
        for row in df.select("payload").collect():
            p = bytes(row["payload"])
            info = image_header_info(p)
            assert info is not None and info["container"] == name, name
            img = M._decode_image(p, 0, 0, "error")
            assert (info["height"], info["width"]) == img.shape, name


def test_jpeg_progressive_and_tiff_bigendian_dims():
    from tl_spark.operators.media_info import _jpeg_dims
    # SOF2 (progressive) also carries dims
    sof2 = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 4) + b"JF"
        + b"\xff\xc2" + struct.pack(">H", 11)
        + bytes([8]) + struct.pack(">HH", 77, 55) + bytes([1, 0x11, 0])
    )
    assert _jpeg_dims(sof2) == (55, 77)


def test_router_kinds():
    from tl_spark.operators.mp3 import mp3_frame_bytes
    from tl_spark.operators.mp4 import mp4_bytes

    assert media_payload_info(_png(10, 20))["kind"] == "image"
    assert media_payload_info(mp3_frame_bytes(5))["kind"] == "audio"
    mp4 = media_payload_info(mp4_bytes(800, timescale=400))
    assert mp4["kind"] == "video" and mp4["duration_ms"] == 2000
    with pytest.raises(ValueError):
        media_payload_info(b"\x00\x01\x02 unrecognized")


def test_media_stream_info_mixed_and_skip(spark):
    from tl_spark.operators.mp3 import mp3_frame_bytes

    rows_in = [
        (1, "a", bytearray(_png(64, 32))),
        (2, "b", bytearray(mp3_frame_bytes(20, sample_rate=32000))),
        (3, "c", bytearray(b"junk that is not media")),
    ]
    df = spark.createDataFrame(
        rows_in, "media_id long, tag string, payload binary"
    )
    out = media_stream_info(
        df, passthrough=("tag",), on_error="skip"
    ).collect()
    got = {r["media_id"]: r for r in out}
    assert set(got) == {1, 2}
    assert got[1]["kind"] == "image" and got[1]["width"] == 64
    assert got[1]["tag"] == "a"
    assert got[2]["container"] == "mp3"
    assert got[2]["duration_ms"] == round(20 * 1152 * 1000 / 32000)
    with pytest.raises(Exception):
        media_stream_info(df, on_error="raise").collect()


def test_extract_warc_media_end_to_end(spark, tmp_path):
    from tl_spark.operators.mp3 import mp3_frame_bytes
    from tl_spark.operators.mp4 import mp4_bytes
    from tl_spark.sources.warc import (
        extract_warc_media,
        http_response_block,
        warc_bytes,
    )

    recs = [
        ("response", "http://x/1.png",
         http_response_block(_png(300, 200), content_type="image/png")),
        ("response", "http://x/2.mp3",
         http_response_block(mp3_frame_bytes(40), content_type="audio/mpeg")),
        ("response", "http://x/3.mp4",
         http_response_block(
             mp4_bytes(1500, timescale=500, width=1280, height=720),
             content_type="video/mp4")),
        ("response", "http://x/4.html",
         http_response_block(b"<p>hi</p>", content_type="text/html")),
        ("response", "http://x/5.bin",
         http_response_block(b"not media",
                             content_type="application/octet-stream")),
    ]
    p = tmp_path / "media.warc"
    p.write_bytes(warc_bytes(recs))
    out = extract_warc_media(spark, str(p)).collect()
    by_uri = {r["target_uri"]: r for r in out}
    # html filtered up front; junk .bin skipped by the router
    assert set(by_uri) == {"http://x/1.png", "http://x/2.mp3", "http://x/3.mp4"}
    assert by_uri["http://x/1.png"]["width"] == 300
    assert by_uri["http://x/2.mp3"]["n_samples"] == 40
    assert by_uri["http://x/3.mp4"]["duration_ms"] == 3000
    assert by_uri["http://x/3.mp4"]["height"] == 720
