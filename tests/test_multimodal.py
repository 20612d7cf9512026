"""Real media-codec tests (E13): the pure-stdlib header parser must
struct-decode byte-exact containers — no fake law, no image libraries —
and the decode must work through the Arrow mapInPandas path."""

from __future__ import annotations

import struct

import pytest

from hbase_hadoop_flightsearch_spark.functions.multimodal import (
    decode_media,
    multimodal_decode_real,
    parse_media_header,
)


def _png(w, h):
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", w, h)
        + b"\x08\x06\x00\x00\x00"
    )


def _bmp(w, h):
    return b"BM" + struct.pack("<IHHI", 54, 0, 0, 54) + struct.pack(
        "<Iii", 40, w, h
    )


def _gif(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"


def _wav(channels, rate, leading_list_chunk=False):
    fmt = b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16
    )
    body = fmt
    if leading_list_chunk:
        # Real encoders often put LIST/INFO metadata before fmt — the
        # parser must walk chunks, not assume fmt is first.
        body = b"LIST" + struct.pack("<I", 4) + b"INFO" + fmt
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def _jpeg(w, h):
    # SOI, APP0 (JFIF stub), then SOF0 carrying height/width big-endian.
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(
        ">HH", h, w
    ) + b"\x03\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0


def test_png_header():
    assert parse_media_header(_png(1920, 1080)) == {
        "format": "png", "width": 1920, "height": 1080,
        "channels": None, "sample_rate": None,
    }


def test_bmp_header_and_topdown_negative_height():
    assert parse_media_header(_bmp(640, 480))["width"] == 640
    hdr = parse_media_header(_bmp(640, -480))
    assert (hdr["format"], hdr["height"]) == ("bmp", 480)


def test_gif_header():
    hdr = parse_media_header(_gif(320, 200))
    assert (hdr["format"], hdr["width"], hdr["height"]) == ("gif", 320, 200)


def test_wav_header_walks_chunks():
    for leading in (False, True):
        hdr = parse_media_header(_wav(2, 44100, leading_list_chunk=leading))
        assert (hdr["format"], hdr["channels"], hdr["sample_rate"]) == (
            "wav", 2, 44100,
        ), leading


def test_jpeg_sof_scan():
    hdr = parse_media_header(_jpeg(800, 600))
    assert (hdr["format"], hdr["width"], hdr["height"]) == ("jpeg", 800, 600)


def test_unknown_bytes_return_none():
    assert parse_media_header(b"plain old text payload") is None
    assert parse_media_header(b"") is None
    # Truncated magic prefixes must not crash the parser.
    for blob in (b"\x89PNG\r\n\x1a\n\x00", b"BM\x00", b"RIFF\x00\x00"):
        assert parse_media_header(blob) is None


def test_decode_media_real_path_no_fake():
    out = decode_media(_png(12, 34), "image/png")
    assert (out["width"], out["height"]) == (12, 34)
    # Declared text type must NOT be container-sniffed even if bytes match.
    with pytest.raises(NotImplementedError):
        decode_media(_bmp(9, 9), "text/plain")


def test_decode_real_arrow_roundtrip(spark, sf_smoke):
    """The registered query synthesizes real PNG/BMP/WAV containers and
    parses them back through mapInPandas WITHOUT the fake law; spot-check
    the law against a locally built container."""
    rows = {r.doc_id: r for r in multimodal_decode_real(spark, sf_smoke).collect()}
    assert rows
    for doc_id, r in list(rows.items())[:50]:
        if doc_id % 3 == 2:
            assert r.format == "wav" and r.width is None
            assert r.sample_rate in range(8000, 16000, 1000)
        else:
            assert r.format == ("png" if doc_id % 3 == 0 else "bmp")
            assert 1 <= r.width <= 640 and 1 <= r.height <= 480
