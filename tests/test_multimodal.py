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


def test_fake_law_never_mixes_with_header_sniff():
    """With fake=True the byte-length law must apply even when the payload
    IS a real container — decode_media and resize_media must agree on
    source dims for the same payload (they mixed laws before r4)."""
    from hbase_hadoop_flightsearch_spark.functions.multimodal import (
        resize_media,
    )

    p = _png(12, 34)
    d = decode_media(p, "image/png", fake=True)
    r = resize_media(p, fake=True)
    assert (d["width"], d["height"]) == (r["width"], r["height"])
    assert d["width"] == len(p) % 640 + 1  # fake law, not the real 12


def test_decode_real_arrow_roundtrip(spark, sf_smoke):
    """The registered query synthesizes real PNG/BMP/WAV/ICO/TIFF
    containers and parses them back through mapInPandas WITHOUT the fake
    law; spot-check the law against a locally built container."""
    fmt_cycle = {0: "png", 1: "bmp", 2: "wav", 3: "ico", 4: "tiff"}
    rows = {r.doc_id: r for r in multimodal_decode_real(spark, sf_smoke).collect()}
    assert rows
    for doc_id, r in list(rows.items())[:50]:
        assert r.format == fmt_cycle[doc_id % 5]
        if r.format == "wav":
            assert r.width is None
            assert r.sample_rate in range(8000, 16000, 1000)
        elif r.format == "ico":
            assert 1 <= r.width <= 255 and 1 <= r.height <= 255
        else:
            assert 1 <= r.width <= 640 and 1 <= r.height <= 480


def test_ico_header_including_256_quirk():
    ico = (
        b"\x00\x00\x01\x00" + struct.pack("<H", 1)
        + bytes([48, 32, 0, 0]) + struct.pack("<HHII", 1, 32, 40, 22)
    )
    hdr = parse_media_header(ico)
    assert (hdr["format"], hdr["width"], hdr["height"]) == ("ico", 48, 32)
    # A zero width/height byte encodes 256 — the format's one-byte quirk.
    ico256 = (
        b"\x00\x00\x01\x00" + struct.pack("<H", 1)
        + bytes([0, 0, 0, 0]) + struct.pack("<HHII", 1, 32, 40, 22)
    )
    hdr = parse_media_header(ico256)
    assert (hdr["width"], hdr["height"]) == (256, 256)


def _tiff(w, h, big_endian=False):
    bo = ">" if big_endian else "<"
    magic = b"MM\x00*" if big_endian else b"II*\x00"
    return (
        magic
        + struct.pack(bo + "I", 8)
        + struct.pack(bo + "H", 2)
        + struct.pack(bo + "HHIHH", 256, 3, 1, w, 0)
        + struct.pack(bo + "HHIHH", 257, 4, 1, h, 0)[:8]
        + struct.pack(bo + "I", h)  # LONG value uses all 4 value bytes
        + struct.pack(bo + "I", 0)
    )


def test_tiff_header_both_byte_orders_and_value_types():
    """SHORT (left-justified in the value field) and LONG entries, in both
    II and MM byte orders, must all decode."""
    for be in (False, True):
        hdr = parse_media_header(_tiff(1024, 768, big_endian=be))
        assert (hdr["format"], hdr["width"], hdr["height"]) == (
            "tiff", 1024, 768,
        ), f"big_endian={be}"
    # Truncated IFD must not crash.
    assert parse_media_header(b"II*\x00" + struct.pack("<I", 99)) is None


def test_wav_pcm_samples_roundtrip():
    """The data-chunk walker must recover the exact int16 samples, skip a
    leading LIST chunk, and return None when no data chunk exists."""
    from hbase_hadoop_flightsearch_spark.functions.multimodal import (
        _synth_wav_pcm,
        wav_pcm_samples,
    )

    got = wav_pcm_samples(_synth_wav_pcm(7, 100))
    want = [((7 * 31 + i * 7) % 65536) - 32768 for i in range(100 % 64 + 16)]
    assert list(got) == want
    # fmt-only WAV (no data chunk) -> None; non-WAV -> None.
    assert wav_pcm_samples(_wav(1, 8000)) is None
    assert wav_pcm_samples(b"not audio") is None
    # data chunk after a LIST chunk is still found.
    samples = struct.pack("<4h", 1, -2, 3, -4)
    wav = (
        b"RIFF" + struct.pack("<I", 4 + 12 + 8 + len(samples)) + b"WAVE"
        + b"LIST" + struct.pack("<I", 4) + b"INFO"
        + b"data" + struct.pack("<I", len(samples)) + samples
    )
    assert list(wav_pcm_samples(wav)) == [1, -2, 3, -4]


def test_bmp_pixels_roundtrip_and_row_order():
    """The BMP pixel decoder must recover exact (b,g,r) values in logical
    top-down order for BOTH storage layouts, honor the 4-byte row stride,
    and reject unsupported flavors."""
    from hbase_hadoop_flightsearch_spark.functions.multimodal import (
        _synth_bmp,
        bmp_pixels,
    )

    # doc_id 4 -> even -> bottom-up; doc_id 5 -> odd -> top-down.
    for doc_id in (4, 5):
        px = bmp_pixels(_synth_bmp(doc_id))
        w, h = doc_id % 9 + 2, doc_id % 7 + 2
        assert len(px) == h and len(px[0]) == w
        for y in range(h):
            for x in range(w):
                assert px[y][x] == (
                    (doc_id + 3 * x + 7 * y) % 256,
                    (doc_id * 2 + 5 * x + 11 * y) % 256,
                    (doc_id * 3 + 13 * x + 17 * y) % 256,
                ), (doc_id, x, y)

    # Hand-built 2x2 bottom-up BMP: file rows are (bottom row, top row);
    # stride pads 6 pixel bytes to 8 per row.
    top = bytes([1, 2, 3, 4, 5, 6])        # (1,2,3) (4,5,6)
    bottom = bytes([7, 8, 9, 10, 11, 12])  # (7,8,9) (10,11,12)
    body = bottom + b"\x00\x00" + top + b"\x00\x00"
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(body),
                       0, 0, 0, 0)
    px = bmp_pixels(hdr + info + body)
    assert px == [[(1, 2, 3), (4, 5, 6)], [(7, 8, 9), (10, 11, 12)]]

    # Non-BMP -> None; 8bpp or compressed BMP -> ValueError.
    assert bmp_pixels(b"not an image" * 10) is None
    bad = hdr + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, 0, 0, 0, 0, 0)
    bad += body
    import pytest as _pytest

    with _pytest.raises(ValueError):
        bmp_pixels(bad)
