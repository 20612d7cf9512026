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


# ---------------------------------------------------------------------------
# GIF LZW codec (compressed-image decode)
# ---------------------------------------------------------------------------

from hbase_hadoop_flightsearch_spark.functions.multimodal import (  # noqa: E402
    GIF_NCOLORS,
    _gif_pixel_law,
    _synth_gif,
    gif_pixels,
    lzw_decode_gif,
    lzw_encode_gif,
)


def test_lzw_roundtrip_random_and_patterned():
    """Encoder and decoder agree across lengths that cross several
    code-width boundaries, for multiple root code sizes."""
    import random

    for mcs in (2, 3, 4):
        ncol = 1 << mcs
        for n in (0, 1, 2, 7, 63, 64, 65, 255, 700):
            rng = random.Random(1000 * mcs + n)
            seq = [rng.randrange(ncol) for _ in range(n)]
            assert lzw_decode_gif(lzw_encode_gif(seq, mcs), mcs) == seq
    # 20k symbols pushes the dictionary through many width bumps
    rng = random.Random(99)
    seq = [rng.randrange(8) for _ in range(20000)]
    assert lzw_decode_gif(lzw_encode_gif(seq, 3), 3) == seq


def test_lzw_kwkwk_case():
    """aaa... sequences force the code == next_code (KwKwK) branch."""
    for n in range(1, 40):
        seq = [5] * n
        assert lzw_decode_gif(lzw_encode_gif(seq, 3), 3) == seq


def test_gif_synth_decode_matches_law_both_parities():
    """Full-file roundtrip: interlaced (odd) and sequential (even) GIFs
    decode to the pixel law in logical top-down order; the palette law
    survives the color-table parse; and at least one image grows the
    dictionary past 64 entries (proving the width-bump path runs)."""
    from hbase_hadoop_flightsearch_spark.functions.multimodal import (
        GIF_H_MOD,
        GIF_W_MOD,
    )

    grew = False
    for doc_id in (0, 1, 7, 22, 254, 389):  # 389 -> 24x18 = 432 px
        w = doc_id % GIF_W_MOD + 3
        h = doc_id % GIF_H_MOD + 3
        rows, ct = gif_pixels(_synth_gif(doc_id))
        assert len(rows) == h and len(rows[0]) == w
        for y in range(h):
            for x in range(w):
                assert rows[y][x] == _gif_pixel_law(doc_id, x, y)
        assert ct[3] == ((3 * 37) % 256, (3 * 59) % 256, (3 * 83) % 256)
        # >64 dict entries ~= >54 emitted codes; infer from stream size
        if w * h > 300:
            grew = True
    assert grew


def test_gif_decoder_rejects_garbage():
    assert gif_pixels(b"notagif") is None
    with pytest.raises((ValueError, struct.error, IndexError)):
        gif_pixels(_synth_gif(4)[:40] + b"\xff" * 4)
    with pytest.raises((ValueError, struct.error, IndexError)):
        gif_pixels(_synth_gif(4)[:20])  # truncated mid-header


@pytest.mark.skipif(
    __import__("shutil").which("javac") is None
    or __import__("shutil").which("java") is None,
    reason="JDK not on PATH",
)
def test_gif_codec_interops_with_java_imageio(tmp_path):
    """Third-party ground truth: (a) GIFs written by THIS encoder decode
    pixel-exactly in Java ImageIO; (b) GIFs written by ImageIO (which
    emits interlaced, mcs=8 streams — a different corner of the format
    than the synth path) decode pixel-exactly HERE. This pins the
    canonical LZW width-bump timing on both sides."""
    import subprocess

    java_src = """
import java.awt.image.BufferedImage;
import java.awt.image.IndexColorModel;
import java.io.File;
import javax.imageio.ImageIO;
public class GifXCheck {
  public static void main(String[] a) throws Exception {
    if (a[0].equals("encode")) {
      int id = Integer.parseInt(a[2]), w = Integer.parseInt(a[3]), h = Integer.parseInt(a[4]);
      byte[] r = new byte[8], g = new byte[8], b = new byte[8];
      for (int c = 0; c < 8; c++) { r[c]=(byte)((c*37)%256); g[c]=(byte)((c*59)%256); b[c]=(byte)((c*83)%256); }
      IndexColorModel cm = new IndexColorModel(3, 8, r, g, b);
      BufferedImage img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, cm);
      for (int y = 0; y < h; y++) for (int x = 0; x < w; x++)
        img.getRaster().setSample(x, y, 0, (id + 5*x + 3*y + (x*y)%7) % 8);
      ImageIO.write(img, "gif", new File(a[1]));
    } else {
      BufferedImage img = ImageIO.read(new File(a[1]));
      System.out.println(img.getWidth() + " " + img.getHeight());
      StringBuilder sb = new StringBuilder();
      for (int y = 0; y < img.getHeight(); y++) {
        for (int x = 0; x < img.getWidth(); x++) {
          int p = img.getRGB(x, y);
          sb.append((p>>16)&255).append(',').append((p>>8)&255).append(',').append(p&255).append(' ');
        }
        sb.append('\\n');
      }
      System.out.print(sb);
    }
  }
}
"""
    (tmp_path / "GifXCheck.java").write_text(java_src)
    subprocess.run(
        ["javac", "GifXCheck.java"], cwd=tmp_path, check=True,
        capture_output=True,
    )

    def java(*args):
        return subprocess.run(
            ["java", "-cp", str(tmp_path), "GifXCheck", *args],
            check=True, capture_output=True, text=True,
        ).stdout

    def palette(c):
        return ((c * 37) % 256, (c * 59) % 256, (c * 83) % 256)

    # (a) our encoder -> Java decoder
    for doc_id in (6, 7):  # one sequential, one interlaced
        p = tmp_path / f"ours{doc_id}.gif"
        p.write_bytes(_synth_gif(doc_id))
        out = java("decode", str(p)).splitlines()
        w, h = map(int, out[0].split())
        for y in range(h):
            cells = out[1 + y].split()
            for x in range(w):
                rgb = tuple(map(int, cells[x].split(",")))
                assert rgb == palette(_gif_pixel_law(doc_id, x, y)), (
                    doc_id, x, y, rgb,
                )

    # (a2) a random 100x60 image saturates the 4096-entry dictionary, so
    # the encoder's CLEAR-reset path is in the stream Java must accept
    import random
    import struct as _struct

    rng = random.Random(17)
    w, h = 200, 150
    idx = [rng.randrange(GIF_NCOLORS) for _ in range(w * h)]
    hdr = b"GIF87a" + _struct.pack("<HHBBB", w, h, 0x80 | 0x02, 0, 0)
    gct = b"".join(bytes(palette(c)) for c in range(GIF_NCOLORS))
    desc = b"\x2C" + _struct.pack("<HHHHB", 0, 0, w, h, 0)
    data = lzw_encode_gif(idx, 3)
    # ~n/2 emissions on random 8-color data: 30000 px -> ~15000 codes,
    # far past the 4096-entry cap, so at least one CLEAR reset occurred
    assert len(data) > 8000, "stream too small to have saturated"
    blocks = bytearray([3])
    for i in range(0, len(data), 255):
        chunk = data[i: i + 255]
        blocks += bytes([len(chunk)]) + chunk
    blocks += b"\x00"
    p = tmp_path / "saturated.gif"
    p.write_bytes(hdr + gct + desc + bytes(blocks) + b"\x3B")
    out = java("decode", str(p)).splitlines()
    assert tuple(map(int, out[0].split())) == (w, h)
    for y in range(h):
        cells = out[1 + y].split()
        for x in range(w):
            rgb = tuple(map(int, cells[x].split(",")))
            assert rgb == palette(idx[y * w + x]), ("saturated", x, y)
    # and our own decoder reads the same saturated stream back
    rows, _ct = gif_pixels(p.read_bytes())
    assert [c for r in rows for c in r] == idx

    # (b) Java encoder (interlaced, mcs=8) -> our decoder
    for doc_id, w, h in ((11, 60, 40), (254, 25, 19)):
        p = tmp_path / f"java{doc_id}.gif"
        java("encode", str(p), str(doc_id), str(w), str(h))
        rows, ct = gif_pixels(p.read_bytes())
        assert len(rows) == h and len(rows[0]) == w
        for y in range(h):
            for x in range(w):
                want = _gif_pixel_law(doc_id, x, y)
                assert ct[rows[y][x]][:3] == palette(want), (doc_id, x, y)


# ---------------------------------------------------------------------------
# PNG codec (deflate-compressed decode with filter reversal)
# ---------------------------------------------------------------------------

from hbase_hadoop_flightsearch_spark.functions.multimodal import (  # noqa: E402
    _png_pixel_law,
    _synth_png,
    png_pixels,
)


def test_png_synth_decode_matches_law_all_filters():
    """Roundtrip through real zlib compression: every image with h >= 5
    exercises all five PNG filter types (row y uses filter y % 5)."""
    from hbase_hadoop_flightsearch_spark.functions.multimodal import (
        PNG_H_MOD,
        PNG_W_MOD,
    )

    for doc_id in (0, 1, 7, 42, 120, 254):
        w = doc_id % PNG_W_MOD + 2
        h = doc_id % PNG_H_MOD + 2
        rows = png_pixels(_synth_png(doc_id))
        assert len(rows) == h and len(rows[0]) == w
        for y in range(h):
            for x in range(w):
                assert rows[y][x] == _png_pixel_law(doc_id, x, y), (
                    doc_id, x, y,
                )


def test_png_crc_verification_catches_corruption():
    """A flipped byte anywhere in a chunk body must be caught by the CRC
    check, not silently decoded."""
    p = bytearray(_synth_png(7))
    # flip one byte inside the IDAT body (after sig+IHDR chunk = 8+25=33,
    # IDAT data starts at 33+8)
    p[45] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        png_pixels(bytes(p))
    assert png_pixels(b"not a png") is None


@pytest.mark.skipif(
    __import__("shutil").which("javac") is None
    or __import__("shutil").which("java") is None,
    reason="JDK not on PATH",
)
def test_png_codec_interops_with_java_imageio(tmp_path):
    """(a) PNGs written here decode pixel-exactly in Java ImageIO;
    (b) PNGs written by ImageIO — whose writer picks ITS OWN filter
    types — decode pixel-exactly here."""
    import subprocess

    java_src = """
import java.awt.image.BufferedImage;
import java.io.File;
import javax.imageio.ImageIO;
public class PngXCheck {
  public static void main(String[] a) throws Exception {
    if (a[0].equals("encode")) {
      int id = Integer.parseInt(a[2]), w = Integer.parseInt(a[3]), h = Integer.parseInt(a[4]);
      BufferedImage img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB);
      for (int y = 0; y < h; y++) for (int x = 0; x < w; x++) {
        int r = (id + 3*x + 7*y) % 256, g = (2*id + 5*x + 11*y) % 256, b = (3*id + 13*x + 17*y) % 256;
        img.setRGB(x, y, (r << 16) | (g << 8) | b);
      }
      ImageIO.write(img, "png", new File(a[1]));
    } else {
      BufferedImage img = ImageIO.read(new File(a[1]));
      System.out.println(img.getWidth() + " " + img.getHeight());
      StringBuilder sb = new StringBuilder();
      for (int y = 0; y < img.getHeight(); y++) {
        for (int x = 0; x < img.getWidth(); x++) {
          int p = img.getRGB(x, y);
          sb.append((p>>16)&255).append(',').append((p>>8)&255).append(',').append(p&255).append(' ');
        }
        sb.append('\\n');
      }
      System.out.print(sb);
    }
  }
}
"""
    (tmp_path / "PngXCheck.java").write_text(java_src)
    subprocess.run(
        ["javac", "PngXCheck.java"], cwd=tmp_path, check=True,
        capture_output=True,
    )

    def java(*args):
        return subprocess.run(
            ["java", "-cp", str(tmp_path), "PngXCheck", *args],
            check=True, capture_output=True, text=True,
        ).stdout

    # (a) ours -> Java
    for doc_id in (7, 42):
        p = tmp_path / f"ours{doc_id}.png"
        p.write_bytes(_synth_png(doc_id))
        out = java("decode", str(p)).splitlines()
        w, h = map(int, out[0].split())
        for y in range(h):
            cells = out[1 + y].split()
            for x in range(w):
                rgb = tuple(map(int, cells[x].split(",")))
                assert rgb == _png_pixel_law(doc_id, x, y), (doc_id, x, y)

    # (b) Java -> ours (bigger image so ImageIO's filter heuristics vary)
    for doc_id, w, h in ((11, 40, 30), (254, 12, 14)):
        p = tmp_path / f"java{doc_id}.png"
        java("encode", str(p), str(doc_id), str(w), str(h))
        rows = png_pixels(p.read_bytes())
        assert len(rows) == h and len(rows[0]) == w
        for y in range(h):
            for x in range(w):
                assert rows[y][x] == _png_pixel_law(doc_id, x, y), (
                    doc_id, x, y,
                )


def test_media_curation_hash_column_is_precision_exact(spark, sf_smoke):
    """Regression: pandas coerces int+None columns to float64, silently
    rounding 64-bit hashes above 2^53 (caught at sf0.1 as phantom
    cluster merges). The composite's survivor hashes must equal the
    directly-computed values bit-for-bit."""
    from hbase_hadoop_flightsearch_spark.functions.multimodal import (
        _synth_bmp,
        bmp_pixels,
    )
    from hbase_hadoop_flightsearch_spark.operators.dedup import (
        _ahash_from_pixels,
    )
    from hbase_hadoop_flightsearch_spark.plans.pipelines import (
        pipeline_media_curation,  # noqa: F401 — import check
    )
    from hbase_hadoop_flightsearch_spark.sources.catalog import load_table

    # drive the same mapInPandas body through Spark via the registered
    # query's internal scan: recompute expected from the ok-law
    docs = [
        r["doc_id"]
        for r in load_table(spark, sf_smoke, "documents")
        .select("doc_id")
        .collect()
        if r["doc_id"] % 3 == 0
    ]
    expected = {
        _ahash_from_pixels(bmp_pixels(_synth_bmp(i))) for i in docs
    }
    got = pipeline_media_curation(spark, sf_smoke).collect()[0]
    assert got["n_ok"] == len(docs)
    assert got["n_clusters"] == len(expected)
    assert any(abs(h) > (1 << 53) for h in expected), (
        "fixture must exercise hashes beyond float53 precision"
    )


def test_exif_orientation_both_byte_orders_and_absence():
    from hbase_hadoop_flightsearch_spark.functions.multimodal import (
        EXIF_ORIENTATION_TAG,
        _synth_jpeg_exif,
        jpeg_exif_orientation,
    )

    for doc_id in (0, 4, 7, 15):
        assert jpeg_exif_orientation(_synth_jpeg_exif(doc_id)) == (
            doc_id % 8 + 1
        )
    # big-endian (MM) Exif block
    tiff = (
        b"MM\x00*"
        + struct.pack(">I", 8)
        + struct.pack(">H", 1)
        + struct.pack(">HHIHH", EXIF_ORIENTATION_TAG, 3, 1, 6, 0)
        + struct.pack(">I", 0)
    )
    exif = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", 2 + len(exif)) + exif
    assert jpeg_exif_orientation(b"\xff\xd8" + app1) == 6
    # plain JPEG without APP1 -> None; non-JPEG -> None
    assert jpeg_exif_orientation(_jpeg(10, 10)) is None
    assert jpeg_exif_orientation(b"nope") is None


# ---------------------------------------------------------------------------
# Baseline JPEG codec (the last real pixel path)
# ---------------------------------------------------------------------------


def test_jpeg_synth_decode_matches_law_exactly():
    """The block-constant corpus makes the lossy codec integer-exact:
    flat blocks are DC-only and a uniform-8 quant table divides the DC
    losslessly, so decoded Y/Cb/Cr equal the law byte-for-byte and RGB
    equals the fixed-point conversion of the law."""
    from hbase_hadoop_flightsearch_spark.functions.multimodal import (
        JPEG_BH_MOD,
        JPEG_BW_MOD,
        _jpeg_block_law,
        _synth_jpeg,
        jpeg_decode,
    )

    for doc_id in (0, 1, 5, 7, 42, 199, 254, 499):
        out = jpeg_decode(_synth_jpeg(doc_id))
        bw = doc_id % JPEG_BW_MOD + 1
        bh = doc_id % JPEG_BH_MOD + 1
        assert (out["w"], out["h"]) == (8 * bw, 8 * bh)
        for by in range(bh):
            for bx in range(bw):
                yv, cb, cr = _jpeg_block_law(doc_id, bx, by)
                blk = out["ycbcr"][
                    8 * by: 8 * by + 8, 8 * bx: 8 * bx + 8
                ]
                assert (blk == (yv, cb, cr)).all(), (doc_id, bx, by)
                # fixed-point RGB, clamped — decoder's documented law
                r = min(255, max(0, yv + ((91881 * (cr - 128) + 32768) >> 16)))
                g = min(255, max(0, yv + ((-22554 * (cb - 128)
                                           - 46802 * (cr - 128) + 32768) >> 16)))
                b = min(255, max(0, yv + ((116130 * (cb - 128) + 32768) >> 16)))
                rgbblk = out["rgb"][
                    8 * by: 8 * by + 8, 8 * bx: 8 * bx + 8
                ]
                assert (rgbblk == (r, g, b)).all(), (doc_id, bx, by)


def test_jpeg_decoder_rejects_garbage_and_names_unsupported():
    import struct

    import pytest as _pytest

    from hbase_hadoop_flightsearch_spark.functions.multimodal import (
        jpeg_decode,
    )

    assert jpeg_decode(b"not a jpeg") is None
    assert jpeg_decode(b"\x89PNG\r\n\x1a\n") is None
    # arithmetic coding (SOF9) raises with a NAMED error, not a crash
    sof9 = (b"\xff\xd8\xff\xc9" + struct.pack(">H", 11) + b"\x08"
            + struct.pack(">HH", 8, 8) + b"\x01\x01\x11\x00")
    with _pytest.raises(ValueError, match="arithmetic"):
        jpeg_decode(sof9)
    # truncated entropy stream raises, never hangs
    from hbase_hadoop_flightsearch_spark.functions.multimodal import (
        _synth_jpeg,
    )
    good = _synth_jpeg(42)
    with _pytest.raises((ValueError, IndexError)):
        jpeg_decode(good[: len(good) - 4] + b"\xff\xd9")


@pytest.mark.skipif(
    __import__("shutil").which("javac") is None
    or __import__("shutil").which("java") is None,
    reason="JDK not on PATH",
)
def test_jpeg_codec_interops_with_java_imageio(tmp_path):
    """(a) JPEGs written here — including the one-symbol EOB Huffman
    table — decode in Java ImageIO within the spec's IDCT tolerance of
    our own decode; (b) JPEGs written by ImageIO (its own quant tables,
    its own subsampling choice) decode here within lossy-codec tolerance
    of the original pixels. JPEG is lossy, so unlike the GIF/PNG interop
    the assertion is a tight band (<= 4/255 per channel on flat blocks),
    not equality — that band is what the T.81 IDCT accuracy clause plus
    one quantization round trip permits."""
    import subprocess

    from hbase_hadoop_flightsearch_spark.functions.multimodal import (
        _synth_jpeg,
        jpeg_decode,
    )

    java_src = """
import java.awt.image.BufferedImage;
import java.io.File;
import javax.imageio.ImageIO;
public class JpegXCheck {
  public static void main(String[] a) throws Exception {
    if (a[0].equals("encode")) {
      int id = Integer.parseInt(a[2]), w = Integer.parseInt(a[3]), h = Integer.parseInt(a[4]);
      BufferedImage img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB);
      for (int y = 0; y < h; y++) for (int x = 0; x < w; x++) {
        int tx = x / 16, ty = y / 16;
        int r = (id + 37*tx + 53*ty) % 256, g = (2*id + 41*tx + 59*ty) % 256, b = (3*id + 43*tx + 61*ty) % 256;
        img.setRGB(x, y, (r << 16) | (g << 8) | b);
      }
      ImageIO.write(img, "jpg", new File(a[1]));
    } else {
      BufferedImage img = ImageIO.read(new File(a[1]));
      System.out.println(img.getWidth() + " " + img.getHeight());
      StringBuilder sb = new StringBuilder();
      for (int y = 0; y < img.getHeight(); y++) {
        for (int x = 0; x < img.getWidth(); x++) {
          int p = img.getRGB(x, y);
          sb.append((p>>16)&255).append(',').append((p>>8)&255).append(',').append(p&255).append(' ');
        }
        sb.append('\\n');
      }
      System.out.print(sb);
    }
  }
}
"""
    (tmp_path / "JpegXCheck.java").write_text(java_src)
    subprocess.run(
        ["javac", "JpegXCheck.java"], cwd=tmp_path, check=True,
        capture_output=True,
    )

    def java(*args):
        return subprocess.run(
            ["java", "-cp", str(tmp_path), "JpegXCheck", *args],
            check=True, capture_output=True, text=True,
        ).stdout

    # (a) ours -> Java: ImageIO accepts the file and lands within the
    # IDCT-tolerance band of our own decode of the same bytes.
    for doc_id in (7, 42, 101):
        p = tmp_path / f"ours{doc_id}.jpg"
        p.write_bytes(_synth_jpeg(doc_id))
        mine = jpeg_decode(p.read_bytes())["rgb"]
        out = java("decode", str(p)).splitlines()
        w, h = map(int, out[0].split())
        assert (w, h) == (mine.shape[1], mine.shape[0])
        worst = 0
        for y in range(h):
            cells = out[1 + y].split()
            for x in range(w):
                rgb = tuple(map(int, cells[x].split(",")))
                for c in range(3):
                    worst = max(worst, abs(rgb[c] - int(mine[y, x, c])))
        assert worst <= 4, f"doc {doc_id}: max channel diff {worst}"

    # (b) Java -> ours: 32x32, constant per 16x16 tile so ImageIO's
    # subsampling choice (4:2:0 for TYPE_INT_RGB) cannot smear edges.
    for doc_id in (11, 254):
        p = tmp_path / f"java{doc_id}.jpg"
        java("encode", str(p), str(doc_id), "32", "32")
        out = jpeg_decode(p.read_bytes())
        assert (out["w"], out["h"]) == (32, 32)
        worst = 0
        for y in range(32):
            ty = y // 16
            for x in range(32):
                tx = x // 16
                want = (
                    (doc_id + 37 * tx + 53 * ty) % 256,
                    (2 * doc_id + 41 * tx + 59 * ty) % 256,
                    (3 * doc_id + 43 * tx + 61 * ty) % 256,
                )
                for c in range(3):
                    worst = max(
                        worst, abs(want[c] - int(out["rgb"][y, x, c]))
                    )
        assert worst <= 4, f"doc {doc_id}: max channel diff {worst}"


# ---------------------------------------------------------------------------
# AVI video container + raw-frame decode
# ---------------------------------------------------------------------------


def test_avi_synth_decode_matches_law_all_frames():
    from hbase_hadoop_flightsearch_spark.functions.multimodal import (
        AVI_F_MOD,
        AVI_H_MOD,
        AVI_W_MOD,
        _avi_pixel_law,
        _synth_avi,
        avi_frames,
    )

    for doc_id in (0, 1, 7, 42, 59, 254):
        frames = avi_frames(_synth_avi(doc_id))
        w = doc_id % AVI_W_MOD + 2
        h = doc_id % AVI_H_MOD + 2
        assert len(frames) == doc_id % AVI_F_MOD + 2
        for f, frame in enumerate(frames):
            assert len(frame) == h and len(frame[0]) == w
            for y, row in enumerate(frame):
                for x, px in enumerate(row):
                    assert px == _avi_pixel_law(doc_id, f, x, y)


def test_avi_decoder_rejects_garbage_and_names_codec_errors():
    import struct

    import pytest as _pytest

    from hbase_hadoop_flightsearch_spark.functions.multimodal import (
        _synth_avi,
        avi_frames,
    )

    assert avi_frames(b"not an avi") is None
    assert avi_frames(b"RIFF\x04\x00\x00\x00WAVE") is None  # RIFF, not AVI
    # Compressed codec must raise a NAMED error, not garbage output:
    # flip biCompression in strf from 0 to 'MJPG'.
    good = bytearray(_synth_avi(7))
    strf_at = bytes(good).index(b"strf") + 8
    struct.pack_into("<I", good, strf_at + 16, 0x47504A4D)  # 'MJPG'
    with _pytest.raises(ValueError, match="unsupported AVI codec"):
        avi_frames(bytes(good))
    # Declared-vs-actual frame-count mismatch is detected via avih.
    good2 = bytearray(_synth_avi(7))
    avih_at = bytes(good2).index(b"avih") + 8
    struct.pack_into("<I", good2, avih_at + 16, 99)  # dwTotalFrames
    with _pytest.raises(ValueError, match="frame count mismatch"):
        avi_frames(bytes(good2))


def test_avi_walker_honors_riff_even_padding():
    """An odd-sized chunk inserted before movi must not desync the walk
    (RIFF pads odd chunks with one byte that is NOT counted in the
    size)."""
    import struct

    from hbase_hadoop_flightsearch_spark.functions.multimodal import (
        _synth_avi,
        avi_frames,
    )

    base = _synth_avi(3)
    baseline = avi_frames(base)
    movi_at = base.index(b"LIST", 12 + 4)  # first LIST is hdrl; find movi
    # locate the movi LIST specifically
    pos = 12
    while True:
        fourcc = base[pos: pos + 4]
        (size,) = struct.unpack_from("<I", base, pos + 4)
        if fourcc == b"LIST" and base[pos + 8: pos + 12] == b"movi":
            movi_at = pos
            break
        pos += 8 + size + (size % 2)
    junk = b"JUNK" + struct.pack("<I", 3) + b"odd" + b"\x00"  # padded
    patched = bytearray(base[:movi_at] + junk + base[movi_at:])
    struct.pack_into(
        "<I", patched, 4, struct.unpack_from("<I", patched, 4)[0] + len(junk)
    )
    assert avi_frames(bytes(patched)) == baseline


@pytest.mark.skipif(
    __import__("shutil").which("javac") is None
    or __import__("shutil").which("java") is None,
    reason="JDK not on PATH",
)
def test_jpeg_progressive_decode_interops_with_imageio(tmp_path):
    """PROGRESSIVE (SOF2) decode: ImageIO writes real multi-scan
    progressive files (DC-first at Al=1, two AC-first bands at Al=2,
    AC refinement to Al=1, DC refinement, AC refinement to Al=0 — the
    standard libjpeg scan script) and our successive-approximation
    decoder must land within 1/255 on grayscale (no chroma confound)
    and 2/255 on a hard RGB gradient through 4:2:0 subsampling + the
    libjpeg-identical triangular upsampler."""
    import subprocess

    from hbase_hadoop_flightsearch_spark.functions.multimodal import (
        jpeg_decode,
    )

    java_src = """
import java.awt.image.BufferedImage;
import java.io.File;
import javax.imageio.*;
import javax.imageio.stream.FileImageOutputStream;
public class ProgXCheck {
  public static void main(String[] a) throws Exception {
    int w = Integer.parseInt(a[1]), h = Integer.parseInt(a[2]);
    boolean gray = a[0].equals("gray");
    BufferedImage img = new BufferedImage(
        w, h, gray ? BufferedImage.TYPE_BYTE_GRAY : BufferedImage.TYPE_INT_RGB);
    for (int y = 0; y < h; y++) for (int x = 0; x < w; x++) {
      if (gray) img.getRaster().setSample(x, y, 0, (x * 8 + y * 3) % 256);
      else {
        int r = (x * 4) % 256, g = (y * 5) % 256, b = ((x + y) * 3) % 256;
        img.setRGB(x, y, (r << 16) | (g << 8) | b);
      }
    }
    ImageWriter wr = ImageIO.getImageWritersByFormatName("jpg").next();
    ImageWriteParam pp = wr.getDefaultWriteParam();
    pp.setProgressiveMode(ImageWriteParam.MODE_DEFAULT);
    wr.setOutput(new FileImageOutputStream(new File(a[3])));
    wr.write(null, new javax.imageio.IIOImage(img, null, null), pp);
    wr.dispose();
    BufferedImage back = ImageIO.read(new File(a[3]));
    StringBuilder sb = new StringBuilder();
    for (int y = 0; y < h; y++) {
      for (int x = 0; x < w; x++) {
        // TYPE_BYTE_GRAY getRGB applies a colorspace transform; read the
        // raw sample instead so both modes compare codec output only.
        if (gray) { int v = back.getRaster().getSample(x, y, 0);
                    sb.append(v).append(',').append(v).append(',').append(v).append(' '); }
        else { int p = back.getRGB(x, y);
               sb.append((p>>16)&255).append(',').append((p>>8)&255).append(',').append(p&255).append(' '); }
      }
      sb.append('\\n');
    }
    System.out.print(sb);
  }
}
"""
    (tmp_path / "ProgXCheck.java").write_text(java_src)
    subprocess.run(
        ["javac", "ProgXCheck.java"], cwd=tmp_path, check=True,
        capture_output=True,
    )
    for mode, w, h, tol in (("gray", 32, 16, 1), ("rgb", 64, 48, 2)):
        f = tmp_path / f"{mode}.jpg"
        ref_txt = subprocess.run(
            ["java", "-cp", str(tmp_path), "ProgXCheck", mode,
             str(w), str(h), str(f)],
            check=True, capture_output=True, text=True,
        ).stdout.splitlines()
        data = f.read_bytes()
        assert b"\xff\xc2" in data  # really progressive
        out = jpeg_decode(data)
        assert (out["w"], out["h"]) == (w, h)
        worst = 0
        for y in range(h):
            cells = ref_txt[y].split()
            for x in range(w):
                rgb = tuple(map(int, cells[x].split(",")))
                for c in range(3):
                    worst = max(
                        worst, abs(rgb[c] - int(out["rgb"][y, x, c]))
                    )
        assert worst <= tol, f"{mode}: max diff {worst}"


def test_ppm_parser_comments_and_corruption():
    """The P6 tokenizer must survive '#' comments between ANY header
    tokens (doc_id 15 hits both injection sites), and must raise named
    errors on wrong magic / truncated planes — one rotten object costs
    one row, never a silent wrong answer."""
    import pytest as _pytest

    from hbase_hadoop_flightsearch_spark.functions.multimodal import (
        _ppm_pixel,
        _synth_ppm,
        ppm_pixels,
    )

    for doc_id in (0, 3, 5, 7, 15):
        px = ppm_pixels(_synth_ppm(doc_id))
        h, w = len(px), len(px[0])
        assert (w, h) == (doc_id % 8 + 2, doc_id % 6 + 2)
        for y in range(h):
            for x in range(w):
                assert px[y][x] == _ppm_pixel(doc_id, x, y)

    with _pytest.raises(ValueError, match="magic"):
        ppm_pixels(b"P5\n2 2\n255\n" + b"\x00" * 12)
    with _pytest.raises(ValueError, match="truncated"):
        ppm_pixels(_synth_ppm(7)[:-2])


def test_codec_table_memos_are_bounded():
    """VERDICT r15 #7: the Huffman-table memos are keyed on DHT table
    BYTES, so a corpus of per-file-optimized tables must not grow them
    without bound in a long-lived reused Python worker. Feed more
    distinct synthetic tables than the cap and assert the caps hold AND
    the construction stays correct after eviction."""
    from hbase_hadoop_flightsearch_spark.functions import multimodal as mm

    cap = mm._CODEC_MEMO_CAP
    mm._CANON_CACHE.clear()
    # distinct (bits, vals) specs: one 2-entry length-1..2 table per v
    for v in range(cap + 50):
        bits = [1, 1] + [0] * 14
        vals = [v % 256, (v + 1) % 256]
        codes = mm._canonical_codes(bits, vals)
        assert codes[vals[0]] == (0, 1) and codes[vals[1]] == (2, 2)
        assert len(mm._CANON_CACHE) <= cap
    # an evicted entry is silently rebuilt with identical values
    codes = mm._canonical_codes([1, 1] + [0] * 14, [0, 1])
    assert codes == {0: (0, 1), 1: (2, 2)}
    assert len(mm._CANON_CACHE) <= cap
    assert len(mm._HUFF_INV_CACHE) <= cap
