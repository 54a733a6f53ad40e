"""Image-header parser units (pure Python, no Spark): real container
headers for PNG/GIF/BMP/JPEG built with struct, plus fallback behavior."""

import struct
import zlib

from ethos_spark.ops.multimodal import parse_image_meta, synth_png


def test_png_header():
    p = synth_png(1234, 987)
    assert len(p) == 33
    m = parse_image_meta(p)
    assert (m["width"], m["height"], m["codec"]) == (1234, 987, "png")
    assert m["n_bytes"] == 33 and m["header_byte"] == 0x89
    # CRC is actually valid
    assert struct.unpack(">I", p[-4:])[0] == zlib.crc32(p[12:-4]) & 0xFFFFFFFF


def test_gif_header():
    p = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 6
    m = parse_image_meta(p)
    assert (m["width"], m["height"], m["codec"]) == (320, 200, "gif")


def test_bmp_header():
    hdr = b"BM" + b"\x00" * 16 + struct.pack("<ii", 640, -480) + b"\x00" * 10
    m = parse_image_meta(hdr)
    # negative height = top-down DIB; reported as magnitude
    assert (m["width"], m["height"], m["codec"]) == (640, 480, "bmp")


def test_jpeg_sof_walk():
    # SOI, APP0 (16-byte payload), DQT (4-byte), SOF0 with h=480 w=640
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    dqt = b"\xff\xdb" + struct.pack(">H", 4) + b"\x00\x00"
    sof0 = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(
        ">HH", 480, 640
    ) + b"\x03" + b"\x00" * 9
    p = b"\xff\xd8" + app0 + dqt + sof0
    m = parse_image_meta(p)
    assert (m["width"], m["height"], m["codec"]) == (640, 480, "jpeg")
    # DHT (C4) must NOT be mistaken for a frame header
    dht = b"\xff\xc4" + struct.pack(">H", 4) + b"\x00\x00"
    p2 = b"\xff\xd8" + dht + sof0
    m2 = parse_image_meta(p2)
    assert (m2["width"], m2["height"], m2["codec"]) == (640, 480, "jpeg")


def test_raw_fallback_and_truncation():
    payload = b"not an image at all"
    n = len(payload)
    m = parse_image_meta(payload)
    assert m["codec"] == "raw"
    assert (m["width"], m["height"]) == (n % 640, (n * 7) % 480)
    # truncated PNG signature → raw, no crash
    assert parse_image_meta(b"\x89PNG")["codec"] == "raw"
    assert parse_image_meta(b"")["codec"] == "raw"
    assert parse_image_meta(b"\xff\xd8\xff")["codec"] == "raw"
