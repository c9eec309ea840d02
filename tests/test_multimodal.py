"""Real header-parsing path of the multimodal pipeline.

Fixtures are hand-built byte sequences following the public PNG / JPEG
/ GIF / BMP / RIFF-WAVE specs — no codec library involved, which is
the point: header metadata is pure byte arithmetic.
"""

from __future__ import annotations

import struct
import zlib

from time_series_db_spark.pipeline import multimodal as mm


def png_bytes(w: int, h: int, color_type: int = 6) -> bytes:
    ihdr = struct.pack(">II5B", w, h, 8, color_type, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk))
    )


def jpeg_bytes(w: int, h: int, channels: int = 3) -> bytes:
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0_payload = struct.pack(">BHHB", 8, h, w, channels) + b"\x01\x11\x00" * channels
    sof0 = b"\xff\xc0" + struct.pack(">H", len(sof0_payload) + 2) + sof0_payload
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def gif_bytes(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 4


def bmp_bytes(w: int, h: int) -> bytes:
    header = b"BM" + b"\x00" * 16
    return header + struct.pack("<ii", w, h) + b"\x00" * 8


def wav_bytes(rate: int, samples: list[int], channels: int = 1) -> bytes:
    pcm = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_parse_image_header_formats():
    assert mm.parse_image_header(png_bytes(640, 480)) == (640, 480, 4)
    assert mm.parse_image_header(png_bytes(11, 7, color_type=0)) == (11, 7, 1)
    assert mm.parse_image_header(jpeg_bytes(320, 240)) == (320, 240, 3)
    assert mm.parse_image_header(jpeg_bytes(8, 8, channels=1)) == (8, 8, 1)
    assert mm.parse_image_header(gif_bytes(99, 33)) == (99, 33, 3)
    assert mm.parse_image_header(bmp_bytes(50, 60)) == (50, 60, 3)
    # BMP stores negative height for top-down rows — dimensions stay positive
    assert mm.parse_image_header(bmp_bytes(50, -60)) == (50, 60, 3)
    assert mm.parse_image_header(b"not an image at all") is None
    assert mm.parse_image_header(b"\xff\xd8\x00garbage") is None


def test_parse_wav():
    rate, n, ch, off = mm.parse_wav(wav_bytes(8000, [0, 100, -100, 200]))
    assert (rate, n, ch) == (8000, 4, 1)
    assert mm.parse_wav(b"RIFFxxxxNOPE") is None
    assert mm.parse_wav(b"junk") is None


def test_decode_image_meta_real_on_spark(spark):
    rows = [
        (1, "image", bytearray(png_bytes(640, 480)), "s", 0),
        (2, "image", bytearray(jpeg_bytes(320, 240)), "s", 0),
        (3, "image", bytearray(b"garbage"), "s", 0),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {r.media_id: r for r in mm.decode_image_meta(media, "real").collect()}
    assert (out[1].width, out[1].height, out[1].n_pixels) == (640, 480, 640 * 480 * 4)
    assert (out[2].width, out[2].height, out[2].channels) == (320, 240, 3)
    assert out[3].width is None and out[3].n_pixels is None


def test_extract_audio_features_real_on_spark(spark):
    samples = [100, -100, 100, -100, 100, -100, 100, -100]
    rows = [
        (1, "audio", bytearray(wav_bytes(4000, samples)), "s", 0),
        (2, "audio", bytearray(b"not audio"), "s", 0),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {r.media_id: r for r in mm.extract_audio_features(media, "real").collect()}
    assert out[1].sample_rate == 4000
    assert out[1].n_samples == len(samples)
    assert out[1].duration_ms == len(samples) * 1000 // 4000
    assert out[1].rms_q == 100 * 100
    assert out[2].sample_rate is None
