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


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def full_png_bytes(px, filters=None, palette=None) -> bytes:
    """Encode an (h, w, ch) uint8 array as a complete PNG, applying the
    given per-row filter types (forward direction of PNG spec §9) — the
    round-trip fixture for the stdlib decoder."""
    import numpy as np

    px = np.asarray(px, dtype=np.int32)
    h, w, ch = px.shape
    ct = {1: 0, 2: 4, 3: 2, 4: 6}[ch] if palette is None else 3
    filters = filters or [0] * h
    flat = px.reshape(h, w * ch)
    stride = w * ch
    raw = bytearray()
    for y, f in enumerate(filters):
        rec = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, np.int32)
        if f == 0:
            filt = rec.copy()
        elif f == 1:
            left = np.concatenate([np.zeros(ch, np.int32), rec[:-ch]])
            filt = (rec - left) & 0xFF
        elif f == 2:
            filt = (rec - prev) & 0xFF
        elif f == 3:
            left = np.concatenate([np.zeros(ch, np.int32), rec[:-ch]])
            filt = (rec - ((left + prev) >> 1)) & 0xFF
        elif f == 4:
            filt = rec.copy()
            for x in range(stride):
                a = int(rec[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                filt[x] = (rec[x] - pr) & 0xFF
        raw.append(f)
        raw += bytes(int(v) for v in filt)
    ihdr = struct.pack(">II5B", w, h, 8, ct, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _chunk(b"PLTE", bytes(v for rgb in palette for v in rgb))
    out += _chunk(b"IDAT", zlib.compress(bytes(raw)))
    return out + _chunk(b"IEND", b"")


def test_decode_png_pixels_all_filters():
    """Round-trip through every scanline filter type (None/Sub/Up/
    Average/Paeth) — decoded pixels must equal the encoder input."""
    import numpy as np

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(5, 4, 3)).astype(np.uint8)
    got = mm.decode_png_pixels(full_png_bytes(px, filters=[0, 1, 2, 3, 4]))
    assert got is not None and got.shape == (5, 4, 3)
    assert (got == px).all()
    # grayscale + RGBA shapes
    g = rng.randint(0, 256, size=(3, 6, 1)).astype(np.uint8)
    assert (mm.decode_png_pixels(full_png_bytes(g, filters=[4, 3, 1])) == g).all()
    rgba = rng.randint(0, 256, size=(2, 2, 4)).astype(np.uint8)
    assert (mm.decode_png_pixels(full_png_bytes(rgba)) == rgba).all()
    # palette-indexed → PLTE lookup to RGB
    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255)]
    idx = np.array([[[0], [1]], [[2], [0]]], dtype=np.uint8)
    got = mm.decode_png_pixels(full_png_bytes(idx, palette=pal))
    assert got.tolist() == [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 0, 0]]]
    # non-PNG and truncated payloads refuse cleanly
    assert mm.decode_png_pixels(b"nope") is None
    assert mm.decode_png_pixels(full_png_bytes(px)[:40]) is None


def test_decode_image_pixels_on_spark(spark):
    """End-to-end full pixel decode: known image → exact integer pixel
    stats; undecodable payloads yield null stats."""
    import numpy as np

    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)  # 0..17
    rows = [
        (1, "image", bytearray(full_png_bytes(px, filters=[1, 4])), "s", 0),
        (2, "image", bytearray(b"garbage"), "s", 0),
        (3, "image", bytearray(jpeg_bytes(8, 8)), "s", 0),  # header-only JPEG
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {r.media_id: r for r in mm.decode_image_pixels(media, "real").collect()}
    assert (out[1].width, out[1].height, out[1].channels) == (3, 2, 3)
    assert (out[1].px_min, out[1].px_max) == (0, 17)
    assert out[1].px_mean_q == sum(range(18)) * 10_000 // 18
    assert out[2].width is None and out[3].width is None


def test_decode_image_pixels_pil_guard(spark):
    """decode_fn='pil' either uses Pillow (when installed) or raises the
    documented NotImplementedError at the codec slot."""
    import pytest

    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="Pillow"):
            mm.decode_image_pixels(
                spark.createDataFrame([], mm.MEDIA_SCHEMA), "pil"
            )
    else:
        px_rows = [(1, "image", bytearray(full_png_bytes(
            [[[9, 9, 9]]], filters=[0])), "s", 0)]
        media = spark.createDataFrame(px_rows, mm.MEDIA_SCHEMA)
        out = mm.decode_image_pixels(media, "pil").collect()
        assert out[0].px_mean_q == 9 * 10_000


def test_resize_images_nearest_neighbor(spark):
    """resize_images: decode → integer nearest-neighbor → raw HWC bytes;
    undecodable payloads keep their row with null pixels."""
    import numpy as np

    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, size=(6, 4, 3)).astype(np.uint8)
    rows = [
        (0, bytearray(full_png_bytes(px))),
        (1, bytearray(b"not a png")),
    ]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r.media_id: r for r in mm.resize_images(media, 2, 3).collect()}

    r0 = out[0]
    assert (r0.width, r0.height, r0.channels) == (4, 6, 3)
    assert (r0.out_width, r0.out_height) == (2, 3)
    got = np.frombuffer(bytes(r0.pixels), dtype=np.uint8).reshape(3, 2, 3)
    yi = (np.arange(3) * 6) // 3
    xi = (np.arange(2) * 4) // 2
    assert (got == px[yi[:, None], xi[None, :], :]).all()

    r1 = out[1]
    assert r1.pixels is None and (r1.out_width, r1.out_height) == (2, 3)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="positive"):
        mm.resize_images(media, 0, 3)


def test_image_ahash_real_png_and_fake_replay(spark):
    """aHash over real PNG payloads: identical pixels → identical hash,
    structurally different pixels → different hash, garbage → NULL; the
    fake path equals an exact Python replay of the stub cells."""
    import numpy as np

    # a 16x16 gradient and its copy; a checkerboard as the contrast
    grad = np.tile(np.arange(16, dtype=np.uint8) * 16, (16, 1))
    grad3 = np.repeat(grad[:, :, None], 3, axis=2)
    checker = (np.indices((16, 16)).sum(axis=0) % 2 * 255).astype(np.uint8)
    checker3 = np.repeat(checker[:, :, None], 3, axis=2)
    rows = [
        (1, full_png_bytes(grad3)),
        (2, full_png_bytes(grad3)),
        (3, full_png_bytes(checker3)),
        (4, b"not a png"),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, content binary"
    )
    got = {
        r["media_id"]: r["ahash"]
        for r in mm.image_ahash(media, decode_fn="real").collect()
    }
    assert got[1] == got[2] and got[1] is not None
    assert got[1] != got[3]
    assert got[4] is None

    # fake path vs exact replay
    texts = ["hello world", "aaaa", "z"]
    fm = spark.createDataFrame(
        [(i, t.encode()) for i, t in enumerate(texts)],
        "media_id long, content binary",
    )
    fgot = {
        r["media_id"]: r["ahash"]
        for r in mm.image_ahash(fm, decode_fn="fake").collect()
    }
    for i, t in enumerate(texts):
        cells = [ord(t[(k * len(t)) // 64]) for k in range(64)]
        mu = sum(cells) / 64.0
        h = 0
        for k, c in enumerate(cells):
            if c > mu:
                h |= 1 << k
        if h >= 1 << 63:
            h -= 1 << 64
        assert fgot[i] == h, (i, t)

    import pytest

    with pytest.raises(ValueError, match="grid"):
        mm.image_ahash(media, grid=9)
    with pytest.raises(ValueError, match="decode_fn"):
        mm.image_ahash(media, decode_fn="nope")
