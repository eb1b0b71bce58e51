"""Multimodal binary-column plumbing: schema, metadata scan, Arrow decode
stub (deterministic fake path + explicit NotImplementedError gate)."""

import hashlib

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from search_engine_spark.training_data import multimodal


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "spark media bytes"), (3, "x" * 5000)],
        "doc_id long, text string",
    )
    return multimodal.synthesize_media(docs)


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id",
        "mime",
        "payload",
        "meta",
    ]
    rows = {r["media_id"]: r for r in media.collect()}
    assert bytes(rows[1]["payload"]) == b"hello world"
    assert rows[1]["meta"]["n_bytes"] == 11
    assert rows[1]["meta"]["sha256"] == hashlib.sha256(b"hello world").hexdigest()


def test_binary_metadata(media):
    rows = {r["media_id"]: r for r in multimodal.binary_metadata(media).collect()}
    assert rows[2]["n_bytes"] == len(b"spark media bytes")
    assert rows[2]["magic_hex"] == b"spar".hex()
    assert rows[2]["sha256"] == hashlib.sha256(b"spark media bytes").hexdigest()


def test_decode_features_fake_deterministic(media):
    a = {r["media_id"]: r for r in multimodal.decode_features(media, fake=True).collect()}
    b = {r["media_id"]: r for r in multimodal.decode_features(media, fake=True).collect()}
    assert set(a) == {1, 2, 3}
    for mid in a:
        assert a[mid]["width"] == b[mid]["width"]
        assert a[mid]["feature"] == b[mid]["feature"]
        assert len(a[mid]["feature"]) == 16
        assert abs(sum(a[mid]["feature"]) - 1.0) < 1e-6
    # pseudo-decode matches the documented formula
    assert a[1]["width"] == (11 % 640) + 1
    assert a[1]["height"] == ((11 // 7) % 480) + 1


def test_decode_features_stub_raises(media):
    with pytest.raises(PythonException, match="NotImplementedError"):
        multimodal.decode_features(media, fake=False).collect()


def test_repartition_by_bytes(media):
    out = multimodal.repartition_by_bytes(media, target_batch_bytes=2000)
    # ~5k total bytes / 2k budget -> 3 partitions
    assert out.rdd.getNumPartitions() == 3
    assert out.count() == 3


# ---------------------------------------------------------------------------
# Real stdlib decoders: WAV (wave module) and binary PPM
# ---------------------------------------------------------------------------
def test_decode_wav_real(spark):
    rows = [
        (i, "audio/wav", multimodal.synthesize_wav(i), None) for i in (1, 2, 9)
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {
        r["media_id"]: r
        for r in multimodal.decode_features(media, fake=False, dim=8).collect()
    }
    for mid in (1, 2, 9):
        r = got[mid]
        assert r["n_frames"] == 2000
        assert r["width"] is None and r["height"] is None
        assert len(r["feature"]) == 8
        # a square wave's RMS equals its amplitude; amp = 8000 + 997*id % 20000
        amp = (8000 + (mid * 997) % 20000) / 32768.0
        assert all(abs(f - amp) < 0.02 for f in r["feature"]), (mid, r["feature"])


def test_decode_ppm_real(spark):
    rows = [(7, "image/x-portable-pixmap", multimodal.synthesize_ppm(7, 32, 24), None)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    r = multimodal.decode_features(media, fake=False, dim=16).collect()[0]
    assert (r["width"], r["height"], r["n_frames"]) == (32, 24, 1)
    assert abs(sum(r["feature"]) - 1.0) < 1e-6
    # oracle: run the pure decoder directly on the same bytes
    w, h, n, feat = multimodal.decode_payload(multimodal.synthesize_ppm(7, 32, 24), 16)
    assert [round(x, 6) for x in r["feature"]] == [round(x, 6) for x in feat]


def test_decode_mixed_formats_one_pass(spark):
    """One decode pass over a mixed wav/ppm table: magic-byte dispatch."""
    rows = [
        (1, "audio/wav", multimodal.synthesize_wav(1, n_frames=800), None),
        (2, "image/x-portable-pixmap", multimodal.synthesize_ppm(2), None),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {
        r["media_id"]: r
        for r in multimodal.decode_features(media, fake=False).collect()
    }
    assert got[1]["n_frames"] == 800 and got[1]["width"] is None
    assert got[2]["width"] == 32 and got[2]["n_frames"] == 1


# ---------------------------------------------------------------------------
# Resize (real P6 nearest-neighbor) + temporal frame sampling (real WAV)
# ---------------------------------------------------------------------------
def test_resize_ppm_pixel_math():
    """2x2 checkerboard -> 4x4 nearest neighbor: each source pixel becomes
    a 2x2 block; header rewritten without comments."""
    src = b"P6\n2 2\n255\n" + bytes(
        (255, 0, 0) + (0, 255, 0) + (0, 0, 255) + (255, 255, 255)
    )
    out = multimodal._resize_ppm(src, 4, 4)
    w, h, maxval, raster = multimodal._parse_ppm(out)
    assert (w, h, maxval) == (4, 4, 255)
    px = [tuple(raster[i : i + 3]) for i in range(0, len(raster), 3)]
    grid = [px[r * 4 : (r + 1) * 4] for r in range(4)]
    assert grid[0][0] == grid[0][1] == grid[1][1] == (255, 0, 0)
    assert grid[0][2] == grid[1][3] == (0, 255, 0)
    assert grid[2][0] == grid[3][1] == (0, 0, 255)
    assert grid[3][3] == (255, 255, 255)


def test_resize_ppm_downscale_samples_grid():
    img = multimodal.synthesize_ppm(5, width=32, height=24)
    out = multimodal._resize_ppm(img, 8, 6)
    w, h, _, raster = multimodal._parse_ppm(out)
    assert (w, h) == (8, 6) and len(raster) == 8 * 6 * 3
    # nearest neighbor: out pixel (x,y) = src pixel (x*32//8, y*24//6)
    _, _, _, src = multimodal._parse_ppm(img)
    for x, y in ((0, 0), (7, 5), (3, 2)):
        sx, sy = x * 32 // 8, y * 24 // 6
        assert (
            tuple(raster[(y * 8 + x) * 3 : (y * 8 + x) * 3 + 3])
            == tuple(src[(sy * 32 + sx) * 3 : (sy * 32 + sx) * 3 + 3])
        )


def test_resize_images_spark_roundtrip(spark):
    media = spark.createDataFrame(
        [(i, multimodal.synthesize_ppm(i)) for i in range(6)],
        "media_id long, payload binary",
    )
    rows = {
        r["media_id"]: r
        for r in multimodal.resize_images(media, 8, 6).collect()
    }
    assert len(rows) == 6
    for i in range(6):
        expect = multimodal._resize_ppm(multimodal.synthesize_ppm(i), 8, 6)
        assert bytes(rows[i]["payload"]) == expect
        assert (rows[i]["width"], rows[i]["height"]) == (8, 6)


def test_resize_rejects_codec_formats(spark, media):
    with pytest.raises(PythonException, match="NotImplementedError"):
        multimodal.resize_images(media, 8, 6).collect()


def test_sample_wav_windows_and_roundtrip():
    src = multimodal.synthesize_wav(3, n_frames=2000)
    samples = multimodal._sample_wav(src, 4, 512)
    assert [s[0] for s in samples] == [0, 496, 992, 1488]  # even spacing
    assert all(s[1] == 512 for s in samples)
    import io
    import wave

    for start, take, blob in samples:
        with wave.open(io.BytesIO(blob)) as w:
            assert w.getnframes() == take
            assert w.getframerate() == 8000 and w.getnchannels() == 1
    # the windows are actual slices of the source stream
    with wave.open(io.BytesIO(src)) as w:
        w.setpos(496)
        expect = w.readframes(512)
    with wave.open(io.BytesIO(samples[1][2])) as w:
        assert w.readframes(512) == expect


def test_sample_wav_short_file_truncates():
    src = multimodal.synthesize_wav(1, n_frames=300)
    samples = multimodal._sample_wav(src, 4, 512)
    assert [s[0] for s in samples] == [0, 0, 0, 0]  # span is 0
    assert all(s[1] == 300 for s in samples)


def test_sample_frames_spark_one_row_per_window(spark):
    media = spark.createDataFrame(
        [(i, multimodal.synthesize_wav(i)) for i in range(5)],
        "media_id long, payload binary",
    )
    out = multimodal.sample_frames(media, n_samples=3, window_frames=256)
    rows = out.collect()
    assert len(rows) == 5 * 3
    got = {(r["media_id"], r["sample_idx"]): r for r in rows}
    for i in range(5):
        expect = multimodal._sample_wav(multimodal.synthesize_wav(i), 3, 256)
        for k, (start, take, blob) in enumerate(expect):
            r = got[(i, k)]
            assert (r["start_frame"], r["n_frames"]) == (start, take)
            assert bytes(r["payload"]) == blob


def test_sample_frames_rejects_codec_formats(spark, media):
    with pytest.raises(PythonException, match="NotImplementedError"):
        multimodal.sample_frames(media).collect()


# --------------------------------------------------------------------------
# PNG codec (r04): real zlib inflate + filter reconstruction, stdlib-only
# --------------------------------------------------------------------------
def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def test_png_roundtrip_and_dispatch():
    from search_engine_spark.training_data.multimodal import (
        _encode_png,
        _parse_png,
        _resize_png,
        decode_payload,
        synthesize_png,
    )

    for mid in range(4):
        p = synthesize_png(mid)
        w, h, rgb = _parse_png(p)
        assert (w, h) == (24, 18) and len(rgb) == 24 * 18 * 3
        assert _parse_png(_encode_png(w, h, rgb))[2] == rgb
    w, h, nf, feat = decode_payload(synthesize_png(3), 16)
    assert (w, h, nf) == (24, 18, 1)
    assert abs(sum(feat) - 1.0) < 1e-9
    rw, rh, _ = _parse_png(_resize_png(synthesize_png(3), 12, 9))
    assert (rw, rh) == (12, 9)


def test_png_all_filter_types_reconstruct():
    """A raster encoded with each of the five PNG row filters must decode
    to the identical RGB bytes — the filter math is the decoder's core."""
    import struct
    import zlib

    from search_engine_spark.training_data.multimodal import (
        _PNG_MAGIC,
        _parse_png,
    )

    w, h = 7, 6
    rgb = bytes(
        (x * 37 + y * 11 + c * 5) % 256
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )
    stride = w * 3

    def encode(filters):
        raw = bytearray()
        prev = bytes(stride)
        for y in range(h):
            row = rgb[y * stride : (y + 1) * stride]
            f = filters[y % len(filters)]
            out = bytearray([f])
            for i in range(stride):
                a = row[i - 3] if i >= 3 else 0
                b = prev[i]
                c = prev[i - 3] if i >= 3 else 0
                if f == 0:
                    v = row[i]
                elif f == 1:
                    v = (row[i] - a) & 0xFF
                elif f == 2:
                    v = (row[i] - b) & 0xFF
                elif f == 3:
                    v = (row[i] - ((a + b) >> 1)) & 0xFF
                else:
                    p_ = a + b - c
                    pa, pb, pc = abs(p_ - a), abs(p_ - b), abs(p_ - c)
                    pred = (
                        a
                        if (pa <= pb and pa <= pc)
                        else (b if pb <= pc else c)
                    )
                    v = (row[i] - pred) & 0xFF
                out.append(v)
            raw += out
            prev = row
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (
            _PNG_MAGIC
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b"")
        )

    for filters in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
        assert _parse_png(encode(filters)) == (w, h, rgb), filters


def test_png_color_types_and_crc():
    import struct
    import zlib

    import pytest as _pytest

    from search_engine_spark.training_data.multimodal import (
        _PNG_MAGIC,
        _parse_png,
        synthesize_png,
    )

    w, h = 7, 6

    def encode_ct(ct, ch, pix, plte=None):
        stride = w * ch
        raw = b"".join(
            b"\x00" + pix[y * stride : (y + 1) * stride] for y in range(h)
        )
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
        out = _PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
        if plte is not None:
            out += _png_chunk(b"PLTE", plte)
        return out + _png_chunk(b"IDAT", zlib.compress(raw)) + _png_chunk(b"IEND", b"")

    rgb = bytes(
        (x * 37 + y * 11 + c * 5) % 256
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )
    gray = bytes((x * 9 + y * 3) % 256 for y in range(h) for x in range(w))
    # grayscale expands to (v, v, v)
    assert _parse_png(encode_ct(0, 1, gray))[2] == b"".join(
        bytes((v, v, v)) for v in gray
    )
    # RGBA drops alpha
    rgba = b"".join(rgb[i * 3 : i * 3 + 3] + b"\x80" for i in range(w * h))
    assert _parse_png(encode_ct(6, 4, rgba))[2] == rgb
    # gray+alpha
    ga = b"".join(bytes((v, 200)) for v in gray)
    assert _parse_png(encode_ct(4, 2, ga))[2] == b"".join(
        bytes((v, v, v)) for v in gray
    )
    # palette resolves through PLTE
    plte = bytes(b for v in range(256) for b in (v, (v * 2) % 256, 255 - v))
    idx = bytes((x + y) % 256 for y in range(h) for x in range(w))
    assert _parse_png(encode_ct(3, 1, idx, plte))[2] == b"".join(
        plte[v * 3 : v * 3 + 3] for v in idx
    )
    # corrupt bytes fail the CRC gate, never silently decode
    bad = bytearray(synthesize_png(1))
    bad[40] ^= 0xFF
    with _pytest.raises(ValueError, match="CRC"):
        _parse_png(bytes(bad))
    # a palette index past the PLTE table fails loudly, never truncates
    # the raster (the CRC is valid here — only the index is out of range)
    short_plte = plte[: 8 * 3]  # max index in idx is 11 -> out of range
    with _pytest.raises(ValueError, match="palette index"):
        _parse_png(encode_ct(3, 1, idx, short_plte))


def test_resize_images_handles_mixed_ppm_png_gif(spark):
    from search_engine_spark.training_data.multimodal import (
        _parse_gif,
        _parse_png,
        _parse_ppm,
        resize_images,
        synthesize_gif,
        synthesize_png,
        synthesize_ppm,
    )

    media = spark.createDataFrame(
        [(1, synthesize_ppm(1)), (2, synthesize_png(2)), (3, synthesize_gif(3))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: bytes(r["payload"]) for r in resize_images(media, 8, 5).collect()}
    assert _parse_ppm(rows[1])[:2] == (8, 5)
    assert _parse_png(rows[2])[:2] == (8, 5)
    assert _parse_gif(rows[3])[:2] == (8, 5)


def test_gif_roundtrip_and_dispatch():
    from search_engine_spark.training_data.multimodal import (
        _encode_gif,
        _parse_gif,
        _resize_gif,
        decode_payload,
        synthesize_gif,
    )

    for mid in range(4):
        p = synthesize_gif(mid)
        w, h, rgb = _parse_gif(p)
        assert (w, h) == (24, 18) and len(rgb) == 24 * 18 * 3
        assert _parse_gif(_encode_gif(w, h, rgb))[2] == rgb
        # deterministic bytes (the digest-replay property)
        assert synthesize_gif(mid) == p
    w, h, nf, feat = decode_payload(synthesize_gif(3), 16)
    assert (w, h, nf) == (24, 18, 1)
    assert abs(sum(feat) - 1.0) < 1e-9
    rw, rh, _ = _parse_gif(_resize_gif(synthesize_gif(3), 12, 9))
    assert (rw, rh) == (12, 9)


def test_gif_lzw_codec_properties():
    """LZW decode must invert LZW encode across alphabet sizes and
    lengths that force every code-width bump and the table-full
    clear/reset path — the variable-code-width schedule is the
    decoder's core."""
    import random

    from search_engine_spark.training_data.multimodal import (
        _gif_lzw_decode,
        _gif_lzw_encode,
    )

    rng = random.Random(1234)
    for n_sym in (4, 16, 64, 256):
        min_code = max(2, (n_sym - 1).bit_length())
        for n in (1, 2, 37, 700, 5000):
            data = bytes(rng.randrange(n_sym) for _ in range(n))
            assert _gif_lzw_decode(_gif_lzw_encode(data, min_code), min_code, n) == data
    # highly repetitive input fills the 4096-entry table -> clear/reset
    data = bytes([1, 2] * 30000)
    assert _gif_lzw_decode(_gif_lzw_encode(data, 2), 2, len(data)) == data
    # KwK case: aba ab abab-style self-referencing code sequence
    data = b"\x01\x01\x01\x01\x01\x01\x01"
    assert _gif_lzw_decode(_gif_lzw_encode(data, 2), 2, len(data)) == data


def _gif_craft(w, h, indices, palette, interlace=False, pre_image=b"",
               min_code=None):
    """Hand-assemble a GIF (the test-side encoder, independent of
    _encode_gif's choices) so interlace/extension/corruption paths are
    exercised from raw bytes."""
    import struct

    from search_engine_spark.training_data.multimodal import _gif_lzw_encode

    size_exp = max(1, (len(palette) // 3 - 1).bit_length())
    mc = min_code if min_code is not None else max(2, size_exp)
    gct = palette + b"\x00" * (3 * (1 << size_exp) - len(palette))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (size_exp - 1), 0, 0)
    out += gct
    out += pre_image
    out += struct.pack(
        "<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0
    )
    out.append(mc)
    lzw = _gif_lzw_encode(bytes(indices), mc)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def test_gif_interlace_extensions_and_structure_checks():
    import pytest as _pytest

    from search_engine_spark.training_data.multimodal import (
        _parse_gif,
        synthesize_gif,
    )

    w, h = 6, 10
    palette = bytes(b for v in range(4) for b in (v * 60, 255 - v * 60, v * 80))
    rows = [bytes((x + y) % 4 for x in range(w)) for y in range(h)]
    flat = b"".join(rows)
    # interlaced rows arrive in pass order 0,8 / 4 / 2,6 / 1,3,5,7,9
    pass_order = [0, 8, 4, 2, 6, 1, 3, 5, 7, 9]
    inter = b"".join(rows[y] for y in pass_order)
    expect = b"".join(palette[v * 3 : v * 3 + 3] for v in flat)
    assert _parse_gif(_gif_craft(w, h, flat, palette))[2] == expect
    assert _parse_gif(_gif_craft(w, h, inter, palette, interlace=True))[2] == expect
    # GIF89a extensions (e.g. graphic control) are skipped, not fatal
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    assert _parse_gif(_gif_craft(w, h, flat, palette, pre_image=gce))[2] == expect
    # structure failures are loud, never a silently wrong raster:
    with _pytest.raises(ValueError, match="not a GIF"):
        _parse_gif(b"NOTGIF" + b"\x00" * 20)
    with _pytest.raises(ValueError, match="truncated"):
        _parse_gif(synthesize_gif(1)[:40])
    # palette index beyond the color table: 2-entry palette, codes up to 3
    small_palette = palette[: 2 * 3]
    bad_idx = bytes((x + y) % 4 for y in range(h) for x in range(w))
    with _pytest.raises(ValueError, match="palette index"):
        _parse_gif(_gif_craft(w, h, bad_idx, small_palette, min_code=2))
    # pixel count disagreeing with the image descriptor
    with _pytest.raises(ValueError, match="pixels"):
        _parse_gif(_gif_craft(w, h, flat[: w * h - 5], palette))
    # trailer before any image descriptor
    trailer_first = synthesize_gif(0)[:13] + synthesize_gif(0)[13 : 13 + 3 * 64] + b"\x3b"
    with _pytest.raises(ValueError, match="trailer"):
        _parse_gif(trailer_first)


def test_jpeg_flat_color_exact_and_roundtrip_error_bounded():
    """Flat blocks are DC-only and must decode exactly; smooth gradients
    round-trip within small quantization error (JPEG is lossy — what must
    be exact is determinism, asserted in the dispatch test)."""
    import math

    import numpy as np

    from search_engine_spark.training_data.jpeg import _parse_jpeg, encode_jpeg

    w, h = 16, 16
    flat = bytes([120, 200, 64] * (w * h))
    for samp in ((1, 1), (2, 2), (2, 1)):
        dw, dh, out = _parse_jpeg(encode_jpeg(w, h, flat, quality=90, luma_sampling=samp))
        assert (dw, dh) == (w, h)
        assert np.abs(
            np.frombuffer(out, dtype=np.uint8).astype(int)
            - np.frombuffer(flat, dtype=np.uint8).astype(int)
        ).max() == 0, f"flat color must be DC-exact at {samp}"
    w, h = 24, 18
    grad = bytes(
        max(0, min(255, int(127 + 60 * math.sin(x * 0.3) + 40 * math.cos(y * 0.4))))
        for y in range(h) for x in range(w) for _ in range(3)
    )
    for q, bound in ((50, 4.0), (90, 2.0)):
        _, _, out = _parse_jpeg(encode_jpeg(w, h, grad, quality=q))
        a = np.frombuffer(out, dtype=np.uint8).astype(float)
        b = np.frombuffer(grad, dtype=np.uint8).astype(float)
        rmse = float(np.sqrt(((a - b) ** 2).mean()))
        assert rmse < bound, f"q{q}: rmse {rmse}"


def test_jpeg_subsampling_restarts_grayscale():
    """4:2:0 / 4:2:2 streams, RSTn markers (incl. the mod-8 ordinal wrap)
    and single-component frames — all produced by the encoder itself, so
    the decoder paths are driven by honestly-encoded streams."""
    import numpy as np

    from search_engine_spark.training_data.jpeg import _parse_jpeg, encode_jpeg

    w, h = 40, 25
    raster = bytes(
        c for y in range(h) for x in range(w)
        for c in ((x * 9) % 256, (y * 13) % 256, (x * 7 + y * 11) % 256)
    )
    base = np.frombuffer(raster, dtype=np.uint8).astype(float)
    for samp, dri in (((2, 2), 0), ((2, 1), 0), ((2, 2), 2)):
        dw, dh, out = _parse_jpeg(
            encode_jpeg(w, h, raster, quality=85, luma_sampling=samp, restart_interval=dri)
        )
        assert (dw, dh) == (w, h)
        a = np.frombuffer(out, dtype=np.uint8).astype(float)
        assert float(np.sqrt(((a - base) ** 2).mean())) < 30  # chroma decimation bound
    # restart ordinal wraps past RST7 (24 MCUs at dri=1)
    w2, h2 = 96, 16
    r2 = bytes((x * 3 + y * 5) % 256 for y in range(h2) for x in range(w2) for _ in range(3))
    enc = encode_jpeg(w2, h2, r2, quality=80, restart_interval=1)
    assert b"\xff\xd7" in enc and b"\xff\xd0" in enc  # really wrapped
    _, _, out = _parse_jpeg(enc)
    a = np.frombuffer(out, dtype=np.uint8).astype(float)
    b = np.frombuffer(r2, dtype=np.uint8).astype(float)
    assert float(np.sqrt(((a - b) ** 2).mean())) < 5
    # grayscale: one component, replicated channels, tracks BT.601 luma
    enc = encode_jpeg(w, h, raster, quality=85, grayscale=True)
    _, _, out = _parse_jpeg(enc)
    a = np.frombuffer(out, dtype=np.uint8).reshape(h, w, 3)
    assert (a[..., 0] == a[..., 1]).all() and (a[..., 1] == a[..., 2]).all()
    rb = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3).astype(float)
    yexp = 0.299 * rb[..., 0] + 0.587 * rb[..., 1] + 0.114 * rb[..., 2]
    assert float(np.sqrt(((a[..., 0] - yexp) ** 2).mean())) < 5


def test_jpeg_structure_failures_and_dispatch():
    import pytest as _pytest

    from search_engine_spark.training_data.jpeg import (
        _parse_jpeg,
        _resize_jpeg,
        synthesize_jpeg,
    )
    from search_engine_spark.training_data.multimodal import decode_payload

    enc = synthesize_jpeg(1)
    # deterministic bytes (the digest-replay property)
    assert synthesize_jpeg(1) == enc
    w, h, nf, feat = decode_payload(enc, 16)
    assert (w, h, nf) == (24, 18, 1) and abs(sum(feat) - 1.0) < 1e-9
    r = _resize_jpeg(enc, 10, 8)
    assert _parse_jpeg(r)[:2] == (10, 8) and _resize_jpeg(enc, 10, 8) == r
    with _pytest.raises(ValueError, match="not a JPEG"):
        _parse_jpeg(b"\x00\x01" + enc[2:])
    with _pytest.raises(ValueError, match="overruns|truncat"):
        _parse_jpeg(enc[:40])  # cut inside a header segment
    with _pytest.raises(ValueError, match="truncat|ended"):
        _parse_jpeg(enc[:-8])  # cut inside the entropy stream
    i = enc.index(b"\xff\xc0")
    with _pytest.raises(NotImplementedError, match="progressive"):
        _parse_jpeg(enc[:i] + b"\xff\xc2" + enc[i + 2 :])
    # an out-of-sequence restart marker is a structural error
    from search_engine_spark.training_data.jpeg import encode_jpeg

    raster = bytes((x + y) % 256 for y in range(16) for x in range(96) for _ in range(3))
    enc2 = encode_jpeg(96, 16, raster, quality=80, restart_interval=1)
    j = enc2.index(b"\xff\xd1")
    with _pytest.raises(ValueError, match="restart marker"):
        _parse_jpeg(enc2[:j] + b"\xff\xd5" + enc2[j + 2 :])


def test_resize_images_includes_jpeg(spark):
    from search_engine_spark.training_data.jpeg import _parse_jpeg, synthesize_jpeg
    from search_engine_spark.training_data.multimodal import resize_images

    media = spark.createDataFrame(
        [(1, synthesize_jpeg(1)), (2, synthesize_jpeg(2))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: bytes(r["payload"]) for r in resize_images(media, 8, 5).collect()}
    assert _parse_jpeg(rows[1])[:2] == (8, 5)
    assert _parse_jpeg(rows[2])[:2] == (8, 5)


def _gif_anim_craft(sw, sh, frames_spec, palette, bg_idx=0):
    """Hand-assemble a multi-frame GIF: frames_spec = list of
    (left, top, iw, ih, indices, disposal, transparent_idx_or_None)."""
    import struct

    from search_engine_spark.training_data.multimodal import _gif_lzw_encode

    size_exp = max(1, (len(palette) // 3 - 1).bit_length())
    mc = max(2, size_exp)
    gct = palette + b"\x00" * (3 * (1 << size_exp) - len(palette))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | (size_exp - 1), bg_idx, 0)
    out += gct
    for left, top, iw, ih, idx, disposal, transp in frames_spec:
        flags = (disposal << 2) | (1 if transp is not None else 0)
        out += b"\x21\xf9\x04" + bytes([flags, 0, 0, transp or 0, 0])
        out += struct.pack("<BHHHHB", 0x2C, left, top, iw, ih, 0)
        out.append(mc)
        lzw = _gif_lzw_encode(bytes(idx), mc)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def test_gif_animation_compositing_semantics():
    """Partial-frame painting, transparency holes, disposal 2 (restore
    region to background) and 3 (restore previous) — the full GIF89a
    compositing model, asserted pixel-by-pixel."""
    import pytest as _pytest

    from search_engine_spark.training_data.multimodal import _parse_gif_frames

    # palette: 0=red (also background), 1=green, 2=blue, 3=white
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    sw, sh = 4, 3

    def px(frame, x, y):
        i = (y * sw + x) * 3
        return tuple(frame[i : i + 3])

    frames_spec = [
        # frame 0: full canvas green, keep (disposal 1)
        (0, 0, 4, 3, [1] * 12, 1, None),
        # frame 1: 2x1 patch at (1,1) blue with a transparent hole at its
        # second pixel (index 3 transparent) -> underlying green shows
        (1, 1, 2, 1, [2, 3], 1, 3),
        # frame 2: 1x1 white at (0,0), disposal 2 -> region restored to
        # background (red) before the NEXT frame
        (0, 0, 1, 1, [3], 2, None),
        # frame 3: 1x1 white at (3,2), disposal 3 over the restored canvas
        (3, 2, 1, 1, [3], 3, None),
        # frame 4: empty-ish patch (transparent) -> shows the canvas with
        # frame 3's region restored to the PRE-frame-3 state
        (0, 0, 1, 1, [0], 1, 0),
    ]
    w, h, frames = _parse_gif_frames(_gif_anim_craft(sw, sh, frames_spec, pal))
    assert (w, h) == (sw, sh) and len(frames) == 5
    green, red, blue, white = (0, 255, 0), (255, 0, 0), (0, 0, 255), (255, 255, 255)
    assert px(frames[0], 0, 0) == green
    # frame 1: blue painted at (1,1); transparent hole at (2,1) keeps green
    assert px(frames[1], 1, 1) == blue and px(frames[1], 2, 1) == green
    # frame 2: white at origin, rest as frame 1
    assert px(frames[2], 0, 0) == white and px(frames[2], 1, 1) == blue
    # frame 3: disposal-2 of frame 2 restored (0,0) to BACKGROUND red
    assert px(frames[3], 0, 0) == red and px(frames[3], 3, 2) == white
    # frame 4: disposal-3 of frame 3 restored (3,2) to its prior green
    assert px(frames[4], 3, 2) == green and px(frames[4], 0, 0) == red
    # structure: a frame region past the logical screen is loud
    bad = [(3, 2, 2, 1, [1, 1], 0, None)]
    with _pytest.raises(ValueError, match="exceeds the logical screen"):
        _parse_gif_frames(_gif_anim_craft(sw, sh, bad, pal))


def test_gif_animation_sampling_and_spark_stage(spark):
    from search_engine_spark.training_data.multimodal import (
        _parse_gif_frames,
        _parse_png,
        _sample_gif_frames,
        decode_payload,
        sample_frames,
        synthesize_gif_animation,
        FEAT_DIM,
    )

    anim = synthesize_gif_animation(3, n_frames=7)
    w, h, frames = _parse_gif_frames(anim)
    assert len(frames) == 7
    # decode_payload reports the true animation length
    assert decode_payload(anim, FEAT_DIM)[2] == 7
    # evenly spaced picks incl. first and last frame; PNG payloads carry
    # the exact composited rasters
    picks = _sample_gif_frames(anim, 4)
    assert [p[0] for p in picks] == [0, 2, 4, 6]
    for fi, n, png in picks:
        assert n == 1 and _parse_png(png)[2] == frames[fi]
    # distributed stage: mixed WAV + animated GIF in one pass
    from search_engine_spark.training_data.multimodal import synthesize_wav

    media = spark.createDataFrame(
        [(1, synthesize_wav(1)), (2, anim)], "media_id long, payload binary"
    )
    rows = [
        (r["media_id"], r["sample_idx"], r["start_frame"], bytes(r["payload"]))
        for r in sample_frames(media, n_samples=3).collect()
    ]
    gif_rows = sorted((r for r in rows if r[0] == 2), key=lambda r: r[1])
    assert [r[2] for r in gif_rows] == [0, 3, 6]
    assert _parse_png(gif_rows[1][3])[2] == frames[3]
    assert len([r for r in rows if r[0] == 1]) == 3  # WAV windows intact
