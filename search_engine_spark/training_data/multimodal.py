"""Multimodal column plumbing: opaque binary media + typed metadata.

Images / audio / video ride through the pipeline as ``binary`` columns with a
typed metadata struct; compute-heavy decode / feature-extract / resize /
frame-sample runs as Arrow-batched ``mapInPandas`` stages so bytes never
round-trip through driver memory and each task handles a partition-sized
batch stream.

Decode support is format-honest:

- **REAL decoders, stdlib-only**: RIFF/WAVE audio (the ``wave`` module —
  sample rate, channel count, frame count, per-window RMS energy profile
  as the feature vector), binary PPM ``P6`` images (header + RGB raster
  parse), **PNG** (r04: zlib IDAT inflate + full filter
  reconstruction — None/Sub/Up/Average/Paeth — for 8-bit
  gray/palette/RGB/RGBA, CRC-verified, plus a deterministic RGB
  encoder), **GIF** (r05: real variable-width LZW decompression,
  global/local color tables, interlace reconstruction, plus a
  deterministic palette+LZW encoder), and **baseline JPEG** (r05,
  ``jpeg.py``: marker parse, canonical Huffman entropy decode with
  restart markers, dequantization, float IDCT, 4:4:4/4:2:2/4:2:0 chroma
  upsampling, BT.601 YCbCr→RGB, plus a deterministic Annex-K encoder);
  all four image formats produce width/height and the dim-bin luminance
  histogram feature and support nearest-neighbor resize.
- **STUB**: formats that require external codec libraries absent from
  this environment (MP4/MKV video) raise NotImplementedError inside
  the task (fail-fast, clearly marked); ``fake=True`` substitutes the
  deterministic pseudo-decoder for every payload so plumbing tests can
  run format-agnostically.

Scale notes: media rows are wide (MBs of binary) — repartition by size
budget, not row count, before a decode pass (``target_batch_bytes``), and
keep metadata-only queries on the pruned narrow columns so parquet never
reads the blob pages (column pruning does this for free).
"""

from __future__ import annotations

import array
import io
import wave
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source_url", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("sha256", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

# feature-vector width shared by decode_features and its driver pair
FEAT_DIM = 16

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def synthesize_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic media table from a text corpus (test/bench fixture).

    payload = utf-8 bytes of the text; metadata computed natively so the
    blob column itself is never shipped to Python.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("application/octet-stream").alias("mime"),
        payload.alias("payload"),
        F.struct(
            F.concat(F.lit("synthetic://"), F.col(id_col)).alias("source_url"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
        ).alias("meta"),
    )


def binary_metadata(media: DataFrame) -> DataFrame:
    """(media_id, n_bytes, magic_hex, sha256) — metadata scan, all JVM-side.

    magic_hex = first 4 payload bytes (the sniffing prefix a real pipeline
    dispatches decoders on). Pure Column expressions: at scale this reads
    only the payload column's pages it must (and nothing if metadata was
    precomputed into ``meta``).
    """
    return media.select(
        "media_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.lower(F.hex(F.substring(F.col("payload"), 1, 4))).alias("magic_hex"),
        F.sha2(F.col("payload"), 256).alias("sha256"),
    )


def repartition_by_bytes(
    media: DataFrame, target_batch_bytes: int = 64 << 20
) -> DataFrame:
    """Repartition so each task's payload volume ~= target_batch_bytes.

    Row-count partitioning misbehaves when blob sizes are skewed. The byte
    total comes from the narrow ``meta.n_bytes`` column when present (so
    parquet never reads the blob pages just to size the pass); falls back
    to octet_length(payload) for tables without precomputed metadata.
    """
    if "meta" in media.columns and any(
        f.name == "n_bytes" for f in media.schema["meta"].dataType.fields
    ):
        size_col = F.col("meta.n_bytes")
    else:
        size_col = F.octet_length("payload")
    total = media.agg(F.sum(size_col)).first()[0] or 0
    n_parts = max(1, int(total / target_batch_bytes) + 1)
    return media.repartition(n_parts, "media_id")


def _decode_wav(payload: bytes, dim: int) -> tuple[int | None, int | None, int, list[float]]:
    """RIFF/WAVE decode via the stdlib ``wave`` module.

    Returns (width=None, height=None, n_frames, feature) where feature is
    the per-window RMS amplitude profile over ``dim`` equal windows of the
    first channel, normalized to full scale — the shape a real
    audio-embedding stage consumes."""
    with wave.open(io.BytesIO(payload)) as w:
        nch = w.getnchannels()
        sw = w.getsampwidth()
        nf = w.getnframes()
        raw = w.readframes(nf)
    if sw == 2:
        samples = array.array("h")
        samples.frombytes(raw[: (len(raw) // 2) * 2])
        full_scale = 32768.0
    elif sw == 1:
        # WAV 8-bit is unsigned, midpoint 128
        samples = array.array("B")
        samples.frombytes(raw)
        samples = array.array("i", (s - 128 for s in samples))
        full_scale = 128.0
    else:
        raise NotImplementedError(f"wav sample width {sw} unsupported")
    if nch > 1:
        samples = samples[::nch]
    n = len(samples)
    feature = []
    for k in range(dim):
        lo, hi = (k * n) // dim, ((k + 1) * n) // dim
        if hi <= lo:
            feature.append(0.0)
            continue
        acc = 0.0
        for s in samples[lo:hi]:
            acc += float(s) * float(s)
        feature.append((acc / (hi - lo)) ** 0.5 / full_scale)
    return None, None, nf, feature


def _parse_ppm(payload: bytes) -> tuple[int, int, int, bytes]:
    """Binary PPM (``P6``) header + raster parse: header tokens (with
    comment support) then the RGB bytes. -> (width, height, maxval,
    raster)."""
    pos = 0

    def token() -> bytes:
        nonlocal pos
        while pos < len(payload):
            c = payload[pos : pos + 1]
            if c == b"#":  # comment to end of line
                while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                    pos += 1
            elif c.isspace():
                pos += 1
            else:
                break
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        return payload[start:pos]

    if token() != b"P6":
        raise ValueError("not a binary PPM")
    width, height, maxval = int(token()), int(token()), int(token())
    pos += 1  # single whitespace after maxval
    if maxval >= 256:
        raise NotImplementedError("16-bit PPM unsupported")
    return width, height, maxval, payload[pos : pos + width * height * 3]


def _decode_ppm(payload: bytes, dim: int) -> tuple[int, int, int, list[float]]:
    """P6 decode. Feature = ``dim``-bin luminance histogram, normalized."""
    width, height, maxval, raster = _parse_ppm(payload)
    hist = [0] * dim
    for i in range(0, len(raster) - 2, 3):
        # integer Rec.601-ish luminance
        y = (raster[i] * 299 + raster[i + 1] * 587 + raster[i + 2] * 114) // 1000
        hist[min(dim - 1, y * dim // (maxval + 1))] += 1
    tot = float(sum(hist)) or 1.0
    return width, height, 1, [h / tot for h in hist]


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# channels per PNG color type (bit depth 8 only)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _parse_png(payload: bytes) -> tuple[int, int, bytes]:
    """Full stdlib PNG decode -> (width, height, RGB raster bytes).

    Real decompression (zlib inflate of the IDAT stream) and real filter
    reconstruction (None/Sub/Up/Average/Paeth per the PNG spec §9), for
    8-bit gray / gray+alpha / palette / RGB / RGBA, non-interlaced.
    Chunk CRCs are verified — corrupt bytes fail loudly, never decode to
    a silently wrong image. Alpha is dropped (features/resize operate on
    color); palette entries resolve through PLTE."""
    import struct
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG stream")
    pos = 8
    ihdr = None
    plte = b""
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0:
        raise NotImplementedError(
            f"PNG bit depth {depth}/compression {comp} unsupported "
            "(8-bit, method-0 only)"
        )
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG unsupported")
    if color not in _PNG_CHANNELS:
        raise ValueError(f"PNG color type {color} invalid")
    ch = _PNG_CHANNELS[color]
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG raster size mismatch")
    prev = bytearray(stride)
    rgb = bytearray()
    for y in range(h):
        f = raw[y * (1 + stride)]
        row = bytearray(raw[y * (1 + stride) + 1 : (y + 1) * (1 + stride)])
        if f == 1:  # Sub
            for i in range(ch, stride):
                row[i] = (row[i] + row[i - ch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                row[i] = (row[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        elif f != 0:
            raise ValueError(f"PNG filter type {f} invalid")
        prev = row
        if color == 2:  # RGB
            rgb += row
        elif color == 6:  # RGBA -> drop alpha
            for i in range(0, stride, 4):
                rgb += row[i : i + 3]
        elif color == 0:  # gray
            for v in row:
                rgb += bytes((v, v, v))
        elif color == 4:  # gray+alpha
            for i in range(0, stride, 2):
                v = row[i]
                rgb += bytes((v, v, v))
        else:  # palette
            for v in row:
                if v * 3 + 3 > len(plte):
                    # an out-of-range index would slice to <3 bytes and
                    # silently misalign the RGB raster — fail loudly like
                    # every other corrupt-bytes path in this decoder
                    raise ValueError(
                        f"PNG palette index {v} out of range "
                        f"(PLTE has {len(plte) // 3} entries)"
                    )
                rgb += plte[v * 3 : v * 3 + 3]
    return w, h, bytes(rgb)


def _decode_png(payload: bytes, dim: int) -> tuple[int, int, int, list[float]]:
    """PNG decode. Feature = the same ``dim``-bin luminance histogram as
    P6 (shared downstream semantics: one feature space per modality)."""
    w, h, rgb = _parse_png(payload)
    hist = [0] * dim
    for i in range(0, len(rgb) - 2, 3):
        y = (rgb[i] * 299 + rgb[i + 1] * 587 + rgb[i + 2] * 114) // 1000
        hist[min(dim - 1, y * dim // 256)] += 1
    tot = float(sum(hist)) or 1.0
    return w, h, 1, [v / tot for v in hist]


def _encode_png(width: int, height: int, rgb: bytes) -> bytes:
    """Minimal deterministic PNG encoder: 8-bit RGB, filter 0 rows, one
    zlib-deflated IDAT. Fixed compression level so identical rasters
    encode to identical bytes (the digest-replay property the media
    pairs rely on)."""
    import struct
    import zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    stride = width * 3
    raw = b"".join(
        b"\x00" + rgb[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def synthesize_png(media_id: int, width: int = 24, height: int = 18) -> bytes:
    """Deterministic PNG: a diagonal gradient offset by media_id (distinct
    pattern from the PPM fixture so mixed-corpus tests tell them apart)."""
    raster = bytearray()
    for y in range(height):
        for x in range(width):
            v = (x * 11 + y * 17 + media_id * 29) % 256
            raster += bytes((v, 255 - v, (v + media_id) % 256))
    return _encode_png(width, height, bytes(raster))


def _resize_png(payload: bytes, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resize of a PNG, re-encoded as 8-bit RGB PNG with
    the same deterministic integer source indexing as _resize_ppm."""
    w, h, rgb = _parse_png(payload)
    out = bytearray()
    for y in range(out_h):
        sy = y * h // out_h
        row_base = sy * w * 3
        for x in range(out_w):
            sx = x * w // out_w
            i = row_base + sx * 3
            out += rgb[i : i + 3]
    return _encode_png(out_w, out_h, bytes(out))


# --------------------------------------------------------------------------
# GIF (r05, VERDICT task 4): real stdlib decoder — variable-width LZW
# (LSB-first packing, clear/EOI codes, table growth to 12 bits, deferred
# clear), global/local color tables, interlace reconstruction — plus a
# deterministic palette+LZW encoder so fixtures and resize round-trip.
# Structure is enforced fail-loudly like the PNG decoder: bad magic,
# truncated blocks, an LZW code beyond the table, a palette index beyond
# the active color table, or a pixel count disagreeing with the image
# descriptor all raise ValueError. Format per the public GIF89a
# specification (CompuServe, 1990).
# --------------------------------------------------------------------------


def _gif_lzw_decode(data: bytes, min_code: int, n_pixels: int) -> bytes:
    """LZW decompress a GIF image data stream to exactly n_pixels indices."""
    clear = 1 << min_code
    eoi = clear + 1
    roots = [bytes((i,)) for i in range(clear)] + [b"", b""]
    table = list(roots)
    code_size = min_code + 1
    out = bytearray()
    prev: bytes | None = None
    bitpos = 0
    total_bits = len(data) * 8
    while True:
        if bitpos + code_size > total_bits:
            raise ValueError("GIF LZW stream ended without an EOI code")
        byte_i = bitpos >> 3
        window = int.from_bytes(data[byte_i : byte_i + 3], "little")
        code = (window >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            table = list(roots)
            code_size = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError(f"GIF LZW first code {code} out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]  # the KwK case
        else:
            raise ValueError(
                f"GIF LZW code {code} beyond table size {len(table)}"
            )
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) >= (1 << code_size) and code_size < 12:
                code_size += 1
        out += entry
        prev = entry
        if len(out) > n_pixels:
            raise ValueError(
                f"GIF LZW decoded {len(out)}+ pixels, descriptor says "
                f"{n_pixels}"
            )
    if len(out) != n_pixels:
        raise ValueError(
            f"GIF decoded {len(out)} pixels, descriptor says {n_pixels}"
        )
    return bytes(out)


def _gif_lzw_encode(indices: bytes, min_code: int) -> bytes:
    """LZW compress palette indices (the exact decoder inverse: same
    code-width schedule, clear-and-reset when the table fills)."""
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    roots = {bytes((i,)): i for i in range(clear)}
    table = dict(roots)
    next_code = eoi + 1
    code_size = min_code + 1

    def bump_after_emit() -> None:
        # the decoder appends one table entry per data code it reads (after
        # the first); mirror that growth so both sides widen codes on the
        # same bit boundary
        nonlocal next_code, code_size
        if next_code < 4096:
            next_code += 1
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1

    put(clear, code_size)
    w = b""
    for v in indices:
        k = w + bytes((v,))
        if k in table:
            w = k
            continue
        put(table[w], code_size)
        if next_code < 4096:
            table[k] = next_code
            bump_after_emit()
        else:
            put(clear, code_size)
            table = dict(roots)
            next_code = eoi + 1
            code_size = min_code + 1
        w = bytes((v,))
    if w:
        put(table[w], code_size)
        bump_after_emit()
    put(eoi, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_GIF_DEINTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _parse_gif(payload: bytes) -> tuple[int, int, bytes]:
    """First-frame GIF decode to an RGB raster (width, height, rgb).

    GIF89a extensions are skipped; only the first image descriptor is
    decoded (animated GIFs are a frame stream — frame sampling beyond
    frame 0 stays with the video stubs)."""
    import struct

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError(f"not a GIF payload (magic {payload[:6]!r})")
    if len(payload) < 13:
        raise ValueError("GIF truncated in logical screen descriptor")
    _sw, _sh, packed = struct.unpack_from("<HHB", payload, 6)
    pos = 13
    gct = b""
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = payload[pos : pos + 3 * n]
        if len(gct) < 3 * n:
            raise ValueError("GIF truncated in global color table")
        pos += 3 * n
    while True:
        if pos >= len(payload):
            raise ValueError("GIF truncated before any image descriptor")
        block = payload[pos]
        pos += 1
        if block == 0x2C:
            break
        if block == 0x3B:
            raise ValueError("GIF trailer before any image descriptor")
        if block != 0x21:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        pos += 1  # extension label
        while True:
            if pos >= len(payload):
                raise ValueError("GIF truncated in extension sub-blocks")
            sz = payload[pos]
            pos += 1
            if sz == 0:
                break
            pos += sz
    if pos + 9 > len(payload):
        raise ValueError("GIF truncated in image descriptor")
    _left, _top, iw, ih, ipacked = struct.unpack_from("<HHHHB", payload, pos)
    pos += 9
    if iw == 0 or ih == 0:
        raise ValueError("GIF image descriptor has zero dimension")
    table = gct
    if ipacked & 0x80:
        n = 2 << (ipacked & 0x07)
        table = payload[pos : pos + 3 * n]
        if len(table) < 3 * n:
            raise ValueError("GIF truncated in local color table")
        pos += 3 * n
    if not table:
        raise ValueError("GIF image has neither global nor local color table")
    if pos >= len(payload):
        raise ValueError("GIF truncated before LZW minimum code size")
    min_code = payload[pos]
    pos += 1
    if not 2 <= min_code <= 11:
        raise ValueError(f"GIF LZW minimum code size {min_code} invalid")
    data = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("GIF truncated in image data sub-blocks")
        sz = payload[pos]
        pos += 1
        if sz == 0:
            break
        chunk = payload[pos : pos + sz]
        if len(chunk) < sz:
            raise ValueError("GIF truncated inside an image data sub-block")
        data += chunk
        pos += sz
    indices = _gif_lzw_decode(bytes(data), min_code, iw * ih)
    if ipacked & 0x40:  # interlaced: rows arrive in four passes
        deinterlaced = bytearray(iw * ih)
        src = 0
        for start, step in _GIF_DEINTERLACE:
            for y in range(start, ih, step):
                deinterlaced[y * iw : (y + 1) * iw] = indices[src : src + iw]
                src += iw
        indices = bytes(deinterlaced)
    n_entries = len(table) // 3
    rgb = bytearray()
    for v in indices:
        if v >= n_entries:
            raise ValueError(
                f"GIF palette index {v} out of range (color table has "
                f"{n_entries} entries)"
            )
        rgb += table[v * 3 : v * 3 + 3]
    return iw, ih, bytes(rgb)


def _parse_gif_frames(payload: bytes) -> tuple[int, int, list[bytes]]:
    """FULL animated-GIF decode -> (width, height, [RGB frame, ...]).

    Proper frame compositing per the GIF89a spec: each image descriptor
    paints its (left, top, w, h) region onto the logical-screen canvas,
    transparency (graphic-control flag + index) leaves the underlying
    canvas pixel, and disposal methods are honored — 0/1 keep the
    composited result, 2 restores the frame's region to the background
    color, 3 restores the previous canvas. Structure failures raise, same
    contract as the single-frame parser."""
    import struct

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError(f"not a GIF payload (magic {payload[:6]!r})")
    if len(payload) < 13:
        raise ValueError("GIF truncated in logical screen descriptor")
    sw, sh, packed, bg_idx = struct.unpack_from("<HHBB", payload, 6)
    pos = 13
    gct = b""
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = payload[pos : pos + 3 * n]
        if len(gct) < 3 * n:
            raise ValueError("GIF truncated in global color table")
        pos += 3 * n
    if sw == 0 or sh == 0:
        raise ValueError("GIF logical screen has zero dimension")
    bg_rgb = (
        tuple(gct[bg_idx * 3 : bg_idx * 3 + 3])
        if gct and bg_idx * 3 + 3 <= len(gct)
        else (0, 0, 0)
    )
    canvas = bytearray(bytes(bg_rgb) * (sw * sh))
    frames: list[bytes] = []
    disposal = 0
    transparent: int | None = None
    while True:
        if pos >= len(payload):
            raise ValueError("GIF truncated before trailer")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(payload):
                raise ValueError("GIF truncated in extension")
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphic control: applies to the NEXT image
                if pos + 6 > len(payload) or payload[pos] != 4:
                    raise ValueError("GIF graphic control extension malformed")
                flags = payload[pos + 1]
                disposal = (flags >> 2) & 0x07
                transparent = payload[pos + 4] if flags & 1 else None
                pos += 5
                if payload[pos] != 0:
                    raise ValueError("GIF graphic control missing terminator")
                pos += 1
            else:
                while True:
                    if pos >= len(payload):
                        raise ValueError("GIF truncated in extension sub-blocks")
                    sz = payload[pos]
                    pos += 1
                    if sz == 0:
                        break
                    pos += sz
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        if pos + 9 > len(payload):
            raise ValueError("GIF truncated in image descriptor")
        left, top, iw, ih, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if left + iw > sw or top + ih > sh:
            raise ValueError("GIF frame region exceeds the logical screen")
        table = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            table = payload[pos : pos + 3 * n]
            if len(table) < 3 * n:
                raise ValueError("GIF truncated in local color table")
            pos += 3 * n
        if not table:
            raise ValueError("GIF frame has neither global nor local color table")
        if pos >= len(payload):
            raise ValueError("GIF truncated before LZW minimum code size")
        min_code = payload[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            raise ValueError(f"GIF LZW minimum code size {min_code} invalid")
        data = bytearray()
        while True:
            if pos >= len(payload):
                raise ValueError("GIF truncated in image data sub-blocks")
            sz = payload[pos]
            pos += 1
            if sz == 0:
                break
            chunk = payload[pos : pos + sz]
            if len(chunk) < sz:
                raise ValueError("GIF truncated inside an image data sub-block")
            data += chunk
            pos += sz
        indices = _gif_lzw_decode(bytes(data), min_code, iw * ih)
        if ipacked & 0x40:
            deinterlaced = bytearray(iw * ih)
            src = 0
            for start, step in _GIF_DEINTERLACE:
                for y in range(start, ih, step):
                    deinterlaced[y * iw : (y + 1) * iw] = indices[src : src + iw]
                    src += iw
            indices = bytes(deinterlaced)
        n_entries = len(table) // 3
        prev_canvas = bytes(canvas) if disposal == 3 else None
        for y in range(ih):
            row = (top + y) * sw
            for x in range(iw):
                v = indices[y * iw + x]
                if transparent is not None and v == transparent:
                    continue
                if v >= n_entries:
                    raise ValueError(
                        f"GIF palette index {v} out of range (color table "
                        f"has {n_entries} entries)"
                    )
                i = (row + left + x) * 3
                canvas[i : i + 3] = table[v * 3 : v * 3 + 3]
        frames.append(bytes(canvas))
        if disposal == 2:  # restore region to background
            for y in range(ih):
                row = (top + y) * sw
                for x in range(iw):
                    i = (row + left + x) * 3
                    canvas[i : i + 3] = bytes(bg_rgb)
        elif disposal == 3 and prev_canvas is not None:
            canvas = bytearray(prev_canvas)
        disposal = 0
        transparent = None
    if not frames:
        raise ValueError("GIF contains no image frames")
    return sw, sh, frames


def _sample_gif_frames(
    payload: bytes, n_samples: int
) -> list[tuple[int, int, bytes]]:
    """Animated-GIF temporal sampling -> [(frame_idx, 1, png_payload)].

    Evenly-spaced composited frames, re-encoded as deterministic PNG —
    the format-normalized shape a downstream embed stage wants (PNG
    because a composited canvas can exceed 256 colors, which a GIF
    re-encode could not hold; same normalization choice as real
    pipelines make)."""
    w, h, frames = _parse_gif_frames(payload)
    n = min(n_samples, len(frames))
    if n == 1:
        picks = [0]
    else:
        picks = [i * (len(frames) - 1) // (n - 1) for i in range(n)]
    return [(fi, 1, _encode_png(w, h, frames[fi])) for fi in picks]


def encode_gif_animation(
    width: int, height: int, frames: list[bytes], delay_cs: int = 4
) -> bytes:
    """Deterministic multi-frame GIF89a encoder: full-canvas frames,
    per-frame local color tables (first-seen order, <=256 colors each),
    disposal 1, a graphic-control delay per frame."""
    import struct

    if not frames:
        raise ValueError("encode_gif_animation needs at least one frame")
    out = bytearray(b"GIF89a")

    def palette_of(rgb: bytes) -> tuple[dict, bytearray]:
        palette: dict[bytes, int] = {}
        idx = bytearray()
        for i in range(0, width * height * 3, 3):
            c = bytes(rgb[i : i + 3])
            j = palette.setdefault(c, len(palette))
            if j > 255:
                raise ValueError("GIF encoder: frame has more than 256 colors")
            idx.append(j)
        return palette, idx

    pal0, _ = palette_of(frames[0])
    size_exp0 = max(1, (len(pal0) - 1).bit_length())
    out += struct.pack("<HHBBB", width, height, 0x80 | (size_exp0 - 1), 0, 0)
    out += b"".join(pal0) + b"\x00\x00\x00" * ((1 << size_exp0) - len(pal0))
    for rgb in frames:
        if len(rgb) != width * height * 3:
            raise ValueError("encode_gif_animation: frame size mismatch")
        palette, indices = palette_of(rgb)
        size_exp = max(1, (len(palette) - 1).bit_length())
        min_code = max(2, size_exp)
        out += b"\x21\xf9\x04" + bytes([0x04]) + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += struct.pack(
            "<BHHHHB", 0x2C, 0, 0, width, height, 0x80 | (size_exp - 1)
        )
        out += b"".join(palette) + b"\x00\x00\x00" * ((1 << size_exp) - len(palette))
        out.append(min_code)
        lzw = _gif_lzw_encode(bytes(indices), min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def synthesize_gif_animation(
    media_id: int, n_frames: int = 6, width: int = 20, height: int = 14
) -> bytes:
    """Deterministic animated GIF: a banded pattern whose phase advances
    per frame (distinct per media_id and per frame)."""
    frames = []
    for f in range(n_frames):
        raster = bytearray()
        for y in range(height):
            for x in range(width):
                v = (x * 5 + y * 9 + f * 17 + media_id * 23) % 48
                raster += bytes((v * 5 % 256, (200 - v * 3) % 256, (v * 2 + f * 7) % 256))
        frames.append(bytes(raster))
    return encode_gif_animation(width, height, frames)


def _decode_gif(payload: bytes, dim: int) -> tuple[int, int, int, list[float]]:
    """GIF decode. Feature = the shared ``dim``-bin luminance histogram of
    the FIRST composited frame (one feature space per image modality, like
    P6/PNG); ``n_frames`` reports the true animation length (r05)."""
    w, h, frames = _parse_gif_frames(payload)
    rgb = frames[0]
    hist = [0] * dim
    for i in range(0, len(rgb) - 2, 3):
        y = (rgb[i] * 299 + rgb[i + 1] * 587 + rgb[i + 2] * 114) // 1000
        hist[min(dim - 1, y * dim // 256)] += 1
    tot = float(sum(hist)) or 1.0
    return w, h, len(frames), [v / tot for v in hist]


def _encode_gif(width: int, height: int, rgb: bytes) -> bytes:
    """Deterministic single-frame GIF89a encoder: first-seen-order palette
    (<=256 colors, else ValueError), global color table, non-interlaced,
    real LZW compression. Identical rasters encode to identical bytes —
    the digest-replay property the media pairs rely on."""
    import struct

    palette: dict[bytes, int] = {}
    indices = bytearray()
    for i in range(0, width * height * 3, 3):
        c = bytes(rgb[i : i + 3])
        idx = palette.setdefault(c, len(palette))
        if idx > 255:
            raise ValueError("GIF encoder: raster has more than 256 colors")
        indices.append(idx)
    size_exp = max(1, (len(palette) - 1).bit_length())  # 2<<(exp-1) entries
    n_entries = 1 << size_exp
    min_code = max(2, size_exp)
    gct = b"".join(palette) + b"\x00\x00\x00" * (n_entries - len(palette))
    lzw = _gif_lzw_encode(bytes(indices), min_code)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", width, height, 0x80 | (size_exp - 1), 0, 0)
    out += gct
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, width, height, 0)
    out.append(min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def synthesize_gif(media_id: int, width: int = 24, height: int = 18) -> bytes:
    """Deterministic GIF: a 64-color banded pattern offset by media_id
    (distinct from the PPM and PNG fixtures so mixed-corpus tests tell
    the three image formats apart)."""
    raster = bytearray()
    for y in range(height):
        for x in range(width):
            v = (x * 7 + y * 13 + media_id * 31) % 64
            raster += bytes((v * 4 % 256, (255 - v * 3) % 256, (v * 2 + media_id) % 256))
    return _encode_gif(width, height, bytes(raster))


def _resize_gif(payload: bytes, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resize of a GIF, re-encoded with the same
    deterministic integer source indexing as _resize_ppm/_resize_png
    (the palette can only shrink, so re-encoding cannot overflow)."""
    w, h, rgb = _parse_gif(payload)
    out = bytearray()
    for y in range(out_h):
        sy = y * h // out_h
        row_base = sy * w * 3
        for x in range(out_w):
            sx = x * w // out_w
            i = row_base + sx * 3
            out += rgb[i : i + 3]
    return _encode_gif(out_w, out_h, bytes(out))


def decode_payload(payload: bytes | None, dim: int) -> tuple[int | None, int | None, int, list[float]]:
    """Magic-byte dispatch to a real decoder; raises NotImplementedError
    for formats needing external codecs (JPEG/MP4/...)."""
    if payload is None:
        return None, None, 0, [0.0] * dim
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return _decode_wav(payload, dim)
    if payload[:2] == b"P6":
        return _decode_ppm(payload, dim)
    if payload[:8] == _PNG_MAGIC:
        return _decode_png(payload, dim)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(payload, dim)
    if payload[:2] == b"\xff\xd8":
        from .jpeg import _decode_jpeg

        return _decode_jpeg(payload, dim)
    raise NotImplementedError(
        f"no stdlib decoder for magic {payload[:4]!r}; MP4/MKV video needs "
        "codec libraries not installed in this environment"
    )


def synthesize_wav(media_id: int, n_frames: int = 2000, framerate: int = 8000) -> bytes:
    """Deterministic 16-bit mono WAV: a square wave whose period and
    amplitude derive from media_id (no RNG, no clock)."""
    period = 20 + (media_id * 7) % 50
    amp = 8000 + (media_id * 997) % 20000
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(framerate)
        frames = array.array(
            "h",
            (
                amp if (i // period) % 2 == 0 else -amp
                for i in range(n_frames)
            ),
        )
        w.writeframes(frames.tobytes())
    return buf.getvalue()


def synthesize_ppm(media_id: int, width: int = 32, height: int = 24) -> bytes:
    """Deterministic P6 image: a horizontal gradient offset by media_id."""
    header = f"P6\n# synthetic {media_id}\n{width} {height}\n255\n".encode()
    raster = bytearray()
    for y in range(height):
        for x in range(width):
            v = (x * 255 // max(1, width - 1) + media_id * 13) % 256
            raster += bytes((v, (v + y) % 256, 255 - v))
    return header + bytes(raster)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)


def _resize_ppm(payload: bytes, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resize of a P6 image, re-encoded as P6.

    Deterministic integer source indexing (``sx = x * w // out_w``), so
    the bytes are reproducible anywhere — the property the media_resize
    pair's import-time oracle replay relies on."""
    w, h, maxval, raster = _parse_ppm(payload)
    out = bytearray(f"P6\n{out_w} {out_h}\n{maxval}\n".encode())
    for y in range(out_h):
        sy = y * h // out_h
        row_base = sy * w * 3
        for x in range(out_w):
            sx = x * w // out_w
            i = row_base + sx * 3
            out += raster[i : i + 3]
    return bytes(out)


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    target_batch_bytes: int = 64 << 20,
) -> DataFrame:
    """mapInPandas image-resize stage -> RESIZED_SCHEMA.

    REAL for P6 PPM (stdlib parse + nearest-neighbor). A payload whose
    format needs an external codec (JPEG/PNG/...) raises
    NotImplementedError inside the task — fail fast, never a silently
    wrong image. Batches are byte-budget partitioned like every decode
    pass (blob sizes are skewed; row counts mislead)."""
    sized = repartition_by_bytes(media, target_batch_bytes)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None:
                    # unlike decode_features (which emits a zero feature),
                    # a resize has no meaningful output for a missing blob
                    # — fail with a actionable message, not bytes(None)
                    raise ValueError(
                        f"resize: media_id={int(mid)} has a NULL payload; "
                        "filter null payloads before resizing"
                    )
                b = bytes(p)
                if b[:2] == b"P6":
                    payloads.append(_resize_ppm(b, width, height))
                elif b[:8] == _PNG_MAGIC:
                    payloads.append(_resize_png(b, width, height))
                elif b[:6] in (b"GIF87a", b"GIF89a"):
                    payloads.append(_resize_gif(b, width, height))
                elif b[:2] == b"\xff\xd8":
                    from .jpeg import _resize_jpeg

                    payloads.append(_resize_jpeg(b, width, height))
                else:
                    raise NotImplementedError(
                        f"resize: no stdlib decoder for magic {b[:4]!r}; "
                        "video formats need codec libraries not installed here"
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "width": width,
                    "height": height,
                    "payload": payloads,
                }
            )

    return sized.select("media_id", "payload").mapInPandas(run, RESIZED_SCHEMA)


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_idx", T.IntegerType(), False),
        T.StructField("start_frame", T.LongType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)


def _sample_wav(payload: bytes, n_samples: int, window_frames: int) -> list[tuple[int, int, bytes]]:
    """N evenly-spaced windows from a WAV stream, each re-encoded as a
    standalone WAV with the source's params -> [(start_frame, n_frames,
    bytes)]. Window starts span [0, nf - window] inclusive (a single
    sample starts at 0); short files yield shorter final windows."""
    with wave.open(io.BytesIO(payload)) as w:
        params = w.getparams()
        nf = w.getnframes()
        out: list[tuple[int, int, bytes]] = []
        span = max(0, nf - window_frames)
        for k in range(n_samples):
            start = (k * span) // (n_samples - 1) if n_samples > 1 else 0
            w.setpos(start)
            take = min(window_frames, nf - start)
            frames = w.readframes(take)
            buf = io.BytesIO()
            with wave.open(buf, "wb") as o:
                o.setnchannels(params.nchannels)
                o.setsampwidth(params.sampwidth)
                o.setframerate(params.framerate)
                o.writeframes(frames)
            out.append((start, take, buf.getvalue()))
    return out


def sample_frames(
    media: DataFrame,
    n_samples: int = 4,
    window_frames: int = 512,
    target_batch_bytes: int = 64 << 20,
) -> DataFrame:
    """mapInPandas temporal sampling stage -> FRAME_SAMPLE_SCHEMA (one row
    per sampled window).

    REAL for RIFF/WAVE via the stdlib ``wave`` module — the audio/video
    frame-sampling shape (evenly-spaced windows re-encoded standalone,
    ready for a downstream embed/transcribe stage). Container formats
    needing codecs (MP4/MKV/...) raise NotImplementedError inside the
    task."""
    sized = repartition_by_bytes(media, target_batch_bytes)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, starts, lens, blobs = [], [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None:
                    raise ValueError(
                        f"sample_frames: media_id={int(mid)} has a NULL "
                        "payload; filter null payloads before sampling"
                    )
                b = bytes(p)
                if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                    samples = _sample_wav(b, n_samples, window_frames)
                elif b[:6] in (b"GIF87a", b"GIF89a"):
                    # animated GIF: evenly-spaced COMPOSITED frames,
                    # re-encoded as deterministic PNG (r05 — the one
                    # animation format decodable stdlib)
                    samples = _sample_gif_frames(b, n_samples)
                else:
                    raise NotImplementedError(
                        f"sample_frames: no stdlib demuxer for magic "
                        f"{b[:4]!r}; MP4/MKV need codec libraries not "
                        "installed here"
                    )
                for k, (start, take, blob) in enumerate(samples):
                    ids.append(int(mid))
                    idxs.append(k)
                    starts.append(start)
                    lens.append(take)
                    blobs.append(blob)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "sample_idx": pd.Series(idxs, dtype="int32"),
                    "start_frame": pd.Series(starts, dtype="int64"),
                    "n_frames": pd.Series(lens, dtype="int32"),
                    "payload": blobs,
                }
            )

    return sized.select("media_id", "payload").mapInPandas(run, FRAME_SAMPLE_SCHEMA)


def _fake_features(payload: bytes | None, dim: int) -> tuple[int, int, int, list[float]]:
    if payload is None:
        return 0, 0, 0, [0.0] * dim
    n = len(payload)
    # deterministic pseudo-decode: "dimensions" from byte stats, features
    # from a rolling byte histogram — stands in for decode+embed
    width = (n % 640) + 1
    height = ((n // 7) % 480) + 1
    hist = [0] * dim
    for i, b in enumerate(payload[:4096]):
        hist[(b + i) % dim] += 1
    tot = float(sum(hist)) or 1.0
    return width, height, 1, [h / tot for h in hist]


def decode_features(
    media: DataFrame,
    fake: bool = False,
    dim: int = FEAT_DIM,
    target_batch_bytes: int = 64 << 20,
) -> DataFrame:
    """mapInPandas decode / feature-extract stage -> FEATURE_SCHEMA.

    ``fake=False`` (default) runs the REAL stdlib decoders (WAV, P6 PPM)
    dispatched on magic bytes; a payload whose format needs an external
    codec library (JPEG/PNG/MP4) raises NotImplementedError inside the
    task — fail-fast and clearly marked, never a silent wrong answer.
    ``fake=True`` substitutes the deterministic pseudo-decoder for every
    payload so format-agnostic plumbing tests can run.
    """
    sized = repartition_by_bytes(media, target_batch_bytes)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fn = _fake_features if fake else decode_payload
            rows = [fn(None if p is None else bytes(p), dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "width": [r[0] for r in rows],
                    "height": [r[1] for r in rows],
                    "n_frames": [r[2] for r in rows],
                    "feature": [r[3] for r in rows],
                }
            )

    return sized.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)
