"""Lossless media codecs in pure stdlib + numpy: BMP, GIF (full LZW),
and WAV PCM — completing the pixel/sample-level coverage of every
container format the engine's header decoder recognizes.

Round-11 continuation of the codec program (PNG in round 6,
baseline JPEG in operators/jpeg_codec.py this round): after this
module, `pixel_stats` / `resize_images` / image dedup operate on REAL
pixels for PNG, JPEG, BMP and GIF, and `audio_stats` operates on real
PCM samples — with no injected library.  The remaining injection
points are genuinely codec-library territory: arithmetic/lossless
JPEG, compressed audio (MP3/AAC), and video frames.

All three formats here are lossless, so their catalog queries can use
exact closed-form oracles (no quantization argument needed, unlike the
JPEG block-grid construction).

Formats implemented:
 * BMP: uncompressed BI_RGB, 24-bit BGR and 8-bit paletted, bottom-up
   and top-down row order, 4-byte row padding (the Windows DIB format).
 * GIF: 87a/89a, global color table, one image, FULL LZW in both
   directions (variable-width codes, clear/EOI, KwKwK case, 12-bit
   dictionary reset), interlaced or sequential row order, extension
   blocks skipped.  Local color tables and animation are refused
   loudly.
 * WAV: RIFF/WAVE PCM, 8-bit unsigned and 16-bit signed LE, any
   channel count.  Non-PCM (compressed) audio is refused loudly.

Reference parity note: modfin/creek has no media processing — this
belongs to the LLM-data-pipeline surface the build brief adds
(multimodal binary columns).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "bmp_from_array",
    "decode_bmp_pixels",
    "gif_from_array",
    "gif_from_indexed",
    "decode_gif_pixels",
    "decode_gif_indexed",
    "wav_from_array",
    "decode_wav_samples",
]


# =============================================================================
# BMP (uncompressed BI_RGB)
# =============================================================================


def bmp_from_array(arr: np.ndarray) -> bytes:
    """H×W×3 RGB uint8 -> 24-bit bottom-up BI_RGB BMP; H×W (or H×W×1)
    uint8 -> 8-bit paletted BMP with the identity grayscale palette."""
    a = np.asarray(arr)
    if a.ndim == 3 and a.shape[2] == 1:
        a = a[:, :, 0]
    if a.dtype != np.uint8:
        raise ValueError("bmp_from_array expects uint8 pixels")
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError("expected H×W grayscale or H×W×3 RGB")
    if gray:
        row_bytes = w
        palette = bytes(
            b for v in range(256) for b in (v, v, v, 0)  # BGRA quads
        )
        rows = a
        bpp = 8
    else:
        row_bytes = w * 3
        palette = b""
        rows = a[:, :, ::-1]  # RGB -> BGR
        bpp = 24
    pad = (-row_bytes) % 4
    body = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        body += rows[r].tobytes()
        body += b"\x00" * pad
    dib = struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, bpp, 0, len(body), 2835, 2835,
        256 if gray else 0, 0,
    )
    offset = 14 + 40 + len(palette)
    head = b"BM" + struct.pack(
        "<IHHI", offset + len(body), 0, 0, offset
    )
    return head + dib + palette + bytes(body)


def decode_bmp_pixels(payload: bytes) -> np.ndarray:
    """Uncompressed BI_RGB BMP -> H×W×C uint8 (C=3 for 24-bit, the
    palette-resolved C=3 for 8-bit).  Raises ValueError on non-BMP or
    malformed payloads, NotImplementedError on compressed/unsupported
    BMP variants."""
    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    b = bytes(payload)
    (offset,) = struct.unpack("<I", b[10:14])
    (hdrsz,) = struct.unpack("<I", b[14:18])
    if hdrsz < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP is not supported")
    w, h_signed, planes, bpp, comp = struct.unpack("<iiHHI", b[18:34])
    if comp != 0:
        raise NotImplementedError(
            f"compressed BMP (method {comp}) requires a codec library"
        )
    if bpp not in (8, 24):
        raise NotImplementedError(f"{bpp}-bit BMP is not supported")
    if w <= 0 or h_signed == 0:
        raise ValueError("BMP with non-positive dimensions")
    h = abs(h_signed)
    topdown = h_signed < 0
    row_bytes = w * (bpp // 8)
    stride = row_bytes + ((-row_bytes) % 4)
    data = b[offset : offset + stride * h]
    if len(data) != stride * h:
        raise ValueError("truncated BMP pixel data")
    raw = np.frombuffer(data, dtype=np.uint8).reshape(h, stride)[:, :row_bytes]
    if not topdown:
        raw = raw[::-1]
    if bpp == 24:
        return np.ascontiguousarray(raw.reshape(h, w, 3)[:, :, ::-1])
    # 8-bit: resolve through the color table (BGRA quads after the DIB)
    pal_off = 14 + hdrsz
    (n_colors,) = struct.unpack("<I", b[46:50])
    n_colors = n_colors or 256
    pal = np.frombuffer(
        b[pal_off : pal_off + 4 * n_colors], dtype=np.uint8
    )
    if pal.size != 4 * n_colors:
        raise ValueError("truncated BMP palette")
    pal = pal.reshape(n_colors, 4)[:, [2, 1, 0]]  # BGRA -> RGB
    idx = raw.reshape(h, w)
    if int(idx.max(initial=0)) >= n_colors:
        raise ValueError("BMP pixel index outside the palette")
    return pal[idx]


# =============================================================================
# GIF (full LZW)
# =============================================================================

# interlace passes: (first row, step)
_GIF_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_decode(min_size: int, data: bytes, n_pixels: int) -> list[int]:
    """GIF-variant LZW: variable code width from min_size+1 up to 12
    bits, CLEAR resets the table, KwKwK handled, stops at EOI or after
    n_pixels indices."""
    clear = 1 << min_size
    eoi = clear + 1
    base = [(i,) for i in range(clear)]
    table = base + [(), ()]
    width = min_size + 1
    out: list[int] = []
    prev: tuple | None = None
    bitpos = 0
    total_bits = 8 * len(data)
    while len(out) < n_pixels:
        if bitpos + width > total_bits:
            raise ValueError("truncated GIF LZW stream")
        byte = bitpos >> 3
        # LSB-first packing (GIF appendix F)
        chunk = int.from_bytes(data[byte : byte + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table = base + [(), ()]
            width = min_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table) or not table[code]:
                raise ValueError("invalid GIF LZW start code")
            out.extend(table[code])
            prev = table[code]
            continue
        if code < len(table) and table[code]:
            entry = table[code]
        elif code == len(table):
            entry = prev + (prev[0],)  # KwKwK
        else:
            raise ValueError("invalid GIF LZW code")
        out.extend(entry)
        table.append(prev + (entry[0],))
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry
    return out[:n_pixels]


def _lzw_encode(min_size: int, indices) -> bytes:
    """The matching encoder: emits CLEAR first, grows code width when
    the next free code would not fit, resets at the 4096-entry cap."""
    clear = 1 << min_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple, int] = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    width = min_size + 1
    emit(clear, width)
    run: tuple = ()
    for px in indices:
        px = int(px)
        cand = run + (px,)
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == 4096:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_size + 1
        run = (px,)
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def gif_from_array(arr: np.ndarray, *, interlace: bool = False) -> bytes:
    """H×W (or H×W×1) uint8 -> GIF89a with the identity 256-gray global
    color table and a real LZW-compressed image."""
    a = np.asarray(arr)
    if a.ndim == 3 and a.shape[2] == 1:
        a = a[:, :, 0]
    if a.dtype != np.uint8 or a.ndim != 2:
        raise ValueError("gif_from_array expects H×W uint8 indices")
    h, w = a.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    gct = bytes(v for i in range(256) for v in (i, i, i))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0xF7, 0x00, 0x00])  # GCT present, 8-bit, 256 entries
    out += gct
    rows = a
    if interlace:
        order = [
            r for first, step in _GIF_PASSES for r in range(first, h, step)
        ]
        rows = a[order]
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([0x40 if interlace else 0x00])
    out += bytes([8])  # LZW min code size
    lzw = _lzw_encode(8, rows.reshape(-1))
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out += bytes([len(block)]) + block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def gif_from_indexed(idx: np.ndarray, palette: np.ndarray) -> bytes:
    """(H×W index plane, N×3 palette) -> GIF89a reusing that exact
    palette — what a lossless GIF resize needs (nearest-neighbor picks
    existing pixels, so every output color is already in the table)."""
    a = np.asarray(idx)
    pal = np.asarray(palette)
    if a.ndim != 2 or pal.ndim != 2 or pal.shape[1] != 3:
        raise ValueError("expected H×W indices and N×3 palette")
    if pal.shape[0] > 256 or int(a.max(initial=0)) >= pal.shape[0]:
        raise ValueError("index outside the palette")
    h, w = a.shape
    n = max(2, pal.shape[0])
    size_field = max(1, (n - 1).bit_length())  # table size = 2^(f+1)...
    size_field = max(0, size_field - 1)
    gct_n = 2 << size_field
    gct = np.zeros((gct_n, 3), dtype=np.uint8)
    gct[: pal.shape[0]] = pal
    min_code = max(2, size_field + 1)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (size_field << 4) | size_field, 0x00, 0x00])
    out += gct.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out += bytes([min_code])
    lzw = _lzw_encode(min_code, a.reshape(-1))
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out += bytes([len(block)]) + block
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif_indexed(payload: bytes) -> tuple[np.ndarray, np.ndarray]:
    """GIF -> (H×W int index plane, N×3 uint8 palette) — the lossless
    form a palette-preserving transform (resize) works on."""
    return _decode_gif(payload)


def decode_gif_pixels(payload: bytes) -> np.ndarray:
    """GIF87a/89a (global color table, first image) -> H×W×3 uint8 via
    full LZW decode and palette resolution; interlaced row order
    handled.  Raises ValueError for non-GIF/malformed payloads,
    NotImplementedError for local color tables (animation frames)."""
    idx, gct = _decode_gif(payload)
    return gct[idx]


def _decode_gif(payload: bytes) -> tuple[np.ndarray, np.ndarray]:
    if payload is None or len(payload) < 13 or payload[:4] != b"GIF8":
        raise ValueError("not a GIF payload")
    b = bytes(payload)
    w, h = struct.unpack("<HH", b[6:10])
    packed = b[10]
    if not packed & 0x80:
        raise NotImplementedError("GIF without a global color table")
    gct_n = 2 << (packed & 7)
    pos = 13
    gct = np.frombuffer(b[pos : pos + 3 * gct_n], dtype=np.uint8)
    if gct.size != 3 * gct_n:
        raise ValueError("truncated GIF color table")
    gct = gct.reshape(gct_n, 3)
    pos += 3 * gct_n
    # walk blocks to the first image descriptor
    while pos < len(b):
        block = b[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(b) and b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
        elif block == 0x2C:
            break
        elif block == 0x3B:
            raise ValueError("GIF has no image data")
        else:
            raise ValueError("malformed GIF block structure")
    if pos >= len(b) or b[pos] != 0x2C:
        raise ValueError("truncated GIF (no image descriptor)")
    left, top, iw, ih = struct.unpack("<HHHH", b[pos + 1 : pos + 9])
    ipacked = b[pos + 9]
    pos += 10
    if ipacked & 0x80:
        raise NotImplementedError(
            "GIF local color tables (animation frames) are not supported"
        )
    if iw == 0 or ih == 0 or left or top or iw != w or ih != h:
        raise NotImplementedError(
            "GIF sub-rectangle frames are not supported"
        )
    interlaced = bool(ipacked & 0x40)
    if pos >= len(b):
        raise ValueError("truncated GIF")
    min_size = b[pos]
    pos += 1
    if not 2 <= min_size <= 8:
        raise ValueError("invalid GIF LZW minimum code size")
    data = bytearray()
    while pos < len(b) and b[pos] != 0:
        n = b[pos]
        data += b[pos + 1 : pos + 1 + n]
        if len(b) < pos + 1 + n:
            raise ValueError("truncated GIF data sub-block")
        pos += 1 + n
    idx = np.array(
        _lzw_decode(min_size, bytes(data), w * h), dtype=np.int64
    ).reshape(h, w)
    if interlaced:
        order = [
            r for first, step in _GIF_PASSES for r in range(first, h, step)
        ]
        un = np.empty_like(idx)
        un[order] = idx
        idx = un
    if int(idx.max(initial=0)) >= gct_n:
        raise ValueError("GIF pixel index outside the color table")
    return idx, gct


# =============================================================================
# WAV (RIFF PCM)
# =============================================================================


def wav_from_array(samples: np.ndarray, *, rate: int = 8000) -> bytes:
    """(frames,) or (frames, channels) int16 -> 16-bit PCM WAV."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2 or a.dtype != np.int16:
        raise ValueError("wav_from_array expects int16 (frames[, channels])")
    channels = a.shape[1]
    block = channels * 2
    data = a.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_samples(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM -> ((frames, channels) int32 samples, sample_rate).
    8-bit unsigned is centered to signed (v-128); 16-bit signed LE
    passes through.  Raises ValueError for non-WAV/malformed payloads,
    NotImplementedError for compressed (non-PCM) audio."""
    if (
        payload is None
        or len(payload) < 12
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"WAVE"
    ):
        raise ValueError("not a WAV payload")
    b = bytes(payload)
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(b):
        tag = b[pos : pos + 4]
        (n,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        chunk = b[pos + 8 : pos + 8 + n]
        if len(chunk) != n:
            raise ValueError("truncated WAV chunk")
        if tag == b"fmt ":
            fmt = chunk
        elif tag == b"data":
            data = chunk
        pos += 8 + n + (n & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, channels, rate, _, block, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if audio_fmt != 1:
        raise NotImplementedError(
            f"non-PCM WAV (format {audio_fmt}) requires a codec library"
        )
    if bits not in (8, 16):
        raise NotImplementedError(f"{bits}-bit PCM is not supported")
    if channels == 0 or block != channels * bits // 8:
        raise ValueError("inconsistent WAV fmt chunk")
    frames = len(data) // block
    data = data[: frames * block]
    if bits == 8:
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128
    else:
        arr = np.frombuffer(data, dtype="<i2").astype(np.int32)
    return arr.reshape(frames, channels), int(rate)
