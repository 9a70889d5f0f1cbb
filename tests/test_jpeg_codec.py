"""Pure-numpy baseline JPEG codec (operators/jpeg_codec.py): round-trip
fidelity, bit-exact analytic payloads, restart markers, the
strict-vs-null contract in the Spark operators, and loud refusal of
everything outside the baseline profile.

No image library ships in this environment (that is the reason the
codec exists), so verification is: (a) self round-trip at PSNR
thresholds a correct codec clears and a broken one cannot, (b) the
closed-form block-grid construction where the lossy pipeline is
provably the identity, checked bit-for-bit, (c) structural checks of
the emitted stream against the T.81 marker grammar."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from creek_spark.operators.jpeg_codec import (
    decode_jpeg_pixels,
    jpeg_bytes_blockgrid,
    jpeg_from_array,
    scaled_quant_tables,
)


def _psnr(a, b) -> float:
    mse = np.mean((np.asarray(a, float) - np.asarray(b, float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _smooth_rgb(h=48, w=64):
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    g = (128 + 100 * np.sin(x / 9.0) * np.cos(y / 6.0)).astype(np.uint8)
    return np.stack([g, np.roll(g, 5, 0), 255 - g], axis=-1)


# -- round-trip fidelity -----------------------------------------------------


@pytest.mark.parametrize("subsampling", ["4:4:4", "4:2:2", "4:2:0"])
def test_rgb_roundtrip_psnr(subsampling):
    img = _smooth_rgb()
    dec = decode_jpeg_pixels(
        jpeg_from_array(img, quality=85, subsampling=subsampling)
    )
    assert dec.shape == img.shape
    # smooth content at q85: a correct codec lands way above 28 dB;
    # a channel swap, wrong zigzag, or broken upsampling lands far below
    assert _psnr(img, dec) > 28.0


def test_gray_high_quality_near_lossless():
    x, y = np.meshgrid(np.arange(56), np.arange(40))
    img = (128 + 90 * np.sin(x / 8.0) * np.cos(y / 5.0)).astype(np.uint8)
    dec = decode_jpeg_pixels(jpeg_from_array(img, quality=95))
    assert dec.shape == (40, 56, 1)
    assert _psnr(img, dec[:, :, 0]) > 40.0


def test_quality_monotonic():
    img = _smooth_rgb()
    p = [
        _psnr(img, decode_jpeg_pixels(jpeg_from_array(img, quality=q)))
        for q in (30, 60, 90)
    ]
    assert p[0] < p[1] < p[2]


@pytest.mark.parametrize(
    "shape", [(1, 1), (7, 5), (8, 8), (9, 17), (13, 11, 3), (16, 24, 3)]
)
def test_non_multiple_of_8_dims(shape):
    rng = np.random.default_rng(sum(shape))
    a = rng.integers(0, 256, shape, dtype=np.uint8)
    dec = decode_jpeg_pixels(jpeg_from_array(a, quality=90))
    assert dec.shape[:2] == shape[:2]
    assert dec.shape[2] == (3 if len(shape) == 3 else 1)


def test_restart_markers_do_not_change_pixels():
    img = _smooth_rgb(40, 56)
    base = decode_jpeg_pixels(jpeg_from_array(img, quality=80))
    for ri in (1, 2, 5):
        enc = jpeg_from_array(img, quality=80, restart_interval=ri)
        assert b"\xff\xdd" in enc  # DRI segment present
        assert any(bytes([0xFF, 0xD0 + k]) in enc for k in range(8))
        assert np.array_equal(decode_jpeg_pixels(enc), base)


# -- analytic bit-exactness ---------------------------------------------------


def test_blockgrid_bit_exact_grid():
    """Constant 8x8 blocks at even levels survive the lossy pipeline
    bit-for-bit (DC-only spectra, lossless quantization at q00=16) —
    in grayscale, in RGB through the 4:2:0 chroma path, and across
    restart intervals.  This is the property the catalog oracle for
    multimodal_jpeg_pixel_stats is built on."""
    for seed in (0, 13, 59, 124):
        for w, h in [(8, 8), (16, 8), (40, 24)]:
            for color in (False, True):
                for ri, prog in ((0, False), (2, False), (0, True)):
                    dec = decode_jpeg_pixels(
                        jpeg_bytes_blockgrid(
                            w, h, seed, color=color,
                            restart_interval=ri, progressive=prog,
                        )
                    )
                    bx = np.arange(w // 8)[None, :]
                    by = np.arange(h // 8)[:, None]
                    g = 2 * ((seed + 7 * bx + 13 * by) % 125)
                    exp = np.repeat(np.repeat(g, 8, 0), 8, 1)
                    exp = (
                        np.stack([exp] * 3, -1) if color else exp[:, :, None]
                    ).astype(np.uint8)
                    assert np.array_equal(dec, exp)


def test_quality_50_is_annex_k_verbatim():
    ql, qc = scaled_quant_tables(50)
    assert ql[0, 0] == 16 and ql[7, 7] == 99  # luma corners, Annex K.1
    assert qc[0, 0] == 17 and qc[7, 7] == 99  # chroma corners, Annex K.2
    ql75, _ = scaled_quant_tables(75)
    assert ql75[0, 0] == 8  # (16*50+50)//100


def test_deterministic_bytes():
    img = _smooth_rgb(24, 32)
    assert jpeg_from_array(img) == jpeg_from_array(img)


# -- stream structure ---------------------------------------------------------


def test_marker_grammar():
    enc = jpeg_from_array(_smooth_rgb(16, 16), quality=70)
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    assert enc[2:4] == b"\xff\xe0" and enc[6:11] == b"JFIF\x00"
    # SOF0 carries the true dimensions
    i = enc.find(b"\xff\xc0")
    _, h, w, nc = struct.unpack(">BHHB", enc[i + 4 : i + 10])
    assert (h, w, nc) == (16, 16, 3)
    # no unstuffed FF in the entropy segment: every FF is followed by
    # 00, D0-D7, or a marker byte that legitimately ends the scan
    sos = enc.find(b"\xff\xda")
    j = sos + 2 + struct.unpack(">H", enc[sos + 2 : sos + 4])[0]
    while j < len(enc) - 1:
        if enc[j] == 0xFF:
            assert enc[j + 1] == 0x00 or 0xD0 <= enc[j + 1] <= 0xD9
            j += 2
        else:
            j += 1


# -- refusal of out-of-profile variants ---------------------------------------


@pytest.mark.parametrize("subsampling", ["4:4:4", "4:2:2", "4:2:0"])
def test_progressive_decodes_bit_identical_to_baseline(subsampling):
    """Progressive (SOF2) reorganizes the SAME quantized coefficients
    into spectral-selection + successive-approximation scans, so a
    progressive and a baseline encoding of one image must decode to
    bit-identical pixels — the strongest cross-check two codec paths
    can give each other."""
    img = _smooth_rgb(41, 53)  # non-multiple-of-8: padding blocks live
    base = decode_jpeg_pixels(
        jpeg_from_array(img, quality=80, subsampling=subsampling)
    )
    prog_enc = jpeg_from_array(
        img, quality=80, subsampling=subsampling, progressive=True
    )
    assert prog_enc[2:4] != b"\xff\xc0" and b"\xff\xc2" in prog_enc
    assert prog_enc.count(b"\xff\xda") >= 5  # really multi-scan
    assert np.array_equal(decode_jpeg_pixels(prog_enc), base)


def test_progressive_gray_and_randomized_grid():
    rng = np.random.default_rng(31)
    for shape in [(1, 1), (8, 8), (23, 9), (40, 64)]:
        a = rng.integers(0, 256, shape, dtype=np.uint8)
        b = decode_jpeg_pixels(jpeg_from_array(a, quality=90))
        p = decode_jpeg_pixels(
            jpeg_from_array(a, quality=90, progressive=True)
        )
        assert np.array_equal(b, p), shape


def test_grayscale_with_subsampled_factors_uses_component_grid():
    """jpegtran -grayscale keeps the source's 2x2 Y sampling factors.
    A single-component scan is non-interleaved regardless of the
    declared factors (T.81 A.2.2): its data units cover the
    component's own ceil(w/8) x ceil(h/8) grid, which for nc==1 is the
    SAME grid as 1x1 factors — so patching the SOF sampling byte from
    0x11 to 0x22 must decode to bit-identical pixels, not raise."""
    rng = np.random.default_rng(77)
    for shape in [(8, 8), (23, 41), (40, 64)]:
        a = rng.integers(0, 256, shape, dtype=np.uint8)
        for kw in ({}, {"restart_interval": 3}):
            enc = bytearray(jpeg_from_array(a, quality=85, **kw))
            base = decode_jpeg_pixels(bytes(enc))
            i = enc.index(b"\xff\xc0")
            assert enc[i + 11] == 0x11  # the grayscale comp's h/v byte
            enc[i + 11] = 0x22
            assert np.array_equal(decode_jpeg_pixels(bytes(enc)), base), (
                shape, kw,
            )


@pytest.mark.parametrize("subsampling", ["4:4:4", "4:2:2", "4:2:0"])
def test_noninterleaved_multiscan_baseline(subsampling):
    """Sequential JPEG legally carries one scan PER COMPONENT (T.81
    A.2) — same quantized coefficients, different entropy layout, so
    the 3-scan stream must decode bit-identical to the interleaved
    one.  Also exercises restart markers inside single-component
    scans, where the interval counts data units, not MCUs."""
    img = _smooth_rgb(41, 53)  # non-multiple-of-8: padding blocks live
    base = decode_jpeg_pixels(
        jpeg_from_array(img, quality=80, subsampling=subsampling)
    )
    for kw in ({}, {"restart_interval": 4}):
        enc = jpeg_from_array(
            img, quality=80, subsampling=subsampling,
            interleave=False, **kw,
        )
        assert enc.count(b"\xff\xda") == 3  # really one scan per comp
        assert np.array_equal(decode_jpeg_pixels(enc), base), kw


def test_fill_bytes_between_markers_are_spec_legal_padding():
    """T.81 B.1.1.2: any marker may be preceded by any number of 0xFF
    fill bytes.  parse_image_header already skips them; the pixel
    decoder must agree on the same payload — including a fill byte
    before the scan-terminating marker (EOI)."""
    enc = jpeg_from_array(_smooth_rgb(24, 24), quality=80)
    base = decode_jpeg_pixels(enc)
    # pad before a mid-stream marker (DHT) and before EOI
    padded = bytearray(enc)
    i = padded.index(b"\xff\xc4")
    padded[i:i] = b"\xff\xff\xff"
    assert padded[-2:] == b"\xff\xd9"
    padded[-2:-2] = b"\xff\xff"
    assert np.array_equal(decode_jpeg_pixels(bytes(padded)), base)
    # progressive: fill bytes between scans
    penc = jpeg_from_array(_smooth_rgb(24, 24), quality=80,
                           progressive=True)
    pbase = decode_jpeg_pixels(penc)
    pp = bytearray(penc)
    j = pp.index(b"\xff\xda", pp.index(b"\xff\xda") + 2)
    pp[j:j] = b"\xff"
    pp[-2:-2] = b"\xff"
    assert np.array_equal(decode_jpeg_pixels(bytes(pp)), pbase)


def test_arithmetic_refused_loudly():
    enc = bytearray(jpeg_from_array(_smooth_rgb(16, 16)))
    i = enc.index(b"\xff\xc0")
    enc[i + 1] = 0xC9
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg_pixels(bytes(enc))


def test_not_a_jpeg_raises_valueerror():
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg_pixels(b"\x89PNG\r\n\x1a\nxxxx")
    with pytest.raises(ValueError):
        decode_jpeg_pixels(None)


def test_truncated_stream_raises():
    enc = jpeg_from_array(_smooth_rgb(32, 32))
    with pytest.raises(ValueError):
        decode_jpeg_pixels(enc[: len(enc) // 2])


def test_encoder_input_validation():
    with pytest.raises(ValueError, match="uint8"):
        jpeg_from_array(np.zeros((8, 8), dtype=np.float64))
    with pytest.raises(ValueError, match="quality"):
        jpeg_from_array(np.zeros((8, 8), dtype=np.uint8), quality=0)
    with pytest.raises(ValueError, match="subsampling"):
        jpeg_from_array(
            np.zeros((8, 8, 3), dtype=np.uint8), subsampling="4:1:1"
        )


def test_bitflip_fuzz_never_escapes_valueerror():
    """A 100 TB corpus WILL contain corrupted payloads, and the
    strict=False operators promise to null them out — which only holds
    if the decoder raises nothing but ValueError/NotImplementedError.
    (Found live: KeyError via corrupted table ids, OverflowError via a
    corrupted DHT yielding a DC category > 15.)"""
    rng = np.random.default_rng(123)
    encs = [
        jpeg_bytes_blockgrid(24, 16, 11, color=True, restart_interval=2),
        jpeg_bytes_blockgrid(24, 16, 11, color=True, progressive=True),
    ]
    for t in range(400):
        m = bytearray(encs[t % 2])
        for _ in range(rng.integers(1, 5)):
            m[rng.integers(2, len(m))] ^= 1 << rng.integers(0, 8)
        try:
            out = decode_jpeg_pixels(bytes(m))
            assert out.dtype == np.uint8  # decoded despite the flip: fine
        except (ValueError, NotImplementedError):
            pass  # refused loudly: fine


# -- Spark operator integration ----------------------------------------------


def test_resize_images_jpeg_stays_jpeg(spark):
    """resize_images now handles JPEG for real: decode → nn-resize →
    re-encode in the SOURCE container, strict mode, no injected codec;
    mixed PNG+JPEG batches keep per-row formats."""
    from creek_spark.operators.multimodal import (
        decode_image_pixels,
        png_bytes_gradient,
        resize_images,
    )

    rows = [
        (1, "image", bytearray(jpeg_bytes_blockgrid(32, 16, 7)), "image/jpeg"),
        (2, "image", bytearray(png_bytes_gradient(10, 6, seed=3)), "image/png"),
        (3, "image", None, "image/jpeg"),
    ]
    media = spark.createDataFrame(
        rows, "media_id bigint, kind string, content binary, mime string"
    )
    out = {
        r["media_id"]: r
        for r in resize_images(media, width=12, height=10).collect()
    }
    assert bytes(out[1]["content"][:2]) == b"\xff\xd8"  # JPEG stayed JPEG
    assert bytes(out[2]["content"][:8]) == b"\x89PNG\r\n\x1a\n"
    assert out[3]["content"] is None
    for mid in (1, 2):
        arr = decode_image_pixels(bytes(out[mid]["content"]))
        assert arr.shape[:2] == (10, 12)


def test_pixel_stats_jpeg_strict_and_null_paths(spark):
    from creek_spark.operators.multimodal import pixel_stats

    good = jpeg_bytes_blockgrid(16, 8, seed=5)
    arith = bytearray(good)
    arith[arith.index(b"\xff\xc0") + 1] = 0xC9  # arithmetic-coded SOF
    media = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(bytes(arith)))],
        "media_id bigint, content binary",
    )
    rows = {r["media_id"]: r for r in pixel_stats(media).collect()}
    assert rows[1]["n_values"] == 16 * 8  # decoded for real
    assert rows[2]["n_values"] is None  # out-of-profile → nulls
    with pytest.raises(Exception, match="arithmetic"):
        pixel_stats(media, strict=True).collect()
    # and the strict path is exact: sum matches the closed form
    bx = np.arange(2)[None, :]
    by = np.arange(1)[:, None]
    v = 2 * ((5 + 7 * bx + 13 * by) % 125)
    assert rows[1]["sum_px"] == int(64 * v.sum())


def test_pixel_dedup_finds_jpeg_duplicates(spark):
    """The near-dup screen works across containers: the same pixels
    encoded as PNG and as (losslessly-surviving) JPEG hash identically
    once decoded — exactly what a 100 TB curation pass needs to catch
    re-encoded copies."""
    from creek_spark.operators.multimodal import (
        decode_image_pixels,
        png_from_array,
    )

    jpg = jpeg_bytes_blockgrid(16, 16, seed=9)
    png = png_from_array(decode_jpeg_pixels(jpg)[:, :, 0])
    a = decode_image_pixels(jpg)
    b = decode_image_pixels(png)
    assert np.array_equal(a[:, :, 0], b if b.ndim == 2 else b[:, :, 0])
