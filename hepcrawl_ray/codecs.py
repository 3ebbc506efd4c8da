"""Image codecs for the synthetic image+caption corpus.

The corpus schema (BASELINE.json ``input_hint``) carries encoded image
bytes in a ``binary`` column; the per-row output invariant is
decoded-pixel equality (exact for lossless, PSNR >= 40 dB for lossy)
— the analog of the reference's downloaded-file fidelity through
``DocumentsPipeline`` (reference: hepcrawl/pipelines.py:47-99).

Two formats:

- ``png`` — a real, self-contained PNG codec (8-bit RGB, all five
  scanline filters on decode, filter-0 on encode) built on stdlib
  ``zlib`` + numpy.  Lossless: decode(encode(x)) == x exactly.
- ``jpeg`` — **a deterministic stand-in for a lossy codec**: uniform
  quantization (step 4) + zlib, in a tagged container.  Real JPEG
  libraries are not available in this environment; this codec is
  deliberately simple but genuinely lossy (max per-sample error =
  step/2), so the PSNR >= 40 dB verification branch is exercised for
  real.  Decoded PSNR of encode->decode is ~47 dB.  Swap in a real
  JPEG codec by replacing ``encode_lossy``/``decode_lossy``.

All functions operate on ``(h, w, 3) uint8`` numpy arrays.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------- PNG ----

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + tag + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as an RGB8 PNG (filter 0)."""
    assert pixels.dtype == np.uint8 and pixels.ndim == 3 and pixels.shape[2] == 3
    h, w = pixels.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, RGB
    # prepend filter byte 0 to each scanline
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = pixels.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), level=6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """Decode an RGB8 PNG produced by any filter-0..4 encoder."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, 0
    idat = b""
    h = bitdepth = colortype = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bitdepth, colortype, _, _, interlace = struct.unpack(">IIBBBBB", body)
            if bitdepth != 8 or colortype != 2 or interlace != 0:
                raise ValueError("only 8-bit non-interlaced RGB supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    stride = 1 + w * 3
    raw = raw.reshape(h, stride)
    filters = raw[:, 0]
    if not filters.any():  # all filter-0 scanlines: no unfiltering needed
        return np.ascontiguousarray(raw[:, 1:]).reshape(h, w, 3)
    lines = raw[:, 1:].copy()
    bpp = 3
    prev = np.zeros(w * 3, dtype=np.uint8)
    for y in range(h):
        f = filters[y]
        line = lines[y]
        if f == 0:
            pass
        elif f == 1:  # Sub
            for x in range(bpp, w * 3):
                line[x] = (int(line[x]) + int(line[x - bpp])) & 0xFF
        elif f == 2:  # Up
            lines[y] = line = (line.astype(np.int16) + prev).astype(np.uint8)
        elif f == 3:  # Average
            for x in range(w * 3):
                left = int(line[x - bpp]) if x >= bpp else 0
                line[x] = (int(line[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif f == 4:  # Paeth
            for x in range(w * 3):
                a = int(line[x - bpp]) if x >= bpp else 0
                c = int(prev[x - bpp]) if x >= bpp else 0
                line[x] = (int(line[x]) + int(_paeth(
                    np.uint8(a), prev[x], np.uint8(c)))) & 0xFF
        else:
            raise ValueError(f"bad filter {f}")
        prev = lines[y]
    return lines.reshape(h, w, 3)


# ----------------------------------------------- lossy stand-in codec ----

_QNT_MAGIC = b"QNT1"
_QNT_STEP = 4  # uniform quantization step -> ~47 dB PSNR


def encode_lossy(pixels: np.ndarray, step: int = _QNT_STEP) -> bytes:
    """Deterministic lossy stand-in (see module docstring).  fmt='jpeg'."""
    assert pixels.dtype == np.uint8 and pixels.ndim == 3 and pixels.shape[2] == 3
    h, w = pixels.shape[:2]
    q = ((pixels.astype(np.uint16) + step // 2) // step).astype(np.uint8)
    payload = zlib.compress(q.tobytes(), level=6)
    return _QNT_MAGIC + struct.pack(">IIB", w, h, step) + payload


_LOSSY_LUT: dict[int, np.ndarray] = {}


def _lossy_lut(step: int) -> np.ndarray:
    """Cached 256-entry dequantization LUT — the ONE definition of the
    quantized->pixel mapping (decode_lossy and the fused luma path must
    stay bit-identical)."""
    lut = _LOSSY_LUT.get(step)
    if lut is None:
        lut = np.minimum(np.arange(256, dtype=np.uint16) * step,
                         255).astype(np.uint8)
        _LOSSY_LUT[step] = lut
    return lut


def decode_lossy(data: bytes) -> np.ndarray:
    if data[:4] != _QNT_MAGIC:
        raise ValueError("not a QNT payload")
    w, h, step = struct.unpack(">IIB", data[4:13])
    # dequantize through the LUT: one gather pass, no uint16
    # temporaries (the multiply+minimum+astype chain cost 3 extra
    # full-image passes of DRAM traffic)
    q = np.frombuffer(zlib.decompress(data[13:]), dtype=np.uint8)
    return _lossy_lut(step)[q].reshape(h, w, 3)


# ------------------------------------------------ fused luma decode ----
#
# The verify stage needs only (h, w) and the luma plane (phash input),
# never the RGB array.  Decoding straight to luma through integer LUTs
# skips materializing (h, w, 3) intermediates — at 72px that is ~100 KB
# of DRAM traffic per image the fused fetch+parse stage never touches.
# Bit-exactness: luma = (77 r + 151 g + 28 b) >> 8 over the decoded
# channel values, composed INTO the LUTs, so the result is integer-
# identical to decode() + the phash luma step.

_LUMA_W3 = np.array([77.0, 151.0, 28.0], dtype=np.float32)


def _luma_from_rgb_bytes(flat: np.ndarray, h: int, w: int,
                         step: int | None) -> np.ndarray:
    """(h*w*3,) encoded channel bytes -> (h, w) float32 luma.

    The weighted sum runs as a BLAS matvec in float32, which is
    bit-exact vs the integer path: every product (<= 151*255), the sum
    (<= 255*256) and the 2^-8 scaling are exactly representable, so
    floor(acc/256) == (77 r + 151 g + 28 b) >> 8."""
    if step is not None:
        flat = _lossy_lut(step)[flat]
    rgbf = flat.reshape(-1, 3).astype(np.float32)
    acc = rgbf @ _LUMA_W3
    return np.floor(acc * (1.0 / 256.0)).reshape(h, w)


def decode_luma(data: bytes, fmt: str) -> tuple[np.ndarray, int, int]:
    """Decode straight to (luma float32, w, h) without an RGB array.

    PNG falls back to the full decode when any scanline uses a filter
    (our encoder always writes filter 0); QNT dequantizes through the
    composed LUTs.  Integer-identical to
    ``phash-luma(decode(data, fmt))``.
    """
    if fmt == "jpeg":
        if data[:4] != _QNT_MAGIC:
            raise ValueError("not a QNT payload")
        w, h, step = struct.unpack(">IIB", data[4:13])
        q = np.frombuffer(zlib.decompress(data[13:]), dtype=np.uint8)
        return _luma_from_rgb_bytes(q, h, w, int(step)), w, h
    if fmt == "png":
        if data[:8] != _PNG_SIG:
            raise ValueError("not a PNG")
        pos = 8
        idat = b""
        w = h = None
        while pos < len(data):
            (length,) = struct.unpack(">I", data[pos:pos + 4])
            tag = data[pos + 4:pos + 8]
            body = data[pos + 8:pos + 8 + length]
            pos += 12 + length
            if tag == b"IHDR":
                w, h, bitdepth, colortype, _, _, interlace = struct.unpack(
                    ">IIBBBBB", body)
                if bitdepth != 8 or colortype != 2 or interlace != 0:
                    raise ValueError("only 8-bit non-interlaced RGB supported")
            elif tag == b"IDAT":
                idat += body
            elif tag == b"IEND":
                break
        if w is None or h is None:
            raise ValueError("missing IHDR")  # keep the ValueError
            # contract of the jpeg/unknown-fmt branches on garbled input
        raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
        raw = raw.reshape(h, 1 + w * 3)
        if raw[:, 0].any():  # filtered scanlines: full decode path
            px = decode_png(data)
            return _luma_from_rgb_bytes(px.reshape(-1), h, w, None), w, h
        return _luma_from_rgb_bytes(
            np.ascontiguousarray(raw[:, 1:]).reshape(-1), h, w, None), w, h
    raise ValueError(f"unknown fmt {fmt!r}")


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(pixels)
    if fmt == "jpeg":
        return encode_lossy(pixels)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(data)
    if fmt == "jpeg":
        return decode_lossy(data)
    raise ValueError(f"unknown fmt {fmt!r}")


# ------------------------------------------------------------- metrics ----

def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    if a.shape != b.shape:
        return 0.0
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0 ** 2 / mse))


_DCT_N = 32
_DCT_K = 8


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    m[0] /= np.sqrt(2.0)
    return m


# phash runs in float32 end-to-end: half the DRAM traffic of float64,
# which is what binds when every core decodes+hashes concurrently


_DCT_M = _dct_matrix(_DCT_N)


_GRAY_W = np.array([0.299, 0.587, 0.114], dtype=np.float32)
_POOL_CACHE: dict[int, np.ndarray] = {}
_BIT_WEIGHTS = (np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64))


def _pool_matrix(n: int) -> np.ndarray:
    """(32, n) DCT-fused mean-pooling matrix (DCT @ pool): one matmul
    pair resamples AND transforms — cached per source size."""
    m = _POOL_CACHE.get(n)
    if m is None:
        yi = np.arange(_DCT_N + 1) * n // _DCT_N
        pool = np.zeros((_DCT_N, n))
        for r in range(_DCT_N):
            lo, hi = yi[r], max(yi[r + 1], yi[r] + 1)
            pool[r, lo:hi] = 1.0 / (hi - lo)
        m = np.ascontiguousarray((_DCT_M @ pool).astype(np.float32))
        _POOL_CACHE[n] = m
    return m


def phash64(pixels: np.ndarray) -> int:
    """64-bit perceptual hash (DCT-based, pHash-style), deterministic.

    Grayscale -> area-resample to 32x32 (cached pooling matrices) ->
    2D DCT -> top-left 8x8 minus DC -> median threshold -> 64 bits
    (row-major, signed int64).
    """
    i16 = pixels.astype(np.uint16)
    gray = ((i16[..., 0] * 77 + i16[..., 1] * 151 + i16[..., 2] * 28)
            >> 8).astype(np.float32)  # integer Rec.601-ish luma
    h, w = gray.shape
    dct = _pool_matrix(h) @ gray @ _pool_matrix(w).T
    block = np.ascontiguousarray(dct[:_DCT_K, :_DCT_K]).ravel()
    med = np.median(block[1:])
    val = int(((block > med) * _BIT_WEIGHTS).sum())
    return val - (1 << 64) if val >= (1 << 63) else val


def phash64_many(pixels_list) -> np.ndarray:
    """Batched ``phash64`` over a list of images.

    Identical bits to the per-image path.  The luma + DCT matmuls stay
    per-image (an image fits in L2; stacking them spills the working
    set to DRAM and is measurably SLOWER), while the fixed-overhead
    tail — median and bit packing, ~27 us of numpy-call overhead per
    image — runs once, vectorized over the whole batch (~2 us/image).
    This is the kernel for the fused fetch+parse stage's hot loop.
    """
    n = len(pixels_list)
    grays = []
    for px in pixels_list:
        i16 = px.astype(np.uint16)
        grays.append(((i16[..., 0] * 77 + i16[..., 1] * 151
                       + i16[..., 2] * 28) >> 8).astype(np.float32))
    return phash64_many_from_luma(grays)


def phash64_many_from_luma(grays) -> np.ndarray:
    """Batched phash over precomputed (h, w) float32 luma planes (the
    ``decode_luma`` fast path).  Same bits as ``phash64``."""
    n = len(grays)
    blocks = np.empty((n, _DCT_K * _DCT_K), dtype=np.float32)
    for i, gray in enumerate(grays):
        h, w = gray.shape
        dct = _pool_matrix(h) @ gray @ _pool_matrix(w).T
        blocks[i] = dct[:_DCT_K, :_DCT_K].ravel()
    med = np.median(blocks[:, 1:], axis=1)
    vals = ((blocks > med[:, None]).astype(np.uint64)
            * _BIT_WEIGHTS).sum(axis=1)
    return vals.astype(np.uint64).view(np.int64)
