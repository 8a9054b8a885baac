"""VP8L inverse transforms — exact integer NumPy reference implementations.

The four transforms of the lossless format (predictor, cross-color,
subtract-green, color-indexing), written from the lossless bitstream spec.
The JAX/TPU plane-engine versions live in gowebp_tpu/ops/lossless_ops.py
and are golden-tested against these.

Feature parity target: /root/reference/pkg/libwebp/dsp/lossless.go:91-547
(14 predictors, PredictorInverseTransform, add-green, color-transform
inverse, color-index row mapper).

Pixels are ARGB packed into uint32: (a<<24)|(r<<16)|(g<<8)|b.
"""

from __future__ import annotations

import numpy as np

from ...constants import ARGB_BLACK


def _lib():
    from ...entropy.native_loader import get_lib

    return get_lib()


def subsample_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def argb_to_channels(argb: np.ndarray) -> np.ndarray:
    """(...,) uint32 → (..., 4) uint8 as [A, R, G, B]."""
    a = (argb >> 24) & 0xFF
    r = (argb >> 16) & 0xFF
    g = (argb >> 8) & 0xFF
    b = argb & 0xFF
    return np.stack([a, r, g, b], axis=-1).astype(np.uint8)


def channels_to_argb(ch: np.ndarray) -> np.ndarray:
    ch = ch.astype(np.uint32)
    return (ch[..., 0] << 24) | (ch[..., 1] << 16) | (ch[..., 2] << 8) | ch[..., 3]


# ---------------------------------------------------------------------------
# Subtract-green
# ---------------------------------------------------------------------------

def add_green_inverse(argb: np.ndarray) -> np.ndarray:
    """r += g; b += g (mod 256)."""
    lib = _lib()
    if lib is not None:
        import ctypes

        buf = np.ascontiguousarray(argb, np.uint32).copy()
        lib.wtpu_vp8l_add_green(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), buf.size
        )
        return buf
    g = (argb >> 8) & 0xFF
    r = ((argb >> 16) & 0xFF) + g
    b = (argb & 0xFF) + g
    return (
        (argb & 0xFF00FF00)
        | ((r & 0xFF) << 16)
        | (b & 0xFF)
    ).astype(np.uint32)


def subtract_green_forward(argb: np.ndarray) -> np.ndarray:
    g = (argb >> 8) & 0xFF
    r = ((argb >> 16) & 0xFF) - g
    b = (argb & 0xFF) - g
    return (
        (argb & 0xFF00FF00)
        | ((r & 0xFF) << 16)
        | (b & 0xFF)
    ).astype(np.uint32)


# ---------------------------------------------------------------------------
# Cross-color transform
# ---------------------------------------------------------------------------

def _delta(t_u8: np.ndarray, c_u8: np.ndarray) -> np.ndarray:
    """ColorTransformDelta: (int8(t) * int8(c)) >> 5 (arithmetic shift)."""
    t = t_u8.astype(np.int8).astype(np.int32)
    c = c_u8.astype(np.int8).astype(np.int32)
    return (t * c) >> 5


def color_transform_inverse(
    argb: np.ndarray, transform_img: np.ndarray, bits: int
) -> np.ndarray:
    """argb: (H, W) uint32; transform_img: (tH, tW) uint32 tile multipliers."""
    lib = _lib()
    if lib is not None:
        import ctypes

        h, w = argb.shape
        buf = np.ascontiguousarray(argb, np.uint32).copy()
        timg = np.ascontiguousarray(transform_img, np.uint32)
        lib.wtpu_vp8l_color_inverse(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), w, h,
            timg.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), bits,
            transform_img.shape[1],
        )
        return buf
    h, w = argb.shape
    ty = np.arange(h) >> bits
    tx = np.arange(w) >> bits
    tiles = transform_img[np.ix_(ty, tx)]
    g2r = tiles & 0xFF
    g2b = (tiles >> 8) & 0xFF
    r2b = (tiles >> 16) & 0xFF

    g = (argb >> 8) & 0xFF
    r = (argb >> 16) & 0xFF
    b = argb & 0xFF
    new_r = (r + _delta(g2r, g)) & 0xFF
    new_b = (b + _delta(g2b, g) + _delta(r2b, new_r)) & 0xFF
    return (
        (argb & 0xFF00FF00) | (new_r.astype(np.uint32) << 16) | new_b.astype(np.uint32)
    ).astype(np.uint32)


def color_transform_forward(
    argb: np.ndarray, transform_img: np.ndarray, bits: int
) -> np.ndarray:
    h, w = argb.shape
    ty = np.arange(h) >> bits
    tx = np.arange(w) >> bits
    tiles = transform_img[np.ix_(ty, tx)]
    g2r = tiles & 0xFF
    g2b = (tiles >> 8) & 0xFF
    r2b = (tiles >> 16) & 0xFF

    g = (argb >> 8) & 0xFF
    r = (argb >> 16) & 0xFF
    b = argb & 0xFF
    new_r = (r - _delta(g2r, g)) & 0xFF
    # red_to_blue applies to the ORIGINAL red (the decoder restores red
    # before using it in the blue inverse).
    new_b = (b - _delta(g2b, g) - _delta(r2b, r)) & 0xFF
    return (
        (argb & 0xFF00FF00) | (new_r.astype(np.uint32) << 16) | new_b.astype(np.uint32)
    ).astype(np.uint32)


# ---------------------------------------------------------------------------
# Color-indexing
# ---------------------------------------------------------------------------

def color_index_inverse(
    packed: np.ndarray, palette: np.ndarray, width: int
) -> np.ndarray:
    """Unpack bundled indices and map through the palette.

    packed: (H, packedW) uint32 where the green channel holds bundled
    indices; palette: (n,) uint32 ARGB entries; returns (H, width) uint32.
    """
    n = len(palette)
    xbits = 0 if n > 16 else (1 if n > 4 else (2 if n > 2 else 3))
    h = packed.shape[0]
    green = (packed >> 8) & 0xFF
    if xbits == 0:
        idx = green[:, :width]
    else:
        per = 1 << xbits            # pixels bundled per packed pixel
        bw = 8 >> xbits             # bits per index
        mask = (1 << bw) - 1
        shifts = (np.arange(per) * bw)[None, None, :]
        expanded = (green[:, :, None] >> shifts) & mask   # (H, packedW, per)
        idx = expanded.reshape(h, -1)[:, :width]
    # Out-of-range indices decode as transparent black (expanded map zeros).
    safe_palette = np.zeros(256, dtype=np.uint32)
    safe_palette[:n] = palette
    return safe_palette[idx]


# ---------------------------------------------------------------------------
# Predictor transform (14 spatial predictors)
# ---------------------------------------------------------------------------

def _avg2(a: int, b: int) -> int:
    """Per-channel (a+b)>>1 on packed ARGB without unpacking."""
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _clip255(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _clamped_add_subtract_full(l: int, t: int, tl: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        c = _clip255(((l >> shift) & 0xFF) + ((t >> shift) & 0xFF) - ((tl >> shift) & 0xFF))
        out |= c << shift
    return out


def _clamped_add_subtract_half(l: int, t: int, tl: int) -> int:
    ave = _avg2(l, t)
    out = 0
    for shift in (24, 16, 8, 0):
        a = (ave >> shift) & 0xFF
        b = (tl >> shift) & 0xFF
        d = a - b
        half = d // 2 if d >= 0 else -((-d) // 2)   # trunc toward zero
        out |= _clip255(a + half) << shift
    return out


def _select(l: int, t: int, tl: int) -> int:
    p_l = 0
    p_t = 0
    for shift in (24, 16, 8, 0):
        lc = (l >> shift) & 0xFF
        tc = (t >> shift) & 0xFF
        tlc = (tl >> shift) & 0xFF
        p_l += abs(tc - tlc)
        p_t += abs(lc - tlc)
    return l if p_l < p_t else t


def _predict(mode: int, l: int, t: int, tl: int, tr: int) -> int:
    if mode == 0:
        return ARGB_BLACK
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:
        return _select(l, t, tl)
    if mode == 12:
        return _clamped_add_subtract_full(l, t, tl)
    if mode == 13:
        return _clamped_add_subtract_half(l, t, tl)
    raise ValueError(f"bad predictor mode {mode}")


def _add_pixels(residual: int, pred: int) -> int:
    """Per-channel (residual + pred) mod 256 on packed ARGB."""
    return ((residual & 0x00FF00FF) + (pred & 0x00FF00FF)) & 0x00FF00FF | (
        ((residual & 0xFF00FF00) + (pred & 0xFF00FF00)) & 0xFF00FF00
    )


def predictor_inverse(
    residuals: np.ndarray, predictor_img: np.ndarray, bits: int
) -> np.ndarray:
    """Sequential raster-order inverse of the predictor transform.

    residuals: (H, W) uint32; predictor_img: (tH, tW) uint32 whose green
    channel holds the tile's mode.  TR of the last column wraps to the
    current row's first pixel (contiguous-memory semantics the format
    relies on).
    """
    native = _predictor_inverse_native(residuals, predictor_img, bits)
    if native is not None:
        return native
    h, w = residuals.shape
    out = np.zeros((h, w), dtype=np.uint32)
    res = residuals.tolist()
    modes = ((predictor_img >> 8) & 0xFF).tolist()
    rows = out.tolist()
    for y in range(h):
        row = rows[y]
        above = rows[y - 1] if y > 0 else None
        ty = y >> bits
        mode_row = modes[ty]
        for x in range(w):
            if y == 0:
                pred = ARGB_BLACK if x == 0 else row[x - 1]
            elif x == 0:
                pred = above[0]
            else:
                mode = mode_row[x >> bits]
                tr = above[x + 1] if x + 1 < w else row[0]
                pred = _predict(mode, row[x - 1], above[x], above[x - 1], tr)
            row[x] = _add_pixels(res[y][x], pred)
        rows[y] = row
    return np.array(rows, dtype=np.uint32)


def _predictor_inverse_native(
    residuals: np.ndarray, predictor_img: np.ndarray, bits: int
) -> np.ndarray | None:
    import ctypes

    from ...entropy.native_loader import get_lib

    lib = get_lib()
    if lib is None:
        return None
    h, w = residuals.shape
    buf = np.ascontiguousarray(residuals, np.uint32).copy()
    modes = np.ascontiguousarray(predictor_img.reshape(-1), np.uint32)
    lib.wtpu_vp8l_predictor_inverse(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        w, h,
        modes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        bits, predictor_img.shape[1],
    )
    return buf


def predictor_forward(
    argb: np.ndarray, predictor_img: np.ndarray, bits: int
) -> np.ndarray:
    """Forward predictor transform (encoder): residual = pixel - pred."""
    h, w = argb.shape
    pix = argb.tolist()
    modes = ((predictor_img >> 8) & 0xFF).tolist()
    out = [[0] * w for _ in range(h)]
    for y in range(h):
        row = pix[y]
        above = pix[y - 1] if y > 0 else None
        mode_row = modes[y >> bits]
        for x in range(w):
            if y == 0:
                pred = ARGB_BLACK if x == 0 else row[x - 1]
            elif x == 0:
                pred = above[0]
            else:
                mode = mode_row[x >> bits]
                tr = above[x + 1] if x + 1 < w else row[0]
                pred = _predict(mode, row[x - 1], above[x], above[x - 1], tr)
            out[y][x] = _sub_pixels(row[x], pred)
    return np.array(out, dtype=np.uint32)


def _sub_pixels(pixel: int, pred: int) -> int:
    """Per-channel (pixel - pred) mod 256 on packed ARGB."""
    out = 0
    for shift in (24, 16, 8, 0):
        out |= (((pixel >> shift) - (pred >> shift)) & 0xFF) << shift
    return out


__all__ = [
    "subsample_size",
    "argb_to_channels",
    "channels_to_argb",
    "add_green_inverse",
    "subtract_green_forward",
    "color_transform_inverse",
    "color_transform_forward",
    "color_index_inverse",
    "predictor_inverse",
    "predictor_forward",
]
