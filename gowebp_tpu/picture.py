"""Encoder-side picture utilities: view / crop / rescale.

Equivalent surface: the reference's picture tools
(/root/reference/pkg/libwebp/enc/picture_rescale_enc.c.go:57
``WebPPictureView``, :89 ``WebPPictureCrop``, :149 ``WebPPictureRescale``),
re-expressed for the array-native API: pictures are (H, W, 3|4) uint8
arrays, so a *view* is a zero-copy NumPy slice and *crop* is the same
slice materialized.

Rescale follows the reference's semantics: alpha-bearing pictures are
premultiplied before scaling and un-premultiplied after (the
alpha_processing MULTIPLIER idiom, alpha_processing.go:100-163 — the
reference calls WebPMultARGBRows around the rescaler for exactly this
reason), and the scaler itself is the shared fixed-point
WebPRescaler-equivalent used on the decode side.
"""

from __future__ import annotations

import numpy as np

from .decode_options import _rescale
from .errors import WebPError


def _check_rect(shape, left: int, top: int, width: int, height: int) -> None:
    h, w = shape[:2]
    if width <= 0 or height <= 0:
        raise WebPError(f"bad crop size {width}x{height}")
    if left < 0 or top < 0 or left + width > w or top + height > h:
        raise WebPError(
            f"crop rect {left},{top} {width}x{height} outside {w}x{h}")


def picture_view(rgba: np.ndarray, left: int, top: int,
                 width: int, height: int) -> np.ndarray:
    """Zero-copy sub-rectangle view (WebPPictureView).

    The returned array shares memory with the input — mutating either
    affects both, exactly like the reference's borrowed-memory view.
    """
    rgba = np.asarray(rgba)
    _check_rect(rgba.shape, left, top, width, height)
    return rgba[top:top + height, left:left + width]


def picture_crop(rgba: np.ndarray, left: int, top: int,
                 width: int, height: int) -> np.ndarray:
    """Owned sub-rectangle copy (WebPPictureCrop)."""
    return np.ascontiguousarray(picture_view(rgba, left, top, width, height))


# 8-bit premultiply/unmultiply (reference alpha_processing MULTIPLIER
# idiom; kept in integer fixed point so crop→rescale→encode pipelines
# stay platform-independent).
def _mult_row(c: np.ndarray, a: np.ndarray) -> np.ndarray:
    return ((c.astype(np.uint32) * a.astype(np.uint32) * 32897) >> 23
            ).astype(np.uint8)


def _unmult_row(c: np.ndarray, a: np.ndarray) -> np.ndarray:
    a32 = np.maximum(a.astype(np.uint32), 1)
    out = np.minimum((c.astype(np.uint32) * 255 + a32 // 2) // a32, 255)
    return np.where(a == 0, 0, out).astype(np.uint8)


def picture_rescale(rgba: np.ndarray, width: int = 0,
                    height: int = 0) -> np.ndarray:
    """Fixed-point rescale (WebPPictureRescale).

    Passing 0 for one dimension preserves the aspect ratio (the
    reference's convention, picture_rescale_enc.c.go:149-168).
    Alpha-bearing inputs are premultiplied around the scaler so
    transparent pixels don't bleed color into their neighbours.
    """
    rgba = np.asarray(rgba)
    if rgba.ndim != 3 or rgba.shape[2] not in (3, 4):
        raise WebPError("picture must be (H, W, 3|4) uint8")
    h, w = rgba.shape[:2]
    if width == 0 and height == 0:
        raise WebPError("rescale needs a target width or height")
    if width == 0:
        width = max(1, (w * height + h - 1) // h)
    if height == 0:
        height = max(1, (h * width + w - 1) // w)
    if (width, height) == (w, h):
        return rgba.copy()
    has_alpha = rgba.shape[2] == 4 and bool((rgba[..., 3] != 255).any())
    if has_alpha:
        a = rgba[..., 3]
        pre = np.dstack([_mult_row(rgba[..., c], a) for c in range(3)]
                        + [a])
        scaled = _rescale(pre, width, height)
        sa = scaled[..., 3]
        return np.dstack([_unmult_row(scaled[..., c], sa) for c in range(3)]
                         + [sa])
    return _rescale(rgba, width, height)


__all__ = ["picture_crop", "picture_rescale", "picture_view"]
