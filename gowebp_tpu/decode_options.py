"""Decoder options: output modes, cropping, scaling, flipping.

Feature parity target: /root/reference/pkg/libwebp/webp/decode.go:59-77
(WebPDecoderOptions) and decoder/webp.go:812-980 (validation + io setup).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .errors import InvalidConfig


@dataclass
class DecoderConfig:
    bypass_filtering: bool = False        # skip the in-loop filter (VP8)
    no_fancy_upsampling: bool = False     # nearest-neighbor chroma
    use_cropping: bool = False
    crop_left: int = 0
    crop_top: int = 0
    crop_width: int = 0
    crop_height: int = 0
    use_scaling: bool = False
    scaled_width: int = 0
    scaled_height: int = 0
    use_threads: bool = False             # accepted; batch-level parallelism
    dithering_strength: int = 0           # 0..100 (VP8 chroma dither)
    flip: bool = False                    # vertical flip
    alpha_dithering_strength: int = 0     # 0..100

    def validate(self, width: int, height: int) -> None:
        if self.use_cropping:
            if (
                self.crop_width <= 0
                or self.crop_height <= 0
                or self.crop_left < 0
                or self.crop_top < 0
                or self.crop_left + self.crop_width > width
                or self.crop_top + self.crop_height > height
            ):
                raise InvalidConfig("bad crop rectangle")
        if self.use_scaling and (self.scaled_width <= 0 and self.scaled_height <= 0):
            raise InvalidConfig("bad scaling dimensions")
        if not (0 <= self.dithering_strength <= 100):
            raise InvalidConfig("dithering_strength in [0,100]")
        if not (0 <= self.alpha_dithering_strength <= 100):
            raise InvalidConfig("alpha_dithering_strength in [0,100]")

    def resolve_scale(self, width: int, height: int) -> tuple[int, int]:
        """Fill a missing scaled dimension preserving aspect ratio."""
        sw, sh = self.scaled_width, self.scaled_height
        if sw == 0:
            sw = max(1, width * sh // height)
        if sh == 0:
            sh = max(1, height * sw // width)
        return sw, sh


def apply_output_options(rgba: np.ndarray, config: DecoderConfig) -> np.ndarray:
    """Crop → scale → flip on the decoded RGBA array."""
    h, w = rgba.shape[:2]
    config.validate(w, h)
    out = rgba
    if config.use_cropping:
        out = out[
            config.crop_top : config.crop_top + config.crop_height,
            config.crop_left : config.crop_left + config.crop_width,
        ]
    if config.use_scaling:
        sw, sh = config.resolve_scale(out.shape[1], out.shape[0])
        out = _rescale(out, sw, sh)
    if config.flip:
        out = out[::-1]
    return np.ascontiguousarray(out)


def _rescale(rgba: np.ndarray, sw: int, sh: int) -> np.ndarray:
    """Fixed-point area/bilinear plane rescaler (WebPRescaler equivalent).

    Uses separable linear interpolation with 16-bit fixed-point weights —
    the same class of algorithm as utils/rescaler_utils in the reference.
    """
    h, w = rgba.shape[:2]
    out = np.empty((sh, sw, rgba.shape[2]), np.uint8)
    FIX = 16
    xs = (np.arange(sw, dtype=np.int64) * w << FIX) // sw
    ys = (np.arange(sh, dtype=np.int64) * h << FIX) // sh
    x0 = np.minimum(xs >> FIX, w - 1)
    y0 = np.minimum(ys >> FIX, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    fx = xs & ((1 << FIX) - 1)
    fy = ys & ((1 << FIX) - 1)
    src = rgba.astype(np.int64)
    top = src[y0][:, x0] * ((1 << FIX) - fx)[None, :, None] + src[y0][:, x1] * fx[None, :, None]
    bot = src[y1][:, x0] * ((1 << FIX) - fx)[None, :, None] + src[y1][:, x1] * fx[None, :, None]
    mix = (
        top * ((1 << FIX) - fy)[:, None, None] + bot * fy[:, None, None]
    ) >> (2 * FIX)
    out[:] = np.clip(mix, 0, 255)
    return out


__all__ = ["DecoderConfig", "apply_output_options"]
