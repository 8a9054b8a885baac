"""Top-level encode API.

Equivalent surface: /root/reference/encode.go + pkg/libwebp/enc (the
libwebp WebPEncode pipeline catalogued in SURVEY.md §2.5/§3.1).
"""

from __future__ import annotations

import numpy as np

from .config import EncoderConfig
from .constants import CHUNK_VP8L
from .container.riff import Chunk, assemble_simple
from .errors import EncodeError


def encode_rgba(
    rgba: np.ndarray,
    *,
    lossless: bool = True,
    quality: float = 75.0,
    method: int = 4,
    config: EncoderConfig | None = None,
    stats=None,
) -> bytes:
    """Encode an (H, W, 3|4) uint8 array into a .webp byte string.

    Pass an EncodeStats instance as ``stats`` to collect WebPAuxStats-style
    diagnostics for the encode.
    """
    if config is None:
        config = EncoderConfig(lossless=lossless, quality=quality, method=method)
    config.validate()
    rgba = np.asarray(rgba)
    if rgba.dtype != np.uint8:
        raise EncodeError("expected uint8 pixels")

    _progress(config, 0)
    if config.lossless:
        from .models.vp8l.encoder import encode_vp8l

        if config.near_lossless < 100:
            from .models.vp8l.near_lossless import apply_near_lossless

            if rgba.shape[2] == 3:
                rgba = np.concatenate(
                    [rgba, np.full(rgba.shape[:2] + (1,), 255, np.uint8)],
                    axis=-1,
                )
            rgba = apply_near_lossless(rgba, config.near_lossless)

        payload = encode_vp8l(rgba, quality=int(config.quality), stats=stats)
        out = assemble_simple(Chunk(CHUNK_VP8L, payload))
        if stats is not None:
            stats.coded_size = len(out)
            stats.lossless_size = len(payload)
        _progress(config, 100)
        return out

    from .models.vp8.encoder import encode_vp8_webp

    out = encode_vp8_webp(rgba, config, stats=stats)
    if stats is not None:
        stats.coded_size = len(out)
    _progress(config, 100)
    return out


def _progress(config: EncoderConfig, percent: int) -> None:
    hook = getattr(config, "progress_hook", None)
    if hook is not None and hook(percent) is False:
        raise EncodeError("encoding aborted by progress hook")


__all__ = ["encode_rgba"]
