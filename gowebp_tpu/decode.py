"""Top-level decode API.

Equivalent surface: /root/reference/decode.go (which panics — the feature
target is libwebp's WebPDecode, catalogued in SURVEY.md §2.4/§3.3).
"""

from __future__ import annotations

import numpy as np

from .constants import CHUNK_ALPHA, CHUNK_VP8, CHUNK_VP8L
from .container.riff import WebPFeatures, get_features, parse_riff
from .errors import BitstreamError
from .models.vp8l.decoder import decode_vp8l


def decode_rgba(data: bytes) -> np.ndarray:
    """Decode a .webp file (still image) to an (H, W, 4) uint8 RGBA array."""
    parsed = parse_riff(data)
    vp8l = parsed.find(CHUNK_VP8L)
    if vp8l is not None:
        return decode_vp8l(vp8l.payload)
    vp8 = parsed.find(CHUNK_VP8)
    if vp8 is not None:
        try:
            from .models.vp8.decoder import decode_vp8_rgba
        except ImportError as exc:
            from .errors import UnsupportedFeature

            raise UnsupportedFeature("VP8 lossy decode not built yet") from exc

        alpha_chunk = parsed.find(CHUNK_ALPHA)
        alpha = alpha_chunk.payload if alpha_chunk is not None else None
        return decode_vp8_rgba(vp8.payload, alpha_payload=alpha)
    raise BitstreamError("no decodable image chunk found")


def decode_rgb(data: bytes) -> np.ndarray:
    return decode_rgba(data)[..., :3]


def features(data: bytes) -> WebPFeatures:
    return get_features(data)


__all__ = ["decode_rgba", "decode_rgb", "features"]
