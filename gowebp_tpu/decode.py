"""Top-level decode API.

Equivalent surface: libwebp's WebPDecode/WebPDecodeRGBA family with
WebPDecoderOptions (catalogued from the reference in SURVEY.md §2.4/§3.3;
/root/reference/decode.go itself panics).
"""

from __future__ import annotations

import numpy as np

from .constants import CHUNK_ALPHA, CHUNK_VP8, CHUNK_VP8L
from .container.riff import WebPFeatures, get_features, parse_riff
from .decode_options import DecoderConfig, apply_output_options
from .errors import BitstreamError

_MODE_PERMUTE = {
    "RGBA": (0, 1, 2, 3),
    "BGRA": (2, 1, 0, 3),
    "ARGB": (3, 0, 1, 2),
    "RGB": (0, 1, 2),
    "BGR": (2, 1, 0),
}
# Premultiplied variants (reference MODE_rgbA/bgrA/Argb) share the
# channel orders; the premultiply runs first.
_MODE_PREMULT = {"rgbA": "RGBA", "bgrA": "BGRA", "Argb": "ARGB",
                 "rgbA_4444": "RGBA_4444"}
_MODE_PACKED = ("RGB_565", "RGBA_4444")


def _premultiply(rgba: np.ndarray) -> np.ndarray:
    """8-bit approximate premultiply: (c * a * 32897) >> 23.

    Matches the reference's alpha_processing MULTIPLIER idiom
    (alpha_processing.go:100-163) rather than exact c*a/255.
    """
    out = rgba.copy()
    a = rgba[..., 3].astype(np.uint32)
    for c in range(3):
        out[..., c] = ((rgba[..., c].astype(np.uint32) * a * 32897)
                       >> 23).astype(np.uint8)
    return out


def _pack_16bit(rgba: np.ndarray, mode: str) -> np.ndarray:
    """(H, W, 4) → (H, W, 2) uint8 packed rows (reference MODE_RGB_565 /
    MODE_RGBA_4444 byte order)."""
    r = rgba[..., 0].astype(np.uint16)
    g = rgba[..., 1].astype(np.uint16)
    b = rgba[..., 2].astype(np.uint16)
    out = np.empty(rgba.shape[:2] + (2,), np.uint8)
    if mode == "RGB_565":
        out[..., 0] = ((r & 0xF8) | (g >> 5)).astype(np.uint8)
        out[..., 1] = (((g << 3) & 0xE0) | (b >> 3)).astype(np.uint8)
    else:  # RGBA_4444
        a = rgba[..., 3].astype(np.uint16)
        out[..., 0] = ((r & 0xF0) | (g >> 4)).astype(np.uint8)
        out[..., 1] = ((b & 0xF0) | (a >> 4)).astype(np.uint8)
    return out


def decode(data: bytes, config: DecoderConfig | None = None,
           mode: str = "RGBA") -> np.ndarray:
    """Decode a .webp file with options → (H, W, C) uint8 array.

    ``mode`` accepts the reference's colorspace set: RGBA/BGRA/ARGB/
    RGB/BGR, premultiplied rgbA/bgrA/Argb/rgbA_4444, and the packed
    RGB_565/RGBA_4444 (returned as (H, W, 2) byte pairs).
    """
    premult = mode in _MODE_PREMULT
    if premult:
        mode = _MODE_PREMULT[mode]
    if mode not in _MODE_PERMUTE and mode not in _MODE_PACKED:
        raise ValueError(
            f"bad mode {mode!r} (use {sorted(_MODE_PERMUTE) + list(_MODE_PACKED) + sorted(_MODE_PREMULT)})"
        )
    config = config or DecoderConfig()
    parsed = parse_riff(data)
    vp8l = parsed.find(CHUNK_VP8L)
    if vp8l is not None:
        from .models.vp8l.decoder import decode_vp8l

        rgba = decode_vp8l(vp8l.payload)
    else:
        vp8 = parsed.find(CHUNK_VP8)
        if vp8 is None:
            raise BitstreamError("no decodable image chunk found")
        try:
            from .models.vp8.decoder import decode_vp8_rgba
        except ImportError as exc:  # pragma: no cover
            from .errors import UnsupportedFeature

            raise UnsupportedFeature("VP8 lossy decode not built") from exc
        alpha_chunk = parsed.find(CHUNK_ALPHA)
        rgba = decode_vp8_rgba(
            vp8.payload,
            alpha_payload=alpha_chunk.payload if alpha_chunk else None,
            fancy_upsampling=not config.no_fancy_upsampling,
            bypass_filtering=config.bypass_filtering,
            dithering_strength=config.dithering_strength,
        )
    if (config.alpha_dithering_strength > 0 and rgba.shape[2] == 4
            and bool((rgba[..., 3] != 255).any())):
        # Alpha dithering (reference alpha_dithering_strength option):
        # deterministic triangular dither over the smoothed alpha plane.
        amp = 8 * config.alpha_dithering_strength // 100
        if amp > 0:
            rng = np.random.default_rng(0xA1FA)
            sh = rgba.shape[:2]
            noise = (rng.integers(0, amp + 1, sh)
                     + rng.integers(0, amp + 1, sh) - amp).astype(np.int32)
            a = np.clip(rgba[..., 3].astype(np.int32) + noise // 2, 0, 255)
            rgba = rgba.copy()
            rgba[..., 3] = a.astype(np.uint8)
    rgba = apply_output_options(rgba, config)
    if premult:
        rgba = _premultiply(rgba)
    if mode in _MODE_PACKED:
        return _pack_16bit(rgba, mode)
    perm = _MODE_PERMUTE[mode]
    if perm == tuple(range(rgba.shape[2])):
        return rgba          # identity permute: no copy
    return np.ascontiguousarray(rgba[..., list(perm)])


def decode_rgba(data: bytes, config: DecoderConfig | None = None) -> np.ndarray:
    """Decode a .webp file (still image) to an (H, W, 4) uint8 RGBA array."""
    return decode(data, config, "RGBA")


def decode_rgb(data: bytes, config: DecoderConfig | None = None) -> np.ndarray:
    return decode(data, config, "RGB")


def decode_yuv(data: bytes):
    """Decode to raw Y/U/V planes (lossy files only)."""
    parsed = parse_riff(data)
    vp8 = parsed.find(CHUNK_VP8)
    if vp8 is None:
        raise BitstreamError("YUV output requires a lossy (VP8) file")
    from .models.vp8.decoder import decode_vp8_yuv

    return decode_vp8_yuv(vp8.payload)


def decode_rgba_batch(datas: list, use_tpu: bool = True,
                      threads: int = 0) -> list:
    """Decode many .webp files; same-sized lossy images share one TPU
    post-processing launch (chroma upsample + color conversion batched).

    Host entropy decode + reconstruction fans out over threads (the C++
    decoder releases the GIL); the dense pixel-rate work runs as a single
    batched jit call.
    """
    import concurrent.futures as cf

    from .models.vp8.decoder import decode_vp8_yuv

    def host_one(data):
        parsed = parse_riff(data)
        vp8 = parsed.find(CHUNK_VP8)
        if (
            not use_tpu
            or vp8 is None
            or parsed.find(CHUNK_ALPHA) is not None
        ):
            return ("full", decode_rgba(data))
        return ("planes", decode_vp8_yuv(vp8.payload))

    workers = threads if threads > 0 else min(8, max(1, len(datas)))
    if workers <= 1 or len(datas) <= 1:
        host = [host_one(d) for d in datas]
    else:
        with cf.ThreadPoolExecutor(max_workers=workers) as pool:
            host = list(pool.map(host_one, datas))
    planes = []
    fallback = {}
    for i, (kind, val) in enumerate(host):
        if kind == "full":
            fallback[i] = val
            planes.append(None)
        else:
            planes.append(val)

    # Group identical shapes into batches.
    groups = {}
    for i, p in enumerate(planes):
        if p is not None:
            groups.setdefault(p[0].shape, []).append(i)
    results = [None] * len(datas)
    if groups:
        import numpy as np

        from .ops.yuv_jax import batch_yuv_to_rgba

        for shape, idxs in groups.items():
            y = np.stack([planes[i][0] for i in idxs]).astype(np.int32)
            u = np.stack([planes[i][1] for i in idxs]).astype(np.int32)
            v = np.stack([planes[i][2] for i in idxs]).astype(np.int32)
            out = np.asarray(batch_yuv_to_rgba(y, u, v))
            for k, i in enumerate(idxs):
                results[i] = out[k]
    for i, r in fallback.items():
        results[i] = r
    return results


def features(data: bytes) -> WebPFeatures:
    return get_features(data)


__all__ = [
    "decode",
    "decode_rgba",
    "decode_rgb",
    "decode_yuv",
    "features",
    "DecoderConfig",
]
