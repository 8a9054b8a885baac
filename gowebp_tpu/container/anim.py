"""Animation decode (canvas state machine) and encode.

Feature parity target: /root/reference/pkg/libwebp/demux/anim_decode.go
(dispose/blend canvas compositing) and mux/anim_encode.go
(WebPAnimEncoderAdd/Assemble; delta-frame optimization is a later stage —
this encoder emits full-canvas frames, which every decoder accepts).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..errors import WebPError
from .demux import Demuxer, FrameInfo, demux
from .mux import Mux, MuxFrame


def _decode_frame_rgba(f: FrameInfo) -> np.ndarray:
    if f.is_lossless:
        from ..models.vp8l.decoder import decode_vp8l

        return decode_vp8l(f.image_payload)
    from ..models.vp8.decoder import decode_vp8_rgba

    return decode_vp8_rgba(f.image_payload, alpha_payload=f.alpha_payload)


def _blend_nonpremult(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Src-over blend, libwebp's integer formulation (non-premultiplied)."""
    src_i = src.astype(np.int32)
    dst_i = dst.astype(np.int32)
    src_a = src_i[..., 3]
    dst_a = dst_i[..., 3]
    scale = (dst_a * (255 - src_a)) // 255
    blend_a = src_a + scale
    safe = np.maximum(blend_a, 1)
    out = np.empty_like(src)
    for c in range(3):
        out[..., c] = (src_i[..., c] * src_a + dst_i[..., c] * scale) // safe
    out[..., 3] = blend_a
    out[blend_a == 0] = 0
    # Fully-opaque or fully-transparent source short-circuits.
    opaque = src_a == 255
    out[opaque] = src[opaque]
    clear = src_a == 0
    out[clear] = dst[clear]
    return out


@dataclass
class AnimFrame:
    rgba: np.ndarray
    duration_ms: int


def decode_animation(data: bytes) -> tuple[list[AnimFrame], Demuxer]:
    """Decode all frames to full-canvas RGBA arrays (composited)."""
    d = demux(data)
    W, H = d.canvas_width, d.canvas_height
    canvas = np.zeros((H, W, 4), np.uint8)
    out = []
    for f in d.frames:
        rgba = _decode_frame_rgba(f)
        fh, fw = rgba.shape[:2]
        region = canvas[f.y : f.y + fh, f.x : f.x + fw]
        if f.blend:
            region[:] = _blend_nonpremult(rgba, region)
        else:
            region[:] = rgba
        out.append(AnimFrame(canvas.copy(), f.duration_ms))
        if f.dispose_background:
            canvas[f.y : f.y + fh, f.x : f.x + fw] = 0
    return out, d


class AnimationEncoder:
    """Accumulate frames, then assemble an animated WebP.

    Delta optimization (reference anim_encode.go: change-rect
    minimization + duration merging): identical frames extend the
    previous frame's duration; changed frames encode only the even-
    aligned bounding rectangle of the change, placed at (x, y) with
    overwrite blending.
    """

    def __init__(self, *, loop_count: int = 0,
                 background_color: int = 0xFFFFFFFF,
                 minimize_size: bool = True,
                 allow_mixed: bool = False):
        self._mux = Mux(loop_count=loop_count,
                        background_color=background_color)
        self._minimize = minimize_size
        self._allow_mixed = allow_mixed
        self._canvas: np.ndarray | None = None

    def add_frame(self, rgba: np.ndarray, duration_ms: int, *,
                  lossless: bool = True, quality: float = 75.0) -> None:
        rgba = np.asarray(rgba)
        if rgba.shape[-1] == 3:
            rgba = np.concatenate(
                [rgba, np.full(rgba.shape[:2] + (1,), 255, np.uint8)], -1
            )
        x = y = 0
        sub = rgba
        if self._minimize and self._canvas is not None \
                and self._canvas.shape == rgba.shape:
            diff = (rgba != self._canvas).any(axis=-1)
            if not diff.any():
                # Identical frame: merge into the previous duration.
                if self._mux.frames:
                    self._mux.frames[-1].duration_ms += duration_ms
                    self._canvas = rgba.copy()
                    return
            else:
                ys, xs = np.nonzero(diff)
                y0, y1 = int(ys.min()), int(ys.max()) + 1
                x0, x1 = int(xs.min()), int(xs.max()) + 1
                # ANMF offsets must be even; sizes stay within canvas.
                x0 &= ~1
                y0 &= ~1
                # Change-rect sub-frames composite exactly for lossless;
                # for lossy the error is confined to the changed rect
                # (unchanged pixels keep the previous canvas), matching
                # the reference's lossy sub-rectangle candidates
                # (anim_encode.go ComparePixelsLossy path).
                x, y = x0, y0
                sub = rgba[y0:y1, x0:x1]
        self._canvas = rgba.copy()

        from ..config import EncoderConfig
        from ..container.riff import parse_riff
        from ..encode import encode_rgba

        # Candidate trial (reference PickBestCandidate): with allow_mixed
        # both codecs are tried and the smaller sub-frame wins.
        modes = [lossless] if not self._allow_mixed else [True, False]
        data = None
        for ll in modes:
            cfg = EncoderConfig(lossless=ll, quality=quality)
            cand = encode_rgba(np.ascontiguousarray(sub), config=cfg)
            if data is None or len(cand) < len(data):
                data = cand
        parsed = parse_riff(data)
        vp8l = parsed.find(b"VP8L")
        vp8 = parsed.find(b"VP8 ")
        alpha = parsed.find(b"ALPH")
        if vp8l is not None:
            frame = MuxFrame(vp8l.payload, True, None)
        elif vp8 is not None:
            frame = MuxFrame(vp8.payload, False,
                             alpha.payload if alpha else None)
        else:
            raise WebPError("internal: no image chunk produced")
        frame.duration_ms = duration_ms
        frame.blend = False           # overwrite compositing
        frame.x = x
        frame.y = y
        self._mux.push_frame(frame)

    def assemble(self) -> bytes:
        return self._mux.assemble()


__all__ = ["decode_animation", "AnimationEncoder", "AnimFrame"]
