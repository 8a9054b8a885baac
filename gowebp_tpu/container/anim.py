"""Animation decode (canvas state machine) and encode.

Feature parity target: /root/reference/pkg/libwebp/demux/anim_decode.go
(dispose/blend canvas compositing) and mux/anim_encode.go
(WebPAnimEncoderAdd/Assemble: change-rect minimization, candidate
trials, identical-pixel blanking, duration merging, kmin/kmax keyframe
policy, single-frame optimization).
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


def _encode_candidate(sub: np.ndarray, lossless: bool,
                      quality: float) -> bytes:
    from ..config import EncoderConfig
    from ..encode import encode_rgba

    cfg = EncoderConfig(lossless=lossless, quality=quality)
    return encode_rgba(np.ascontiguousarray(sub), config=cfg)


def _payloads(data: bytes) -> MuxFrame:
    from ..container.riff import parse_riff

    parsed = parse_riff(data)
    vp8l = parsed.find(b"VP8L")
    vp8 = parsed.find(b"VP8 ")
    alpha = parsed.find(b"ALPH")
    if vp8l is not None:
        return MuxFrame(vp8l.payload, True, None)
    if vp8 is not None:
        return MuxFrame(vp8.payload, False, alpha.payload if alpha else None)
    raise WebPError("internal: no image chunk produced")


class AnimationEncoder:
    """Accumulate frames, then assemble an animated WebP.

    Reference behaviors re-expressed (mux/anim_encode.go):
    - identical frames extend the previous frame's duration
      (IncreasePreviousDuration);
    - changed frames encode only the even-aligned change rectangle
      (MinimizeChangeRectangle), overwrite compositing;
    - for lossless sub-frames whose changed pixels are all opaque, a
      second candidate blanks the unchanged pixels to transparent and
      composites with blending (CopyIdenticalPixels) — smaller wins;
    - with ``allow_mixed``, lossy and lossless candidates are both tried
      per sub-frame (PickBestCandidate);
    - ``kmax``/``kmin`` keyframe policy: after ``kmax`` delta frames a
      full-canvas keyframe is forced; between ``kmin`` and ``kmax`` the
      keyframe is taken greedily when it is no larger than the delta
      (the reference defers the choice with a penalty heuristic;
      greedy-by-size is our equivalent). ``kmax=0`` disables forced
      keyframes, ``kmax=1`` makes every frame a keyframe.
    """

    def __init__(self, *, loop_count: int = 0,
                 background_color: int = 0xFFFFFFFF,
                 minimize_size: bool = True,
                 allow_mixed: bool = False,
                 kmin: int = 0, kmax: int = 0):
        self._mux = Mux(loop_count=loop_count,
                        background_color=background_color)
        self._minimize = minimize_size
        self._allow_mixed = allow_mixed
        if kmax == 1:
            kmin, kmax = 0, 1
        elif kmax > 1 and kmin >= kmax:
            kmin = kmax - 1
        self._kmin, self._kmax = kmin, kmax
        self._since_key = 0
        self._last_blend = False
        self._canvas: np.ndarray | None = None
        self._prev_rect: tuple | None = None

    def _candidates(self, sub: np.ndarray, changed: np.ndarray | None,
                    lossless: bool, quality: float) -> bytes:
        """Encode all compositing/codec candidates, return smallest file.

        ``changed`` is the boolean change mask for ``sub`` (None for a
        keyframe / first frame).
        """
        modes = [True, False] if self._allow_mixed else [lossless]
        best: tuple[bytes, bool] | None = None
        for ll in modes:
            data = _encode_candidate(sub, ll, quality)
            if best is None or len(data) < len(best[0]):
                best = (data, False)
            # Blanking candidate: only exact for lossless and only when
            # every changed pixel is opaque (src-over == overwrite then).
            if (ll and changed is not None and not changed.all()
                    and bool(sub[changed][:, 3].min(initial=255) == 255)):
                blanked = sub.copy()
                blanked[~changed] = 0
                data2 = _encode_candidate(blanked, True, quality)
                if len(data2) < len(best[0]):
                    best = (data2, True)
        self._last_blend = best[1]
        return best[0]

    def add_frame(self, rgba: np.ndarray, duration_ms: int, *,
                  lossless: bool = True, quality: float = 75.0) -> None:
        rgba = np.asarray(rgba)
        if rgba.shape[-1] == 3:
            rgba = np.concatenate(
                [rgba, np.full(rgba.shape[:2] + (1,), 255, np.uint8)], -1
            )
        force_key = (self._kmax == 1
                     or (self._kmax > 1 and self._since_key >= self._kmax))
        try_key = (self._kmax > 1 and self._since_key >= self._kmin)

        def delta_against(ref_canvas):
            """(sub, changed, x, y) minimal even-aligned change rect of
            ``rgba`` vs ``ref_canvas`` (None if identical)."""
            diff = (rgba != ref_canvas).any(axis=-1)
            if not diff.any():
                return None
            ys, xs = np.nonzero(diff)
            y0, y1 = int(ys.min()), int(ys.max()) + 1
            x0, x1 = int(xs.min()), int(xs.max()) + 1
            x0 &= ~1               # ANMF offsets must be even
            y0 &= ~1
            return rgba[y0:y1, x0:x1], diff[y0:y1, x0:x1], x0, y0

        x = y = 0
        sub = rgba
        changed = None
        prev_bg = False
        prev_canvas = self._canvas      # decoder state after prev frame
        if self._minimize and prev_canvas is not None \
                and prev_canvas.shape == rgba.shape:
            d_none = delta_against(prev_canvas)
            if d_none is None:
                # Identical frame: merge into the previous duration
                # (before any keyframe policy — no new frame is emitted).
                if self._mux.frames:
                    self._mux.frames[-1].duration_ms += duration_ms
                    self._canvas = rgba.copy()
                    return
            if not force_key:
                sub, changed, x, y = d_none
        self._canvas = rgba.copy()

        data = self._candidates(sub, changed, lossless, quality)
        blend = self._last_blend

        # Dispose-to-BACKGROUND candidates (reference PickBestCandidate's
        # 4-way search, anim_encode.go:780-860): re-derive the delta as
        # if the PREVIOUS frame's rect were cleared to transparent
        # before compositing this frame.  This is the only way a frame
        # can cheaply "erase" content — src-over blending can never
        # lower alpha.
        if (self._minimize and not force_key and changed is not None
                and self._prev_rect is not None and self._mux.frames
                and prev_canvas is not None):
            px, py, ph, pw = self._prev_rect
            bg_canvas = prev_canvas.copy()
            bg_canvas[py:py + ph, px:px + pw] = 0
            d_bg = delta_against(bg_canvas)
            if d_bg is not None:
                sub2, changed2, x2, y2 = d_bg
                data2 = self._candidates(sub2, changed2, lossless, quality)
                if len(data2) < len(data):
                    data, blend = data2, self._last_blend
                    sub, changed, x, y = sub2, changed2, x2, y2
                    prev_bg = True

        is_delta = sub.shape[:2] != rgba.shape[:2] or blend
        if is_delta and try_key:
            key_data = _encode_candidate(rgba, lossless, quality)
            if len(key_data) <= len(data):
                data, blend, x, y, is_delta = key_data, False, 0, 0, False
                prev_bg = False

        if prev_bg:
            self._mux.frames[-1].dispose_background = True
        frame = _payloads(data)
        frame.duration_ms = duration_ms
        frame.blend = blend
        frame.x = x
        frame.y = y
        self._mux.push_frame(frame)
        self._since_key = self._since_key + 1 if is_delta else 1
        self._prev_rect = (x, y, sub.shape[0], sub.shape[1])

    def assemble(self) -> bytes:
        # Single-frame animation collapses to a still image (reference
        # OptimizeSingleFrame): Mux already emits the simple container
        # when it holds exactly one full-canvas frame.
        return self._mux.assemble()


__all__ = ["decode_animation", "AnimationEncoder", "AnimFrame"]
