"""Fused Pallas TPU kernel for decode post-processing.

Fancy (2x2 bilinear) chroma upsampling + BT.601 fixed-point YUV->RGBA,
libwebp bit-exact, in one VMEM-resident pass: reads a 16-row luma band
(pre-split into even/odd pixel columns) plus a 10-row chroma window and
writes packed-uint32 RGBA — replacing the scatter-heavy XLA graph of
ops/yuv_jax.py (which materializes every interpolation plane in HBM).

Layout strategy: the upsampler produces, for each chroma column k, the
two output pixels 2k (from the left-leaning tap) and 2k+1 (from the
right-leaning tap).  Both stay at half width inside the kernel — no
lane expansion — and the final even/odd interleave is a single cheap
XLA reshape outside.  Vertical taps come from a 10-row chroma window
assembled from the previous/current/next 8-row chroma bands (the grid's
analog of the reference's row-pair pipeline, io_dec.c.go upsamplers).

Same opt-in policy as encode_plane.py: compiled on pods via
GOWEBP_PALLAS=1, interpreter mode (bit-exact, tested) elsewhere.

Reference parity: fancy upsampling + YUV conversion of
/root/reference/pkg/libwebp/dsp/upsampling.c.go and
pkg/color/yuv/conversion.go:29-47, fused TPU-side.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .encode_plane import _roll


def _chroma_bands(ch, rows, is_first, is_last):
    """Build per-output-row chroma tap rows T, B — each (rows, W2).

    ch: the 10-row window [prev band last row, current 8 rows, next band
    first row].  Output row r (local, band of 16) uses chroma pair
    (jt, jt+1) with jt = (r_global-1)//2; in window coordinates that is
    rows [0,1,1,2,2,...,7,7,8] for T and +1 for B, with two boundary
    fixes: global row 0 uses (0,0) and the last global row clamps B.
    """
    t_rows = [0] + [1 + (r - 1) // 2 for r in range(1, rows)]
    rows_t = [ch[i : i + 1] for i in t_rows]
    rows_b = [ch[i + 1 : i + 2] for i in t_rows]
    # Global row 0: T would index the previous band; use ch[1] (= row 0).
    rows_t[0] = jnp.where(is_first, ch[1:2], rows_t[0])
    # Last global row: B would index past the plane; clamp to ch[8].
    rows_b[-1] = jnp.where(is_last, ch[8:9], rows_b[-1])
    return jnp.concatenate(rows_t, axis=0), jnp.concatenate(rows_b, axis=0)


def _upsample_pair(T, B, r_is_odd):
    """Per chroma column k → (even_out at pixel 2k, odd_out at 2k+1).

    Odd output rows take the 'top' half of the reference row pair, even
    rows the 'bottom' half (dsp/upsampling row-pair structure)."""
    Tn = _roll(T, -1, 1)          # T[k+1]
    Bn = _roll(B, -1, 1)          # B[k+1]
    avg = T + Tn + B + Bn + 8
    d12 = (avg + 2 * (Tn + B)) >> 3      # pair (k, k+1)
    d03 = (avg + 2 * (T + Bn)) >> 3
    d12p = _roll(d12, 1, 1)              # pair (k-1, k)
    d03p = _roll(d03, 1, 1)

    top_even = (d03p + T) >> 1
    top_odd = (d12 + T) >> 1
    bot_even = (d12p + B) >> 1
    bot_odd = (d03 + B) >> 1
    even = jnp.where(r_is_odd, top_even, bot_even)
    odd = jnp.where(r_is_odd, top_odd, bot_odd)

    # Image edges (x == 0 and x == W-1): 3:1 vertical-only filter.
    edge_t = (3 * T + B + 2) >> 2
    edge_b = (3 * B + T + 2) >> 2
    edge = jnp.where(r_is_odd, edge_t, edge_b)
    W2 = T.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, T.shape, 1)
    even = jnp.where(lane == 0, edge, even)
    odd = jnp.where(lane == W2 - 1, edge, odd)
    return even, odd


def _pack_rgba(y, u, v, alpha):
    """BT.601 fixed-point YUV->RGB, packed r|g<<8|b<<16|a<<24 (int32)."""
    yy = (y * 19077) >> 8
    mask2 = (256 << 6) - 1

    def clip8(x):
        return jnp.clip(x, 0, mask2) >> 6

    r = clip8(yy + ((v * 26149) >> 8) - 14234)
    g = clip8(yy - ((u * 6419) >> 8) - ((v * 13320) >> 8) + 8708)
    b = clip8(yy + ((u * 33050) >> 8) - 17685)
    return r | (g << 8) | (b << 16) | (alpha << 24)


def _post_kernel(ye_ref, yo_ref, up_ref, uc_ref, un_ref,
                 vp_ref, vc_ref, vn_ref, ae_ref, ao_ref,
                 oute_ref, outo_ref):
    rows = ye_ref.shape[1]
    i = pl.program_id(1)
    is_first = i == 0
    is_last = i == pl.num_programs(1) - 1
    r_is_odd = (
        jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % 2 == 1)

    uwin = jnp.concatenate([up_ref[0, 7:8], uc_ref[0], un_ref[0, 0:1]], 0)
    vwin = jnp.concatenate([vp_ref[0, 7:8], vc_ref[0], vn_ref[0, 0:1]], 0)
    uT, uB = _chroma_bands(uwin, rows, is_first, is_last)
    vT, vB = _chroma_bands(vwin, rows, is_first, is_last)
    u_even, u_odd = _upsample_pair(uT, uB, r_is_odd)
    v_even, v_odd = _upsample_pair(vT, vB, r_is_odd)

    oute_ref[0] = _pack_rgba(ye_ref[0], u_even, v_even, ae_ref[0])
    outo_ref[0] = _pack_rgba(yo_ref[0], u_odd, v_odd, ao_ref[0])


def yuv420_to_rgba_pallas(y, u, v, alpha=None, *, interpret=None):
    """(B,H,W) luma + (B,H/2,W/2) chroma [+ (B,H,W) alpha] → RGBA uint8.

    Bit-exact vs ops/yuv_jax.batch_yuv_to_rgba (fancy upsampling).
    Requires H % 16 == 0 and even W (MB-padded decoder planes satisfy
    both); crop the result to the visible window as usual.
    """
    if interpret is None:
        interpret = (jax.default_backend() != "tpu"
                     or os.environ.get("GOWEBP_PALLAS") != "1")
    B, H, W = y.shape
    if H % 16 or W % 2 or u.shape[-1] != W // 2:
        raise ValueError("needs H%16==0, even W, half-size chroma")
    W2 = W // 2
    y = y.astype(jnp.int32)
    u = u.astype(jnp.int32)
    v = v.astype(jnp.int32)
    if alpha is None:
        alpha = jnp.full((B, H, W), 255, jnp.int32)
    else:
        alpha = alpha.astype(jnp.int32)

    ye, yo = y[:, :, 0::2], y[:, :, 1::2]
    ae, ao = alpha[:, :, 0::2], alpha[:, :, 1::2]
    nb = H // 16

    def yband(_):
        return pl.BlockSpec((1, 16, W2), lambda b, i: (b, i, 0),
                            memory_space=pltpu.VMEM)

    def cband(off):
        if off < 0:
            idx = lambda b, i: (b, jnp.maximum(i - 1, 0), 0)
        elif off > 0:
            idx = lambda b, i: (b, jnp.minimum(i + 1, nb - 1), 0)
        else:
            idx = lambda b, i: (b, i, 0)
        return pl.BlockSpec((1, 8, W2), idx, memory_space=pltpu.VMEM)

    oute, outo = pl.pallas_call(
        _post_kernel,
        grid=(B, nb),
        in_specs=[
            yband(0), yband(0),
            cband(-1), cband(0), cband(+1),
            cband(-1), cband(0), cband(+1),
            yband(0), yband(0),
        ],
        out_specs=[yband(0), yband(0)],
        out_shape=[jax.ShapeDtypeStruct((B, H, W2), jnp.int32)] * 2,
        interpret=interpret,
    )(ye, yo, u, u, u, v, v, v, ae, ao)

    packed = jnp.stack([oute, outo], axis=-1).reshape(B, H, W)
    return jax.lax.bitcast_convert_type(packed, jnp.uint8)


__all__ = ["yuv420_to_rgba_pallas"]
