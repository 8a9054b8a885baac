"""Exact closed-loop VP8 dense encode on TPU via wavefront scheduling.

The i16 encoder's only sequential dependency is the reconstruction
context: MB (x, y) needs the reconstructed bottom row of (x, y-1) and
right column of (x-1, y).  MBs on an anti-diagonal d = x + 2*y are
mutually independent, so the frame encodes in mb_w + 2*mb_h - 1 steps,
each processing a whole diagonal (× the image batch) at once.

This produces *identical* levels/modes to the sequential host encoder
(wtpu_vp8_encode_frame with try_i4=0) — same feedback, same integer
math — while scaling over batch × diagonal on the MXU/VPU.

SURVEY.md §7 "hard parts #2": the diagonal-wavefront answer.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import dct_jax


def _gather_blocks(plane, my, mx, size):
    """plane (B, Hp, Wp) → (B, L, size, size) blocks at MB (my, mx)."""
    rows = my[:, None] * size + jnp.arange(size)[None, :]        # (L, size)
    cols = mx[:, None] * size + jnp.arange(size)[None, :]
    return plane[:, rows[:, :, None], cols[:, None, :]]


def _scatter_blocks(plane, my, mx, size, blocks):
    rows = my[:, None] * size + jnp.arange(size)[None, :]
    cols = mx[:, None] * size + jnp.arange(size)[None, :]
    return plane.at[:, rows[:, :, None], cols[:, None, :]].set(blocks)


def _context(plane, my, mx, size, mh, mw):
    """Top row / left col / top-left for MBs (my, mx) with 127/129 edges.

    plane is the *reconstruction* plane (padded with one scratch MB row).
    Returns (top (B,L,size), left (B,L,size), tl (B,L)).
    """
    B = plane.shape[0]
    L = my.shape[0]
    have_top = my > 0
    have_left = mx > 0

    trow = jnp.maximum(my * size - 1, 0)
    tcols = mx[:, None] * size + jnp.arange(size)[None, :]
    top = plane[:, trow[:, None], tcols]                      # (B, L, size)
    top = jnp.where(have_top[None, :, None], top, 127)

    lcol = jnp.maximum(mx * size - 1, 0)
    lrows = my[:, None] * size + jnp.arange(size)[None, :]
    left = plane[:, lrows, lcol[:, None]]
    left = jnp.where(have_left[None, :, None], left, 129)

    tl = plane[:, trow, lcol]
    tl = jnp.where(
        have_top[None, :],
        jnp.where(have_left[None, :], tl, 129),
        127,
    )
    return top, left, tl


def _predict4_blocks(top, left, tl, have_top, have_left, size):
    """(B,L,size) contexts → (4, B, L, size, size) predictions."""
    shift = 5 if size == 16 else 4
    sum_top = top.sum(axis=-1)
    sum_left = left.sum(axis=-1)
    dc_both = (sum_top + sum_left + size) >> shift
    dc_left = (sum_left + size // 2) >> (shift - 1)
    dc_top = (sum_top + size // 2) >> (shift - 1)
    ht = have_top[None, :]
    hl = have_left[None, :]
    dc = jnp.where(
        ht & hl, dc_both,
        jnp.where(hl, dc_left, jnp.where(ht, dc_top, 0x80)),
    )
    shape = top.shape[:2] + (size, size)
    pred_dc = jnp.broadcast_to(dc[..., None, None], shape)
    pred_tm = jnp.clip(
        left[..., :, None] + top[..., None, :] - tl[..., None, None], 0, 255
    )
    pred_ve = jnp.broadcast_to(top[..., None, :], shape)
    pred_he = jnp.broadcast_to(left[..., :, None], shape)
    return jnp.stack([pred_dc, pred_tm, pred_ve, pred_he])


def _encode_luma_diag(src_blocks, pred4, qp):
    """(B,L,16,16) src + (4,B,L,16,16) preds → levels/modes/recon."""
    diff = src_blocks[None].astype(jnp.int32) - pred4.astype(jnp.int32)
    sse = (diff * diff).sum(axis=(-1, -2))
    mode = jnp.argmin(sse, axis=0)                      # (B, L)
    pred = jnp.take_along_axis(pred4, mode[None, ..., None, None], axis=0)[0]
    res = src_blocks.astype(jnp.int32) - pred.astype(jnp.int32)
    B, L = res.shape[:2]
    blk = res.reshape(B, L, 4, 4, 4, 4).transpose(0, 1, 2, 4, 3, 5)
    coeffs = dct_jax.fdct4x4(blk)                       # (B,L,4,4,4,4)
    dcs = coeffs[..., 0, 0]
    y2 = dct_jax.fwht4x4(dcs)
    y2_levels = dct_jax.quantize(y2, qp["y2_dc_iq"], 96 << 9,
                                 qp["y2_ac_iq"], 96 << 9)
    y_levels = dct_jax.quantize(coeffs.reshape(B, L, 16, 4, 4),
                                qp["y1_dc_iq"], 96 << 9,
                                qp["y1_ac_iq"], 110 << 9, first_ac=True)
    # Reconstruction (decoder mirror).
    y2_deq = dct_jax.dequantize(y2_levels, qp["y2_dc"], qp["y2_ac"])
    y2_any_ac = (y2_levels[..., 1:] != 0).any(axis=-1)
    iwht = dct_jax.iwht4x4(y2_deq)
    dc_only = jnp.broadcast_to(
        ((y2_deq[..., 0, 0] + 3) >> 3)[..., None, None], iwht.shape
    )
    rdcs = jnp.where(y2_any_ac[..., None, None], iwht, dc_only)  # (B,L,4,4)
    deq = dct_jax.dequantize(y_levels, qp["y1_dc"], qp["y1_ac"])
    deq = deq.reshape(B, L, 4, 4, 4, 4)
    deq = deq.at[..., 0, 0].set(rdcs)
    pred_blk = pred.reshape(B, L, 4, 4, 4, 4).transpose(0, 1, 2, 4, 3, 5)
    recon_blk = dct_jax.idct_add_clip(deq, pred_blk)
    recon = recon_blk.transpose(0, 1, 2, 4, 3, 5).reshape(B, L, 16, 16)
    return y_levels, y2_levels, mode, recon


def _encode_chroma_diag(src_blocks, pred4, qp):
    """(2,B,L,8,8) U/V src + (4,2,B,L,8,8) preds → levels/mode/recons."""
    diff = src_blocks[None].astype(jnp.int32) - pred4.astype(jnp.int32)
    sse = (diff * diff).sum(axis=(1, -1, -2))           # over U+V, pixels
    mode = jnp.argmin(sse, axis=0)                      # (B, L)
    pred = jnp.take_along_axis(
        pred4, mode[None, None, ..., None, None], axis=0
    )[0]
    res = src_blocks.astype(jnp.int32) - pred.astype(jnp.int32)
    C, B, L = res.shape[:3]
    blk = res.reshape(C, B, L, 2, 4, 2, 4).transpose(0, 1, 2, 3, 5, 4, 6)
    coeffs = dct_jax.fdct4x4(blk)                       # (2,B,L,2,2,4,4)
    levels = dct_jax.quantize(coeffs.reshape(C, B, L, 4, 4, 4),
                              qp["uv_dc_iq"], 110 << 9,
                              qp["uv_ac_iq"], 110 << 9)
    deq = dct_jax.dequantize(levels, qp["uv_dc"], qp["uv_ac"])
    deq = deq.reshape(C, B, L, 2, 2, 4, 4)
    pred_blk = pred.reshape(C, B, L, 2, 4, 2, 4).transpose(0, 1, 2, 3, 5, 4, 6)
    recon_blk = dct_jax.idct_add_clip(deq, pred_blk)
    recon = recon_blk.transpose(0, 1, 2, 3, 5, 4, 6).reshape(C, B, L, 8, 8)
    return levels, mode, recon


@partial(jax.jit, static_argnames=("y1_dc", "y1_ac", "y2_dc", "y2_ac",
                                   "uv_dc", "uv_ac"))
def encode_wavefront(y, u, v, *, y1_dc, y1_ac, y2_dc, y2_ac, uv_dc, uv_ac):
    """Exact closed-loop batched dense encode (i16).

    y: (B, H16, W16) int32; u, v: (B, H16//2, W16//2) int32.
    Returns the same per-MB tensor dict as encode_plane_step, with
    outputs identical to the sequential host encoder.
    """
    B, H, W = y.shape
    mh, mw = H // 16, W // 16
    Lmax = min(mh, (mw + 1) // 2 + 1)

    qp = {
        "y1_dc": y1_dc, "y1_ac": y1_ac,
        "y2_dc": y2_dc, "y2_ac": y2_ac,
        "uv_dc": uv_dc, "uv_ac": uv_ac,
        "y1_dc_iq": (1 << 17) // y1_dc, "y1_ac_iq": (1 << 17) // y1_ac,
        "y2_dc_iq": (1 << 17) // y2_dc, "y2_ac_iq": (1 << 17) // y2_ac,
        "uv_dc_iq": (1 << 17) // uv_dc, "uv_ac_iq": (1 << 17) // uv_ac,
    }

    # Recon planes padded with one scratch MB row (invalid lanes park there).
    Yr = jnp.zeros((B, H + 16, W), jnp.int32)
    Ur = jnp.zeros((B, H // 2 + 8, W // 2), jnp.int32)
    Vr = jnp.zeros_like(Ur)
    # Outputs padded with a scratch MB row too.
    y_levels = jnp.zeros((B, mh + 1, mw, 16, 16), jnp.int32)
    y2_levels = jnp.zeros((B, mh + 1, mw, 16), jnp.int32)
    uv_levels = jnp.zeros((B, mh + 1, mw, 8, 16), jnp.int32)
    ymode = jnp.zeros((B, mh + 1, mw), jnp.int32)
    uvmode = jnp.zeros((B, mh + 1, mw), jnp.int32)

    n_steps = mw + 2 * mh - 2 + 1

    def step(d, state):
        Yr, Ur, Vr, y_levels, y2_levels, uv_levels, ymode, uvmode = state
        # First possibly-valid row index on this diagonal.
        k0 = jnp.maximum(0, (d - mw + 2) // 2)
        my = k0 + jnp.arange(Lmax)
        mx = d - 2 * my
        valid = (mx >= 0) & (mx < mw) & (my < mh)
        mxc = jnp.clip(mx, 0, mw - 1)
        # Invalid lanes write into the scratch MB row (my = mh).
        mys = jnp.where(valid, my, mh)
        myc = jnp.clip(my, 0, mh - 1)

        have_top = my > 0
        have_left = mxc > 0

        # ---- luma ----
        src = _gather_blocks(y, myc, mxc, 16)
        top, left, tl = _context(Yr, myc, mxc, 16, mh, mw)
        pred4 = _predict4_blocks(top, left, tl, have_top, have_left, 16)
        yl, y2l, ym, recon = _encode_luma_diag(src, pred4, qp)
        Yr = _scatter_blocks(Yr, mys, mxc, 16, recon)

        # ---- chroma ----
        usrc = _gather_blocks(u, myc, mxc, 8)
        vsrc = _gather_blocks(v, myc, mxc, 8)
        utop, uleft, utl = _context(Ur, myc, mxc, 8, mh, mw)
        vtop, vleft, vtl = _context(Vr, myc, mxc, 8, mh, mw)
        updd = _predict4_blocks(utop, uleft, utl, have_top, have_left, 8)
        vpdd = _predict4_blocks(vtop, vleft, vtl, have_top, have_left, 8)
        uvl, uvm, crecon = _encode_chroma_diag(
            jnp.stack([usrc, vsrc]), jnp.stack([updd, vpdd], axis=1), qp
        )
        Ur = _scatter_blocks(Ur, mys, mxc, 8, crecon[0])
        Vr = _scatter_blocks(Vr, mys, mxc, 8, crecon[1])

        # ---- store outputs (scratch row absorbs invalid lanes) ----
        y_levels = y_levels.at[:, mys, mxc].set(yl)
        y2_levels = y2_levels.at[:, mys, mxc].set(y2l)
        uv_levels = uv_levels.at[:, mys, mxc].set(
            uvl.transpose(1, 2, 0, 3, 4).reshape(B, Lmax, 8, 16)
        )
        ymode = ymode.at[:, mys, mxc].set(ym)
        uvmode = uvmode.at[:, mys, mxc].set(uvm)
        return (Yr, Ur, Vr, y_levels, y2_levels, uv_levels, ymode, uvmode)

    state = (Yr, Ur, Vr, y_levels, y2_levels, uv_levels, ymode, uvmode)
    state = jax.lax.fori_loop(0, n_steps, step, state)
    _, _, _, y_levels, y2_levels, uv_levels, ymode, uvmode = state
    # Narrow dtypes on-device: levels fit int16, modes fit uint8 —
    # halves the device→host transfer for the batch pipeline.
    return {
        "ymode": ymode[:, :mh].astype(jnp.uint8),
        "uvmode": uvmode[:, :mh].astype(jnp.uint8),
        "y_levels": y_levels[:, :mh].astype(jnp.int16),
        "y2_levels": y2_levels[:, :mh].astype(jnp.int16),
        "uv_levels": uv_levels[:, :mh].astype(jnp.int16),
    }


__all__ = ["encode_wavefront"]
