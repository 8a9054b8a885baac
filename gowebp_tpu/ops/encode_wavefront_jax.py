"""Exact closed-loop VP8 dense encode on TPU via wavefront scheduling.

The encoder's only sequential dependency is the reconstruction context:
MB (x, y) needs the reconstructed bottom row of (x, y-1), right column
of (x-1, y), and 4 bottom pixels of (x+1, y-1).  MBs on an
anti-diagonal t = 2*y + x are mutually independent, so a frame encodes
in mb_w + 2*mb_h - 2 + 1 steps, each processing a whole diagonal (× the
image batch) at once.

Like the decode engine (vp8_recon_jax), the planes live in a **skewed
tile layout** during the wavefront: tile (my, mx) sits at column
2*my + mx (+3 lead padding for the recon state) of a
(B, mb_h, T+3, s, s) array, so one anti-diagonal is one column and
every per-step access is a lax.dynamic_slice / dynamic_update_slice of
adjacent columns — no gather/scatter in the hot loop.

Mode search is bit-identical to the sequential host encoder
(wtpu_vp8_encode_frame in entropy/native/vp8_dec.cpp):

- i16: SSE argmin over the 4 whole-MB modes, then FDCT/FWHT/quant and
  decoder-mirror reconstruction;
- i4 (``try_i4``): the 16 sub-blocks scanned in raster order by an
  inner fori_loop, each picking among all 10 B-modes by
  dist + (λ·(token_rate + mode_bits)) >> 16 with the exact
  token-grammar rate model (ops/rate_jax), the winner's reconstruction
  feeding the next sub-block; the MB adopts i4 iff Σ sub-block scores
  beat the i16 score under the same objective;
- per-MB segment quantizers via a (4, 6) table + segment-id map.

Feature parity target: /root/reference/pkg/libwebp/enc/quant_enc.c.go
PickBestIntra16/PickBestIntra4 (:840-998) re-designed as a batched
diagonal tensor program.  SURVEY.md §7 "hard parts #2".

Cost arithmetic note: scores are int32 with an exact split-limb
(λ·rate)>>16 (λ < 2^19 by construction); this matches the native
encoder's int64 math for any rate below ~2^26 1/256-bits per block
(≥ 32 KB/MB — unreachable).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from . import dct_jax
from .rate_jax import block_rate256
from .vp8_recon_jax import (
    _clip8,
    _pred_luma4_all,
    _shift_down,
    _skew_index,
    _switch,
    _unskew_plane,
    num_diagonals,
)

I32 = jnp.int32

# Unroll the 16-sub-block Gauss-Seidel loops at trace time: the loop
# bodies are tiny (a few-KB working set per step), so the sequential
# while-loop bookkeeping dominates; unrolling lets XLA fuse across
# sub-blocks.  Env-gated while being evaluated on real hardware.
import os as _os

_UNROLL_SUB = _os.environ.get("GOWEBP_UNROLL_SUB", "0") == "1"

# 1/256-bit header-cost estimates of the 10 kf bmode symbols (must match
# kMode4Bits256 in entropy/native/vp8_dec.cpp).  NumPy so it embeds as
# an HLO literal instead of a per-launch-uploaded jit const.
import numpy as _np

_MODE4_BITS256 = _np.array(
    [256, 704, 768, 768, 960, 1024, 960, 1024, 1024, 960], _np.int32)

_BIAS = {  # b8 << 9 quantizer bias per coefficient class
    "y1_dc": 96 << 9, "y1_ac": 110 << 9,
    "y2_dc": 96 << 9, "y2_ac": 96 << 9,
    "uv_dc": 110 << 9, "uv_ac": 110 << 9,
}


def _predict4_blocks(top, left, tl, have_top, have_left, size):
    """(B,L,size) contexts → (4, B, L, size, size) DC/TM/VE/HE preds."""
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


def _quant_lanes(coeffs, iq_dc, iq_ac, bias_dc, bias_ac, first_ac=False):
    """Per-lane quantize: coeffs (..., 4, 4) raster → (..., 16) zigzag.

    iq_dc/iq_ac broadcastable to coeffs.shape[:-2]; biases static ints.
    """
    flat = coeffs.reshape(coeffs.shape[:-2] + (16,))
    zz = dct_jax.zigzag_fwd(flat)
    pos0 = jnp.arange(16) == 0
    iq = jnp.where(pos0, iq_dc[..., None], iq_ac[..., None])
    bias = jnp.where(pos0, bias_dc, bias_ac)
    sign = zz < 0
    level = jnp.minimum((jnp.abs(zz) * iq + bias) >> 17, 2047)
    if first_ac:
        level = level.at[..., 0].set(0)
    return jnp.where(sign, -level, level)


def _dequant_lanes(levels, q_dc, q_ac):
    """(..., 16) zigzag levels → (..., 4, 4) raster, per-lane q."""
    pos0 = jnp.arange(16) == 0
    q = jnp.where(pos0, q_dc[..., None], q_ac[..., None])
    deq = levels.astype(I32) * q
    raster = dct_jax.zigzag_inv(deq)
    return raster.reshape(levels.shape[:-1] + (4, 4))




def _mul_shr16(lamq, rate):
    """Exact (lamq * rate) >> 16 in int32 for 0 ≤ lamq < 2^19.

    Works for static ints AND traced arrays (the per-segment lambda is
    a traced (B, lanes) tensor): every partial product stays < 2^30 —
    lamq*rh < 2^19·2^10, lh*rl < 2^11·2^16, ll*rl < 2^24.
    """
    lh, ll = lamq >> 8, lamq & 0xFF
    rh = rate >> 16
    rl = rate & 0xFFFF
    low = (lh * rl + ((ll * rl) >> 8)) >> 8          # == (lamq*rl)>>16
    return lamq * rh + low


def _pen_lanes(i4_penalty, seg, B):
    """Per-segment penalty → per-MB lambda lanes (same shape as seg).

    Accepts a static int (broadcast to every segment) or a (4,) /
    (B, 4) array of per-segment lambdas.
    """
    pen = jnp.asarray(i4_penalty, I32)
    if pen.ndim == 0:
        return jnp.broadcast_to(pen, seg.shape)
    pen = jnp.broadcast_to(pen.reshape(-1, 4)[-1:] if pen.ndim == 1 else pen,
                           (B, 4))
    return _switch(seg, [pen[:, k][:, None] for k in range(4)], 0)


def _sse(a, b, axes):
    d = a.astype(I32) - b.astype(I32)
    return (d * d).sum(axis=axes)


def _unskew_tiles(O, mb_w, mb_h):
    """(B, mb_h, T, ...) skewed outputs → (B, mb_h, mb_w, ...)."""
    my = jnp.arange(mb_h, dtype=I32)[:, None]
    mx = jnp.arange(mb_w, dtype=I32)[None, :]
    return O[:, my, 2 * my + mx]


def _skew_tiles(plane, mb_w, mb_h, size):
    """(B, H, W) plane → (B, mb_h, T, size, size) skewed source tiles."""
    B = plane.shape[0]
    tiles = plane.reshape(B, mb_h, size, mb_w, size).transpose(0, 1, 3, 2, 4)
    flat, _ = _skew_index(mb_w, mb_h)
    my = jnp.arange(mb_h, dtype=I32)[:, None]
    mx = jnp.clip(jnp.arange(num_diagonals(mb_w, mb_h), dtype=I32)[None, :]
                  - 2 * my, 0, mb_w - 1)
    return tiles[:, my, mx]


# Route the hybrid cold-start i4 search through the fused Pallas kernel
# (ops/pallas/i4_search.py).  "1" = compiled (pods with native Mosaic —
# NEVER on the dev tunnel, see the wedge hazard in the verify skill);
# "interpret" = the interpret-mode path (wiring tests).
_PALLAS_I4 = _os.environ.get("GOWEBP_PALLAS_I4", "0")

# Route the hybrid engine's phase 2 (fixed-mode wavefront) through the
# fully fused Pallas wavefront kernel (ops/pallas/wavefront_fixed.py)
# — the measured 10x-per-chip route for the dispatch-bound step bodies.
# Same gating semantics as _PALLAS_I4.
_PALLAS_WF = _os.environ.get("GOWEBP_PALLAS_WF", "0")


def _i4_search_parallel_pallas(tl, top4, tr4, left4, src4, seg, pen_n,
                               qs6, iqs6, tables, B, mh, mw, sh, sw):
    """Adapter: plane contexts → the fused Pallas kernel's layouts."""
    from .pallas.i4_search import i4_search_pallas

    N = mh * mw
    S = sh * sw
    ctx13 = jnp.concatenate(
        [tl[:, None, :], top4.transpose(0, 2, 1), tr4.transpose(0, 2, 1),
         left4.transpose(0, 2, 1)], axis=1)              # (B, 13, S)
    ctx13 = ctx13.transpose(1, 0, 2).reshape(13, B * S)
    src16 = src4.reshape(B, S, 16).transpose(2, 0, 1).reshape(16, B * S)
    seg_sb = jnp.repeat(jnp.repeat(
        seg.reshape(B, mh, mw), 4, axis=1), 4, axis=2).reshape(B, S)
    iq_dc = _switch(seg_sb, [iqs6[:, k, 0][:, None] for k in range(4)], 0)
    iq_ac = _switch(seg_sb, [iqs6[:, k, 1][:, None] for k in range(4)], 0)
    q_dc = _switch(seg_sb, [qs6[:, k, 0][:, None] for k in range(4)], 0)
    q_ac = _switch(seg_sb, [qs6[:, k, 1][:, None] for k in range(4)], 0)
    pen_sb = jnp.repeat(jnp.repeat(
        pen_n.reshape(B, mh, mw), 4, axis=1), 4, axis=2).reshape(B, S)
    quants5 = jnp.stack([iq_dc, iq_ac, q_dc, q_ac, pen_sb]).reshape(
        5, B * S)
    bmode, bcost = i4_search_pallas(
        ctx13, src16, quants5, tables, interpret=_PALLAS_I4 != "1")
    bmode = bmode.reshape(B, S)
    bcost = bcost.reshape(B, S)
    bm = bmode.reshape(B, sh, sw).reshape(B, mh, 4, mw, 4).transpose(
        0, 1, 3, 2, 4).reshape(B, N, 16)
    bc = bcost.reshape(B, sh, sw).reshape(B, mh, 4, mw, 4).transpose(
        0, 1, 3, 2, 4).reshape(B, N, 16)
    return bm, bc.sum(axis=-1)


def _topk_onehot(score, k: int):
    """(..., C) scores → (..., k, C) f32 one-hot rows of the k smallest.

    Iterative masked argmin re-expressed as compare/cumsum (ties break
    to the lowest index) — no gathers, and the downstream candidate
    selection contracts these rows as small matmuls, so TPU never sees
    a dynamic index.
    """
    s = score.astype(jnp.float32)
    hots = []
    for _ in range(k):
        m = s.min(axis=-1, keepdims=True)
        hit = s == m
        first = (jnp.cumsum(hit, axis=-1) == 1) & hit
        hots.append(first.astype(jnp.float32))
        s = jnp.where(first, jnp.inf, s)
    return jnp.stack(hots, axis=-2)


def _i4_candidates(preds, src4_b, i4_topk):
    """All-10 candidate preds → (cand_preds, mode_ids, mode_bits).

    With ``i4_topk`` set, pre-ranks the 10 B-modes by prediction-domain
    SSE and keeps only the top k for the expensive DCT/quant/rate
    pipeline (the RD winner is almost always among the best-predicting
    modes; the quality gates hold at k=4 while the search cost drops
    ~2.5x).  preds: (..., 10, 4, 4); src4_b broadcastable to it.
    """
    lead = preds.shape[:-3]
    if not i4_topk:
        ids = jnp.broadcast_to(jnp.arange(10, dtype=I32), lead + (10,))
        bits = jnp.broadcast_to(jnp.asarray(_MODE4_BITS256), lead + (10,))
        return preds, ids, bits
    pdist = _sse(src4_b, preds, (-1, -2))                # (..., 10)
    sel = _topk_onehot(pdist, i4_topk)                   # (..., k, 10)
    pf = preds.reshape(lead + (10, 16)).astype(jnp.float32)
    cand = jnp.einsum("...kc,...cp->...kp", sel, pf).astype(I32)
    cand = cand.reshape(lead + (i4_topk, 4, 4))
    ids = jnp.einsum("...kc,c->...k", sel,
                     _np.arange(10, dtype=_np.float32)).astype(I32)
    bits = jnp.einsum("...kc,c->...k", sel,
                      _MODE4_BITS256.astype(_np.float32)).astype(I32)
    return cand, ids, bits


def _i4_search_parallel(y, cy, seg, pen_n, qs6, iqs6, tables,
                        B, mh, mw, i4_topk=None):
    """Fully parallel i4 sub-block search from PLANE context.

    The Gauss-Seidel 16-substep loop exists to feed each sub-block its
    within-MB reconstruction context; in the hybrid engine's phase 1
    that context is approximate anyway (source pixels on the cold
    round, the previous round's true recon on refinement), so reading
    it straight from the context plane makes every sub-block of every
    MB independent — one dense evaluation instead of 16 sequential
    substeps.  Decisions converge under refinement exactly like the
    sequential variant (the closed-loop fixed point is unchanged);
    phase 2 re-quantizes with true decoder feedback either way.

    Returns (bmodes (B, N, 16) i32, s4 (B, N) i32 summed RD score).
    """
    H, W = y.shape[1:]
    sh, sw = H // 4, W // 4                 # sub-block grid
    N = mh * mw

    cpad = jnp.pad(cy, ((0, 0), (4, 0), (4, 4)), mode="edge")
    # contexts per sub-block (B, sh, sw, k)
    rows_above = cpad[:, 3::4, :][:, :sh]               # rows 4sy-1 (padded)
    top4 = rows_above[:, :, 4:4 + W].reshape(B, sh, sw, 4)
    tl = rows_above[:, :, 3:3 + W:4].reshape(B, sh, sw)
    tr_in = rows_above[:, :, 8:8 + W].reshape(B, sh, sw, 4)
    # MB-right-edge TR rule: sub-blocks with gx==3 use the MB's tr4 —
    # the 4 pixels right of the MB in the row ABOVE THE MB (replicated
    # from that row's last pixel for the last MB column, 127 for the
    # top MB row — the wavefront's exact conventions).
    mb_rows_above = cpad[:, 3::16, :][:, :mh]           # rows 16my-1
    mb_tr4 = mb_rows_above[:, :, 20:20 + W]
    # padded col c maps to original c-4, so original W-1 sits at 4+W-1
    mb_tr4 = jnp.concatenate(
        [mb_tr4[:, :, :16 * (mw - 1)],
         jnp.broadcast_to(mb_rows_above[:, :, 4 + W - 1:4 + W],
                          (B, mh, 16))], axis=2)
    mb_tr4 = mb_tr4.reshape(B, mh, mw, 16)[..., :4]     # (B, mh, mw, 4)
    mb_tr4 = jnp.where((jnp.arange(mh) == 0)[None, :, None, None],
                       127, mb_tr4)
    gx3 = (jnp.arange(sw) & 3) == 3
    tr = jnp.where(
        gx3[None, None, :, None],
        jnp.repeat(jnp.repeat(mb_tr4, 4, axis=1), 4, axis=2),
        tr_in)
    left4 = jnp.pad(cy, ((0, 0), (0, 0), (4, 0)), mode="edge")[
        :, :, 3:3 + W:4]                                 # (B, H, sw) cols 4sx-1
    left4 = left4.reshape(B, sh, 4, sw).transpose(0, 1, 3, 2)  # (B,sh,sw,4)

    # image-border conventions (match the wavefront edge rules)
    sy = jnp.arange(sh)[None, :, None]
    sx = jnp.arange(sw)[None, None, :]
    at_top = sy == 0
    at_left = sx == 0
    top4 = jnp.where(at_top[..., None], 127, top4)
    tr = jnp.where(at_top[..., None], 127, tr)
    left4 = jnp.where(at_left[..., None], 129, left4)
    # wavefront rule: top row → 127 (corner included), else col 0 → 129
    tl = jnp.where(at_top, 127, jnp.where(at_left, 129, tl))

    flat = lambda a: a.reshape((B, sh * sw) + a.shape[3:])
    src4 = y.reshape(B, sh, 4, sw, 4).transpose(0, 1, 3, 2, 4).reshape(
        B, sh * sw, 4, 4)

    if _PALLAS_I4 != "0":
        # Fused Pallas core (pods with native Mosaic; see
        # ops/pallas/i4_search.py — this tunnel can't compile it).
        return _i4_search_parallel_pallas(
            flat(tl), flat(top4), flat(tr), flat(left4), src4,
            seg, pen_n, qs6, iqs6, tables, B, mh, mw, sh, sw)

    preds = _pred_luma4_all(flat(tl), flat(top4), flat(tr), flat(left4))
    preds, mode_ids, mode_bits = _i4_candidates(
        preds, src4[:, :, None], i4_topk)
    res4 = src4[:, :, None].astype(I32) - preds
    cf = dct_jax.fdct4x4(res4)
    # per-sub-block quant lanes: the MB's segment
    seg_sb = jnp.repeat(jnp.repeat(
        seg.reshape(B, mh, mw), 4, axis=1), 4, axis=2).reshape(B, sh * sw)
    iq_dc = _switch(seg_sb, [iqs6[:, k, 0][:, None] for k in range(4)], 0)
    iq_ac = _switch(seg_sb, [iqs6[:, k, 1][:, None] for k in range(4)], 0)
    q_dc = _switch(seg_sb, [qs6[:, k, 0][:, None] for k in range(4)], 0)
    q_ac = _switch(seg_sb, [qs6[:, k, 1][:, None] for k in range(4)], 0)
    lv = _quant_lanes(cf, iq_dc[..., None], iq_ac[..., None],
                      _BIAS["y1_dc"], _BIAS["y1_ac"])
    dq = _dequant_lanes(lv, q_dc[..., None], q_ac[..., None])
    rec = dct_jax.idct_add_clip(dq, preds)
    dist = _sse(src4[:, :, None], rec, (-1, -2))
    rate = block_rate256(lv, tables, type=3, first=0, ctx0=1)
    pen_sb = jnp.repeat(jnp.repeat(
        pen_n.reshape(B, mh, mw), 4, axis=1), 4, axis=2).reshape(
        B, sh * sw)
    cost = dist + _mul_shr16(pen_sb[..., None], rate + mode_bits)
    kidx = jnp.argmin(cost, axis=-1)                    # (B, sh*sw)
    khot = jax.nn.one_hot(kidx, cost.shape[-1], dtype=jnp.float32)
    bmode = jnp.einsum("...k,...k->...", khot,
                       mode_ids.astype(jnp.float32)).astype(I32)
    bcost = cost.min(axis=-1)
    # regroup sub-blocks to (B, N, 16) in the MB's raster order
    bm = bmode.reshape(B, sh, sw).reshape(B, mh, 4, mw, 4).transpose(
        0, 1, 3, 2, 4).reshape(B, N, 16)
    bc = bcost.reshape(B, sh, sw).reshape(B, mh, 4, mw, 4).transpose(
        0, 1, 3, 2, 4).reshape(B, N, 16)
    return bm, bc.sum(axis=-1)


def openloop_mode_search(y, u, v, seg_map, qsteps, tables, *,
                         try_i4: bool, i4_penalty: int = 0, ctx=None,
                         i4_parallel: bool = False, i4_topk=None):
    """Fully parallel mode search with SOURCE-pixel prediction context.

    ``ctx`` (refinement passes): a (y_rec, u_rec, v_rec) tuple of
    reconstruction planes from a previous fixed-mode wavefront pass.
    Prediction context then comes from the actual reconstruction (the
    closed-loop encoder's context, up to not-yet-converged mode flips)
    while distortion stays against the source — bringing the parallel
    decisions within a whisker of the sequential search's.

    The hybrid engine's phase 1: every decision the exact wavefront
    makes (i16 mode, per-block i4 modes, i4-vs-i16 adoption, uv mode)
    is evaluated for all MBs of all images at once, substituting the
    source plane for the not-yet-available reconstruction.  At normal
    qualities recon ≈ source, so the decisions match the closed-loop
    search almost everywhere; the levels themselves are then produced
    by the exact fixed-mode wavefront (phase 2), so the output stream
    has zero prediction drift regardless.

    Returns dense (B, mh, mw[, 16]) int32 ymode/uvmode/is_i4/imodes.
    """
    B, H, W = y.shape
    mh, mw = H // 16, W // 16
    N = mh * mw
    cy, cu, cv = ctx if ctx is not None else (y, u, v)
    # refinement ctx arrives as uint8 recon planes; all the context
    # math (DC sums, TM clamps) needs int32
    cy, cu, cv = (c.astype(I32) for c in (cy, cu, cv))

    qs = qsteps.astype(I32)
    iqs = (1 << 17) // jnp.maximum(qs, 1)
    seg = seg_map.reshape(B, N)
    qlane = _switch(seg, [qs[:, k][:, None] for k in range(4)], 1)
    iqlane = _switch(seg, [iqs[:, k][:, None] for k in range(4)], 1)
    lane = lambda k: iqlane[..., k]
    qv = lambda k: qlane[..., k]

    # ---- MB-level context (exact engine edge conventions) ----
    yt = y.reshape(B, mh, 16, mw, 16).transpose(0, 1, 3, 2, 4)
    src = yt.reshape(B, N, 16, 16)
    myv = jnp.repeat(jnp.arange(mh, dtype=I32), mw)     # (N,)
    mxv = jnp.tile(jnp.arange(mw, dtype=I32), mh)
    htv = (myv > 0)[None, :]
    hlv = (mxv > 0)[None, :]
    lastv = (mxv == mw - 1)[None, :]

    # row_above[b, my] = context row 16*my-1 (row 0's copy for my=0 is
    # masked off below), extended 4 px right by edge replication.
    row_above = jnp.pad(cy, ((0, 0), (16, 0), (0, 4)), mode="edge")[
        :, 15::16][:, :mh]                              # (B, mh, W+4)
    top16 = row_above[:, :, :W].reshape(B, mh, mw, 16).reshape(B, N, 16)
    top16 = jnp.where(htv[..., None], top16, 127)
    # tr4 for MB column mx = row_above cols 16(mx+1)..16(mx+1)+3; slice
    # and reshape instead of a gather (the last column's slot holds
    # padding, overridden by the ``lastv`` select below).
    tr4 = jnp.pad(row_above[:, :, 16:W + 4],
                  ((0, 0), (0, 0), (0, 12)))            # (B, mh, 16*mw)
    tr4 = tr4.reshape(B, mh, mw, 16)[..., :4].reshape(B, N, 4)
    tr4 = jnp.where(lastv[..., None], top16[:, :, 15:16], tr4)
    tr4 = jnp.where(htv[..., None], tr4, 127)
    col_left = jnp.pad(cy, ((0, 0), (0, 0), (16, 0)))[:, :, 15::16][:, :, :mw]
    left16 = col_left.reshape(B, mh, 16, mw).transpose(0, 1, 3, 2).reshape(
        B, N, 16)
    left16 = jnp.where(hlv[..., None], left16, 129)
    tl_src = jnp.pad(cy, ((0, 0), (16, 0), (16, 0)))[
        :, 15::16, 15::16][:, :mh, :mw]
    tlpx = tl_src.reshape(B, N)
    tlpx = jnp.where(htv, jnp.where(hlv, tlpx, 129), 127)

    # ---- i16 candidate (identical math to the wavefront step) ----
    ht1, hl1 = htv[0], hlv[0]
    pred4 = _predict4_blocks(top16, left16, tlpx, ht1, hl1, 16)
    sse = _sse(src[None], pred4, (-1, -2))
    ymode = jnp.argmin(sse, axis=0).astype(I32)         # (B, N)
    pred = _switch(ymode, [pred4[k] for k in range(4)], 2)
    res = src.astype(I32) - pred.astype(I32)
    blk = res.reshape(B, N, 4, 4, 4, 4).transpose(0, 1, 2, 4, 3, 5)
    coeffs = dct_jax.fdct4x4(blk)
    y2 = dct_jax.fwht4x4(coeffs[..., 0, 0])
    y2_levels = _quant_lanes(y2, lane(2), lane(3),
                             _BIAS["y2_dc"], _BIAS["y2_ac"])
    y_levels = _quant_lanes(
        coeffs.reshape(B, N, 16, 4, 4),
        lane(0)[..., None], lane(1)[..., None],
        _BIAS["y1_dc"], _BIAS["y1_ac"], first_ac=True)

    is4 = jnp.zeros((B, N), I32)
    imodes = jnp.broadcast_to(ymode[..., None], (B, N, 16))
    if try_i4:
        # Open-loop i16 reconstruction for the score's distortion term.
        y2_deq = _dequant_lanes(y2_levels, qv(2), qv(3))
        y2_any_ac = (y2_levels[..., 1:] != 0).any(axis=-1)
        iwht = dct_jax.iwht4x4(y2_deq)
        dc_only = jnp.broadcast_to(
            ((y2_deq[..., 0, 0] + 3) >> 3)[..., None, None], iwht.shape)
        rdcs = jnp.where(y2_any_ac[..., None, None], iwht, dc_only)
        deq = _dequant_lanes(y_levels, qv(0)[..., None], qv(1)[..., None])
        deq = deq.reshape(B, N, 4, 4, 4, 4).at[..., 0, 0].set(rdcs)
        pred_blk = pred.reshape(B, N, 4, 4, 4, 4).transpose(
            0, 1, 2, 4, 3, 5)
        recon_blk = dct_jax.idct_add_clip(deq, pred_blk)
        recon16 = recon_blk.transpose(0, 1, 2, 4, 3, 5).reshape(
            B, N, 16, 16)
        d16 = _sse(src, recon16, (-1, -2))
        rate16 = block_rate256(y2_levels, tables, type=1, first=0, ctx0=1)
        rate16 = rate16 + block_rate256(
            y_levels, tables, type=0, first=1, ctx0=1).sum(axis=-1)
        pen_n = _pen_lanes(i4_penalty, seg, B)         # (B, N)
        s16 = d16 + _mul_shr16(pen_n, rate16)

        # The exact engine's scr scratch, dense over every MB at once.
        # The MB-boundary rows/cols come from ``ctx`` (source on pass 0,
        # real recon on refinement passes); the interior is filled by
        # the 16-sub-block Gauss-Seidel loop below, so the within-MB
        # greedy search semantics match the sequential encoder exactly.
        scr = jnp.zeros((B, N, 17, 21), I32)
        scr = scr.at[:, :, 0, 0].set(tlpx)
        scr = scr.at[:, :, 0, 1:17].set(top16)
        scr = scr.at[:, :, 0, 17:21].set(tr4)
        scr = scr.at[:, :, 1:17, 0].set(left16)

        bmodes = jnp.zeros((B, N, 16), I32)
        s4 = jnp.zeros((B, N), I32)

        def sub(n, carry):
            scr, bmodes, s4 = carry
            gy, gx = n >> 2, n & 3
            r, c = 4 * gy, 4 * gx
            row = lax.dynamic_slice(scr, (0, 0, r, c), (B, N, 1, 9))
            tl = row[..., 0, 0]
            top = row[..., 0, 1:5]
            tr_in = row[..., 0, 5:9]
            tr = jnp.where(jnp.equal(gx, 3), scr[:, :, 0, 17:21], tr_in)
            left = lax.dynamic_slice(scr, (0, 0, r + 1, c),
                                     (B, N, 4, 1))[..., 0]
            src4 = lax.dynamic_slice_in_dim(
                lax.dynamic_slice_in_dim(src, r, 4, axis=2), c, 4, axis=3)
            preds = _pred_luma4_all(tl, top, tr, left)  # (B,N,10,4,4)
            preds, mode_ids, mode_bits = _i4_candidates(
                preds, src4[:, :, None], i4_topk)
            ncand = preds.shape[2]
            res4 = src4[:, :, None].astype(I32) - preds
            cf = dct_jax.fdct4x4(res4)
            lv = _quant_lanes(cf, lane(0)[..., None], lane(1)[..., None],
                              _BIAS["y1_dc"], _BIAS["y1_ac"])
            dq = _dequant_lanes(lv, qv(0)[..., None], qv(1)[..., None])
            rec = dct_jax.idct_add_clip(dq, preds)
            dist = _sse(src4[:, :, None], rec, (-1, -2))
            rate = block_rate256(lv, tables, type=3, first=0, ctx0=1)
            cost = dist + _mul_shr16(pen_n[..., None],
                                     rate + mode_bits)
            kidx = jnp.argmin(cost, axis=-1).astype(I32)   # (B, N)
            bmode = _switch(kidx, [mode_ids[:, :, k]
                                   for k in range(ncand)], 0)
            bcost = cost.min(axis=-1)
            brec = _switch(kidx, [rec[:, :, k] for k in range(ncand)], 2)
            scr = lax.dynamic_update_slice(scr, brec, (0, 0, r + 1, c + 1))
            bmodes = lax.dynamic_update_slice(
                bmodes, bmode[..., None], (0, 0, n))
            return scr, bmodes, s4 + bcost

        if i4_parallel:
            # fully parallel sub-block search from plane context (no
            # within-MB Gauss-Seidel) — phase-1 approximation only
            bmode, s4 = _i4_search_parallel(
                y, cy, seg, pen_n, qs, iqs, tables, B, mh, mw,
                i4_topk=i4_topk)
        else:
            scr, bmode, s4 = lax.fori_loop(0, 16, sub, (scr, bmodes, s4),
                                           unroll=True if _UNROLL_SUB else 1)
        adopt = s4 < s16
        is4 = adopt.astype(I32)
        imodes = jnp.where(adopt[..., None], bmode, imodes)

    # ---- chroma ----
    def cctx(p, cp):
        hh, hw = p.shape[1] // 8, p.shape[2] // 8
        n8 = hh * hw
        ra = jnp.pad(cp, ((0, 0), (8, 0), (0, 0)), mode="edge")[
            :, 7::8][:, :hh]
        t8 = ra.reshape(B, hh, hw, 8).reshape(B, n8, 8)
        t8 = jnp.where(htv[..., None], t8, 127)
        cl = jnp.pad(cp, ((0, 0), (0, 0), (8, 0)))[:, :, 7::8][:, :, :hw]
        l8 = cl.reshape(B, hh, 8, hw).transpose(0, 1, 3, 2).reshape(B, n8, 8)
        l8 = jnp.where(hlv[..., None], l8, 129)
        tl8 = jnp.pad(cp, ((0, 0), (8, 0), (8, 0)))[
            :, 7::8, 7::8][:, :hh, :hw].reshape(B, n8)
        tl8 = jnp.where(htv, jnp.where(hlv, tl8, 129), 127)
        blocks = p.reshape(B, hh, 8, hw, 8).transpose(0, 1, 3, 2, 4).reshape(
            B, n8, 8, 8)
        return blocks, t8, l8, tl8

    ub, ut, ul, utl = cctx(u, cu)
    vb, vt, vl, vtl = cctx(v, cv)
    upred4 = _predict4_blocks(ut, ul, utl, ht1, hl1, 8)
    vpred4 = _predict4_blocks(vt, vl, vtl, ht1, hl1, 8)
    usse = _sse(ub[None], upred4, (-1, -2))
    vsse = _sse(vb[None], vpred4, (-1, -2))
    uvmode = jnp.argmin(usse + vsse, axis=0).astype(I32)

    return {
        "ymode": ymode.reshape(B, mh, mw),
        "uvmode": uvmode.reshape(B, mh, mw),
        "is_i4": is4.reshape(B, mh, mw),
        "imodes": imodes.reshape(B, mh, mw, 16),
    }


def _skew_tiles_off(plane, mb_w, mh_local, size, T, row_offset):
    """(B, H_local, W) plane → (B, mh_local, T, s, s) skewed tiles with
    GLOBAL diagonal columns (col = 2*(my_local+row_offset) + mx)."""
    B = plane.shape[0]
    tiles = plane.reshape(B, mh_local, size, mb_w, size).transpose(
        0, 1, 3, 2, 4)
    my = jnp.arange(mh_local, dtype=I32)[:, None]
    mx = jnp.clip(jnp.arange(T, dtype=I32)[None, :]
                  - 2 * (my + row_offset), 0, mb_w - 1)
    return tiles[:, my, mx]


def _skew_flat_off(arr_bnm, mb_w, mh_local, T, row_offset):
    """(B, mh_local*mb_w[, k]) → (B, mh_local, T[, k]) global-skewed."""
    my = jnp.arange(mh_local, dtype=I32)[:, None]
    mx = jnp.clip(jnp.arange(T, dtype=I32)[None, :]
                  - 2 * (my + row_offset), 0, mb_w - 1)
    return arr_bnm.reshape((arr_bnm.shape[0], mh_local, mb_w)
                           + arr_bnm.shape[2:])[:, my, mx]


def _wavefront_impl(y, u, v, seg_map, qsteps, tables, *,
                    try_i4: bool, i4_penalty=0, modes=None,
                    want_recon: bool = False, use_derr: bool = False,
                    axis_name=None, mb_h_global: int | None = None,
                    n_shards: int = 1):
    """Wavefront body, shardable along the MB-row axis.

    With ``axis_name`` set (inside shard_map over ``n_shards`` row
    shards), the per-step row-shift context reads become ppermute halo
    exchanges of one MB edge strip over ICI; everything else is
    shard-local.  Returns SKEWED output arrays (caller unskews).
    """
    B, H, W = y.shape
    mh, mw = H // 16, W // 16                       # local rows
    mhg = mb_h_global if mb_h_global is not None else mh
    M, T = mh, num_diagonals(mw, mhg)
    if axis_name is not None:
        row_offset = lax.axis_index(axis_name).astype(I32) * mh
    else:
        row_offset = jnp.int32(0)

    qs = qsteps.astype(I32)                         # (B, 4, 6)
    iqs = (1 << 17) // jnp.maximum(qs, 1)

    Ysrc = _skew_tiles_off(y, mw, mh, 16, T, row_offset).astype(jnp.uint8)
    Usrc = _skew_tiles_off(u, mw, mh, 8, T, row_offset).astype(jnp.uint8)
    Vsrc = _skew_tiles_off(v, mw, mh, 8, T, row_offset).astype(jnp.uint8)
    seg_sk = _skew_flat_off(seg_map.reshape(B, mh * mw), mw, mh, T,
                            row_offset)             # (B, M, T)
    fixed = modes is not None
    if fixed:
        ym_d, um_d, i4_d, im_d = modes
        sk = lambda a, *k: _skew_flat_off(
            a.reshape((B, mh * mw) + k).astype(I32), mw, mh, T, row_offset)
        ym_sk = sk(ym_d)
        um_sk = sk(um_d)
        i4_sk = sk(i4_d)
        im_sk = sk(im_d, 16)

    if axis_name is None:
        shift_down = _shift_down
    else:
        perm = [(i, i + 1) for i in range(n_shards - 1)]

        def shift_down(x, fill):
            shifted = _shift_down(x, fill)
            prev_last = lax.ppermute(x[:, -1:], axis_name, perm)
            first = lax.axis_index(axis_name) == 0
            row0 = jnp.where(first, jnp.full_like(prev_last, fill),
                             prev_last)
            return shifted.at[:, 0:1].set(row0)

    # Narrow carry dtypes: the wavefront is HBM-bandwidth-bound on these
    # per-step sliced arrays (recon pixels fit uint8, quantized levels
    # fit int16, modes fit uint8); all arithmetic still runs in int32
    # in-register, so outputs stay bit-identical.
    U8 = jnp.uint8
    I16 = jnp.int16
    Sk_y = jnp.zeros((B, M, T + 3, 16, 16), U8)
    Sk_u = jnp.zeros((B, M, T + 3, 8, 8), U8)
    Sk_v = jnp.zeros((B, M, T + 3, 8, 8), U8)
    # UV DC error-diffusion carries (top pair for the MB below, left
    # pair for the right neighbour), (..., ch, 2) per MB.
    Sk_dt = jnp.zeros((B, M, T + 3, 2, 2), I16)
    Sk_dl = jnp.zeros((B, M, T + 3, 2, 2), I16)
    O_yl = jnp.zeros((B, M, T, 16, 16), I16)
    O_y2 = jnp.zeros((B, M, T, 16), I16)
    O_uv = jnp.zeros((B, M, T, 8, 16), I16)
    O_ym = jnp.zeros((B, M, T), U8)
    O_um = jnp.zeros((B, M, T), U8)
    O_i4 = jnp.zeros((B, M, T), U8)
    O_im = jnp.zeros((B, M, T, 16), U8)

    myv = jnp.arange(M, dtype=I32) + row_offset     # global row ids
    htv = myv > 0

    def step(t, carry):
        (Sk_y, Sk_u, Sk_v, Sk_dt, Sk_dl,
         O_yl, O_y2, O_uv, O_ym, O_um, O_i4, O_im) = carry
        mxv = t - 2 * myv                            # (M,)
        hlv = mxv > 0
        lastv = mxv == (mw - 1)
        ht3 = htv[None, :, None]
        hl3 = hlv[None, :, None]

        seg = lax.dynamic_slice(seg_sk, (0, 0, t), (B, M, 1))[..., 0]
        qlane = _switch(seg, [qs[:, k][:, None] for k in range(4)], 1)
        iqlane = _switch(seg, [iqs[:, k][:, None] for k in range(4)], 1)

        # ---- luma context from the skewed recon state ----
        win = lax.dynamic_slice(Sk_y, (0, 0, t, 0, 0),
                                (B, M, 3, 16, 16)).astype(I32)
        tl_t = shift_down(win[:, :, 0], 0)
        top_t = shift_down(win[:, :, 1], 0)
        left_t = win[:, :, 2]
        tr_t = shift_down(win[:, :, 2], 0)
        top16 = jnp.where(ht3, top_t[:, :, 15, :], 127)
        tr4 = tr_t[:, :, 15, 0:4]
        tr4 = jnp.where(lastv[None, :, None], top16[:, :, 15:16], tr4)
        tr4 = jnp.where(ht3, tr4, 127)
        left16 = jnp.where(hl3, left_t[:, :, :, 15], 129)
        tlpx = jnp.where(htv[None, :],
                         jnp.where(hlv[None, :], tl_t[:, :, 15, 15], 129),
                         127)

        src = lax.dynamic_slice(Ysrc, (0, 0, t, 0, 0),
                                (B, M, 1, 16, 16))[:, :, 0].astype(I32)

        # ---- i16 candidate ----
        pred4 = _predict4_blocks(top16, left16, tlpx, htv, hlv, 16)
        if fixed:
            ymode = lax.dynamic_slice(ym_sk, (0, 0, t), (B, M, 1))[..., 0]
        else:
            sse = _sse(src[None], pred4, (-1, -2))
            ymode = jnp.argmin(sse, axis=0).astype(I32)  # (B, M)
        pred = _switch(ymode, [pred4[k] for k in range(4)], 2)
        res = src.astype(I32) - pred.astype(I32)
        blk = res.reshape(B, M, 4, 4, 4, 4).transpose(0, 1, 2, 4, 3, 5)
        coeffs = dct_jax.fdct4x4(blk)                # (B,M,gy,gx,4,4)
        dcs = coeffs[..., 0, 0]
        y2 = dct_jax.fwht4x4(dcs)
        lane = lambda k: iqlane[..., k]
        qv = lambda k: qlane[..., k]
        y2_levels = _quant_lanes(y2, lane(2), lane(3),
                                 _BIAS["y2_dc"], _BIAS["y2_ac"])
        y_levels = _quant_lanes(
            coeffs.reshape(B, M, 16, 4, 4),
            lane(0)[..., None], lane(1)[..., None],
            _BIAS["y1_dc"], _BIAS["y1_ac"], first_ac=True)

        # Reconstruction (decoder mirror).
        y2_deq = _dequant_lanes(y2_levels, qv(2), qv(3))
        y2_any_ac = (y2_levels[..., 1:] != 0).any(axis=-1)
        iwht = dct_jax.iwht4x4(y2_deq)
        dc_only = jnp.broadcast_to(
            ((y2_deq[..., 0, 0] + 3) >> 3)[..., None, None], iwht.shape)
        rdcs = jnp.where(y2_any_ac[..., None, None], iwht, dc_only)
        deq = _dequant_lanes(y_levels, qv(0)[..., None], qv(1)[..., None])
        deq = deq.reshape(B, M, 4, 4, 4, 4)
        deq = deq.at[..., 0, 0].set(rdcs)
        pred_blk = pred.reshape(B, M, 4, 4, 4, 4).transpose(0, 1, 2, 4, 3, 5)
        recon_blk = dct_jax.idct_add_clip(deq, pred_blk)
        recon16 = recon_blk.transpose(0, 1, 2, 4, 3, 5).reshape(B, M, 16, 16)
        is4 = jnp.zeros((B, M), I32)
        imodes = jnp.broadcast_to(ymode[..., None], (B, M, 16))
        recon_y = recon16

        # ---- i4 candidate ----
        if try_i4:
            if not fixed:
                d16 = _sse(src, recon16, (-1, -2))
                rate16 = block_rate256(y2_levels, tables, type=1, first=0,
                                       ctx0=1)
                rate16 = rate16 + block_rate256(
                    y_levels, tables, type=0, first=1, ctx0=1).sum(axis=-1)
                pen_mb = _pen_lanes(i4_penalty, seg, B)   # (B, M)
                s16 = d16 + _mul_shr16(pen_mb, rate16)
            else:
                given4 = lax.dynamic_slice(
                    im_sk, (0, 0, t, 0), (B, M, 1, 16))[:, :, 0]

            scr = jnp.zeros((B, M, 17, 21), I32)
            scr = scr.at[:, :, 0, 0].set(tlpx)
            scr = scr.at[:, :, 0, 1:17].set(top16)
            scr = scr.at[:, :, 0, 17:21].set(tr4)
            scr = scr.at[:, :, 1:17, 0].set(left16)

            yl4 = jnp.zeros((B, M, 16, 16), I32)
            modes4 = jnp.zeros((B, M, 16), I32)
            s4 = jnp.zeros((B, M), I32)

            def sub(n, sub_carry):
                scr, yl4, modes4, s4 = sub_carry
                gy, gx = n >> 2, n & 3
                r, c = 4 * gy, 4 * gx
                row = lax.dynamic_slice(scr, (0, 0, r, c), (B, M, 1, 9))
                tl = row[..., 0, 0]
                top = row[..., 0, 1:5]
                tr_in = row[..., 0, 5:9]
                tr = jnp.where(jnp.equal(gx, 3), scr[:, :, 0, 17:21], tr_in)
                left = lax.dynamic_slice(scr, (0, 0, r + 1, c),
                                         (B, M, 4, 1))[..., 0]
                src4 = lax.dynamic_slice_in_dim(
                    lax.dynamic_slice_in_dim(src, r, 4, axis=2),
                    c, 4, axis=3)
                if fixed:
                    # One candidate: the given mode.  No heavy 10-wide
                    # DCT/quant/recon, no rate model.
                    bmode = lax.dynamic_slice(
                        given4, (0, 0, n), (B, M, 1))[..., 0]
                    preds = _pred_luma4_all(tl, top, tr, left)
                    pred1 = _switch(
                        bmode, [preds[:, :, k] for k in range(10)], 2)
                    res4 = src4.astype(I32) - pred1
                    cf = dct_jax.fdct4x4(res4)
                    blv = _quant_lanes(cf, lane(0), lane(1),
                                       _BIAS["y1_dc"], _BIAS["y1_ac"])
                    dq = _dequant_lanes(blv, qv(0), qv(1))
                    brec = dct_jax.idct_add_clip(dq, pred1)
                    bcost = jnp.zeros((B, M), I32)
                else:
                    preds = _pred_luma4_all(tl, top, tr, left)  # (B,M,10,4,4)
                    res4 = src4[:, :, None].astype(I32) - preds
                    cf = dct_jax.fdct4x4(res4)
                    lv = _quant_lanes(cf, lane(0)[..., None],
                                      lane(1)[..., None],
                                      _BIAS["y1_dc"], _BIAS["y1_ac"])
                    dq = _dequant_lanes(lv, qv(0)[..., None],
                                        qv(1)[..., None])
                    rec = dct_jax.idct_add_clip(dq, preds)      # (B,M,10,4,4)
                    dist = _sse(src4[:, :, None], rec, (-1, -2))
                    rate = block_rate256(lv, tables, type=3, first=0, ctx0=1)
                    cost = dist + _mul_shr16(pen_mb[..., None],
                                             rate + _MODE4_BITS256)
                    bmode = jnp.argmin(cost, axis=-1).astype(I32)  # (B, M)
                    bcost = cost.min(axis=-1)
                    blv = _switch(bmode, [lv[:, :, k] for k in range(10)], 1)
                    brec = _switch(
                        bmode, [rec[:, :, k] for k in range(10)], 2)
                scr = lax.dynamic_update_slice(
                    scr, brec, (0, 0, r + 1, c + 1))
                yl4 = lax.dynamic_update_slice(
                    yl4, blv[:, :, None], (0, 0, n, 0))
                modes4 = lax.dynamic_update_slice(
                    modes4, bmode[..., None], (0, 0, n))
                return scr, yl4, modes4, s4 + bcost

            scr, yl4, modes4, s4 = lax.fori_loop(
                0, 16, sub, (scr, yl4, modes4, s4),
                unroll=True if _UNROLL_SUB else 1)

            if fixed:
                adopt = lax.dynamic_slice(
                    i4_sk, (0, 0, t), (B, M, 1))[..., 0] != 0
            else:
                adopt = s4 < s16                       # (B, M)
            a2 = adopt[..., None]
            a4 = adopt[..., None, None]
            is4 = adopt.astype(I32)
            y_levels = jnp.where(a4, yl4, y_levels)
            y2_levels = jnp.where(a2, 0, y2_levels)
            imodes = jnp.where(a2, modes4, imodes)
            recon_y = jnp.where(a4, scr[:, :, 1:17, 1:17], recon16)

        # ---- chroma (U and V stacked on the batch axis) ----
        usrc = lax.dynamic_slice(Usrc, (0, 0, t, 0, 0),
                                 (B, M, 1, 8, 8))[:, :, 0].astype(I32)
        vsrc = lax.dynamic_slice(Vsrc, (0, 0, t, 0, 0),
                                 (B, M, 1, 8, 8))[:, :, 0].astype(I32)
        uwin = lax.dynamic_slice(Sk_u, (0, 0, t, 0, 0),
                                 (B, M, 3, 8, 8)).astype(I32)
        vwin = lax.dynamic_slice(Sk_v, (0, 0, t, 0, 0),
                                 (B, M, 3, 8, 8)).astype(I32)
        cwin = jnp.concatenate([uwin, vwin], axis=0)
        tl_c = shift_down(cwin[:, :, 0], 0)
        top_c = shift_down(cwin[:, :, 1], 0)
        left_c = cwin[:, :, 2]
        top8 = jnp.where(ht3, top_c[:, :, 7, :], 127)
        left8 = jnp.where(hl3, left_c[:, :, :, 7], 129)
        tlc = jnp.where(htv[None, :],
                        jnp.where(hlv[None, :], tl_c[:, :, 7, 7], 129),
                        127)
        cpred4 = _predict4_blocks(top8, left8, tlc, htv, hlv, 8)  # (4,2B,M,8,8)
        csrc = jnp.concatenate([usrc, vsrc], axis=0)
        if fixed:
            uvmode = lax.dynamic_slice(um_sk, (0, 0, t), (B, M, 1))[..., 0]
        else:
            csse = _sse(csrc[None], cpred4, (-1, -2))     # (4, 2B, M)
            uvmode = jnp.argmin(csse[:, :B] + csse[:, B:], axis=0).astype(I32)
        uvm2 = jnp.concatenate([uvmode, uvmode], axis=0)
        cpred = _switch(uvm2, [cpred4[k] for k in range(4)], 2)
        cres = csrc.astype(I32) - cpred.astype(I32)
        cblk = cres.reshape(2 * B, M, 2, 4, 2, 4).transpose(0, 1, 2, 4, 3, 5)
        ccf = dct_jax.fdct4x4(cblk)                   # (2B,M,2,2,4,4)
        iq2 = jnp.concatenate([iqlane, iqlane], axis=0)
        q2 = jnp.concatenate([qlane, qlane], axis=0)
        if use_derr:
            # UV DC error diffusion (CorrectDCValues): 2x2 chain per
            # channel with carried top/left errors — bit-identical to
            # the native host encoder.
            dtop = shift_down(lax.dynamic_slice(
                Sk_dt, (0, 0, t + 1, 0, 0),
                (B, M, 1, 2, 2))[:, :, 0].astype(I32), 0)
            dtop = jnp.where(htv[None, :, None, None], dtop, 0)
            dleft = lax.dynamic_slice(
                Sk_dl, (0, 0, t + 2, 0, 0),
                (B, M, 1, 2, 2))[:, :, 0].astype(I32)
            dleft = jnp.where(hlv[None, :, None, None], dleft, 0)
            # ch onto the 2B axis: [..., pair]
            dt2 = jnp.concatenate([dtop[:, :, 0], dtop[:, :, 1]], axis=0)
            dl2 = jnp.concatenate([dleft[:, :, 0], dleft[:, :, 1]], axis=0)
            iqdc = iq2[..., 4]
            qdc = q2[..., 4]

            def qsingle(vv):
                sgn = vv < 0
                av = jnp.abs(vv)
                lvl = jnp.minimum((av * iqdc + _BIAS["uv_dc"]) >> 17, 2047)
                err = av - lvl * qdc
                return jnp.where(sgn, -err, err) >> 1

            dc = ccf[..., 0, 0]                       # (2B, M, 2, 2)
            c00 = dc[..., 0, 0] + ((7 * dt2[..., 0] + 8 * dl2[..., 0]) >> 3)
            e0 = qsingle(c00)
            c01 = dc[..., 0, 1] + ((7 * dt2[..., 1] + 8 * e0) >> 3)
            e1 = qsingle(c01)
            c10 = dc[..., 1, 0] + ((7 * e0 + 8 * dl2[..., 1]) >> 3)
            e2 = qsingle(c10)
            c11 = dc[..., 1, 1] + ((7 * e1 + 8 * e2) >> 3)
            e3 = qsingle(c11)
            newdc = jnp.stack([jnp.stack([c00, c01], -1),
                               jnp.stack([c10, c11], -1)], -2)
            ccf = ccf.at[..., 0, 0].set(newdc)
            lv1 = (3 * e3) >> 2
            nl2 = jnp.stack([e1, lv1], -1)            # (2B, M, 2)
            nt2 = jnp.stack([e2, e3 - lv1], -1)
            nl = jnp.stack([nl2[:B], nl2[B:]], axis=2)   # (B, M, 2, 2)
            nt = jnp.stack([nt2[:B], nt2[B:]], axis=2)
            Sk_dl = lax.dynamic_update_slice(
                Sk_dl, nl[:, :, None].astype(jnp.int16), (0, 0, t + 3, 0, 0))
            Sk_dt = lax.dynamic_update_slice(
                Sk_dt, nt[:, :, None].astype(jnp.int16), (0, 0, t + 3, 0, 0))
        clv = _quant_lanes(ccf.reshape(2 * B, M, 4, 4, 4),
                           iq2[..., 4][..., None], iq2[..., 5][..., None],
                           _BIAS["uv_dc"], _BIAS["uv_ac"])
        cdq = _dequant_lanes(clv, q2[..., 4][..., None],
                             q2[..., 5][..., None])
        cdq = cdq.reshape(2 * B, M, 2, 2, 4, 4)
        cpred_blk = cpred.reshape(2 * B, M, 2, 4, 2, 4).transpose(
            0, 1, 2, 4, 3, 5)
        crec_blk = dct_jax.idct_add_clip(cdq, cpred_blk)
        crec = crec_blk.transpose(0, 1, 2, 4, 3, 5).reshape(2 * B, M, 8, 8)
        uv_levels = jnp.concatenate([clv[:B], clv[B:]], axis=2)  # (B,M,8,16)

        # ---- write recon column t+3 and output column t (narrowed) ----
        U8 = jnp.uint8
        I16 = jnp.int16
        Sk_y = lax.dynamic_update_slice(
            Sk_y, recon_y[:, :, None].astype(U8), (0, 0, t + 3, 0, 0))
        Sk_u = lax.dynamic_update_slice(
            Sk_u, crec[:B, :, None].astype(U8), (0, 0, t + 3, 0, 0))
        Sk_v = lax.dynamic_update_slice(
            Sk_v, crec[B:, :, None].astype(U8), (0, 0, t + 3, 0, 0))
        O_yl = lax.dynamic_update_slice(
            O_yl, y_levels.reshape(B, M, 1, 16, 16).astype(I16),
            (0, 0, t, 0, 0))
        O_y2 = lax.dynamic_update_slice(
            O_y2, y2_levels[:, :, None].astype(I16), (0, 0, t, 0))
        O_uv = lax.dynamic_update_slice(
            O_uv, uv_levels[:, :, None].astype(I16), (0, 0, t, 0, 0))
        O_ym = lax.dynamic_update_slice(
            O_ym, ymode[:, :, None].astype(U8), (0, 0, t))
        O_um = lax.dynamic_update_slice(
            O_um, uvmode[:, :, None].astype(U8), (0, 0, t))
        O_i4 = lax.dynamic_update_slice(
            O_i4, is4[:, :, None].astype(U8), (0, 0, t))
        O_im = lax.dynamic_update_slice(
            O_im, imodes[:, :, None].astype(U8), (0, 0, t, 0))
        return (Sk_y, Sk_u, Sk_v, Sk_dt, Sk_dl,
                O_yl, O_y2, O_uv, O_ym, O_um, O_i4, O_im)

    carry = (Sk_y, Sk_u, Sk_v, Sk_dt, Sk_dl,
             O_yl, O_y2, O_uv, O_ym, O_um, O_i4, O_im)
    # Outer-loop unrolling knob (measured a dead end on the tunnel
    # chip: unroll=2/4 ran 10-23% SLOWER than 1 — the bigger while
    # body defeats XLA's in-place update of the skewed state, the
    # same aliasing wall as the fused decode loop).  Kept env-tunable
    # for other hardware; 1 = off (identical graph to prior rounds).
    wf_unroll = int(_os.environ.get("GOWEBP_WF_UNROLL", "1"))
    carry = lax.fori_loop(0, T, step, carry,
                          unroll=wf_unroll if wf_unroll > 1 else 1)
    (Sk_y, Sk_u, Sk_v, _, _,
     O_yl, O_y2, O_uv, O_ym, O_um, O_i4, O_im) = carry

    out = {
        "ymode": O_ym, "uvmode": O_um, "is_i4": O_i4, "imodes": O_im,
        "y_levels": O_yl, "y2_levels": O_y2, "uv_levels": O_uv,
    }
    if want_recon:
        out["recon_sk"] = (Sk_y, Sk_u, Sk_v)
    return out


def _unskew_out(out, mw, mh, *, want_recon, row_offset0=True):
    """Skewed impl outputs → the public per-MB contract (+ narrow
    dtypes on-device: halves the device→host transfer).

    Columns are global diagonals; with row 0 of the array = global MB
    row 0 the standard unskew applies (sharded callers concatenate
    shards along the row axis first, which restores that property).
    """
    my = jnp.arange(mh, dtype=I32)[:, None]
    mx = jnp.arange(mw, dtype=I32)[None, :]
    un = lambda O: O[:, my, 2 * my + mx]
    res = {
        "ymode": un(out["ymode"]).astype(jnp.uint8),
        "uvmode": un(out["uvmode"]).astype(jnp.uint8),
        "is_i4": un(out["is_i4"]).astype(jnp.uint8),
        "imodes": un(out["imodes"]).astype(jnp.uint8),
        "y_levels": un(out["y_levels"]).astype(jnp.int16),
        "y2_levels": un(out["y2_levels"]).astype(jnp.int16),
        "uv_levels": un(out["uv_levels"]).astype(jnp.int16),
    }
    if want_recon:
        Sk_y, Sk_u, Sk_v = out["recon_sk"]
        res["recon_y"] = _unskew_plane(Sk_y, mw, mh, 16)
        res["recon_u"] = _unskew_plane(Sk_u, mw, mh, 8)
        res["recon_v"] = _unskew_plane(Sk_v, mw, mh, 8)
    return res


@partial(jax.jit, static_argnames=("try_i4", "want_recon", "use_derr"))
def encode_wavefront_core(y, u, v, seg_map, qsteps, tables, *,
                          try_i4: bool, i4_penalty=0, modes=None,
                          want_recon: bool = False, use_derr: bool = False):
    """Exact closed-loop batched dense encode (i16 + optional i4).

    y: (B, H16, W16) int32; u, v: (B, H16//2, W16//2) int32.
    seg_map: (B, mh, mw) int32 per-MB segment ids (zeros if unused).
    qsteps: (B, 4, 6) int32 per-image per-segment quant steps
    (y1dc, y1ac, y2dc, y2ac, uvdc, uvac) — traced, so batches whose
    images carry different segment deltas share one compilation.
    tables: (p0, p1, val) int32 token-cost tables (rate_jax layout).
    i4_penalty: static int or (B, 4) per-segment RD lambdas.
    Returns per-MB tensors bit-identical to the host encoder
    (wtpu_vp8_encode_frame) under the same parameters.

    ``modes`` (hybrid engine phase 2): a (ymode, uvmode, is_i4, imodes)
    tuple of dense (B, mh, mw[, 16]) int32 decisions.  The mode search
    and the RD rate model are skipped entirely — each step predicts
    with the given mode, quantizes, and reconstructs, so the stream is
    still exactly closed-loop (zero drift) at a fraction of the
    sequential cost (the 10-candidate i4 search is what dominates the
    full wavefront).
    """
    mh, mw = y.shape[1] // 16, y.shape[2] // 16
    if modes is not None and _PALLAS_WF != "0":
        # Fused Pallas wavefront core (pods with native Mosaic; this
        # tunnel can't compile it — see ops/pallas/wavefront_fixed.py).
        from .pallas.wavefront_fixed import wavefront_fixed_pallas

        return wavefront_fixed_pallas(
            y, u, v, seg_map, qsteps, modes, use_derr=use_derr,
            want_recon=want_recon, interpret=_PALLAS_WF != "1")
    out = _wavefront_impl(
        y, u, v, seg_map, qsteps, tables, try_i4=try_i4,
        i4_penalty=i4_penalty, modes=modes, want_recon=want_recon,
        use_derr=use_derr)
    return _unskew_out(out, mw, mh, want_recon=want_recon)


_ZERO_TABLES = None


def _zero_tables():
    global _ZERO_TABLES
    if _ZERO_TABLES is None:
        import numpy as _np
        # Plain NumPy: safe to create/reuse inside jit traces (a cached
        # jnp array created under a trace would leak that trace).
        _ZERO_TABLES = (
            _np.zeros((4, 8, 3, 2), _np.int32),
            _np.zeros((4, 8, 3, 2), _np.int32),
            _np.zeros((4, 8, 3, 68), _np.int32),
        )
    return _ZERO_TABLES


def encode_wavefront(y, u, v, *, y1_dc, y1_ac, y2_dc, y2_ac, uv_dc, uv_ac):
    """i16-only exact closed-loop encode (compat wrapper).

    Same output contract as encode_plane_step; bit-identical to the
    sequential host encoder with try_i4=0 and a single segment.
    """
    import numpy as _np

    B = y.shape[0]
    mh, mw = y.shape[1] // 16, y.shape[2] // 16
    row = _np.array([int(y1_dc), int(y1_ac), int(y2_dc), int(y2_ac),
                     int(uv_dc), int(uv_ac)], _np.int32)
    qs = jnp.asarray(_np.broadcast_to(row, (B, 4, 6)))
    seg = jnp.zeros((B, mh, mw), I32)
    out = encode_wavefront_core(
        y, u, v, seg, qs, _zero_tables(), try_i4=False)
    return {k: out[k] for k in
            ("ymode", "uvmode", "y_levels", "y2_levels", "uv_levels")}


@partial(jax.jit, static_argnames=("try_i4", "refine", "use_derr",
                                   "i4_parallel", "cold", "i4_topk"))
def encode_hybrid_core(y, u, v, seg_map, qsteps, tables, *,
                       try_i4: bool, i4_penalty=0, refine: int = 1,
                       use_derr: bool = False, i4_parallel: bool = False,
                       cold: str = "dense", i4_topk=None):
    """Hybrid engine: parallel mode search + fixed-mode exact wavefront.

    Phase 1 (fully parallel) decides ymode/uvmode/is_i4/imodes from
    source-pixel context; phase 2 (cheap wavefront) produces the exact
    closed-loop levels for those decisions.  ``refine`` extra rounds
    re-run the parallel search with the previous round's actual
    reconstruction as prediction context — a fixed-point iteration that
    converges onto the sequential search's decisions (source context
    alone flips ~60% of i4 sub-modes; one refinement round brings the
    decisions and the bitrate within a few % of the full search).

    ``cold`` picks the round-0 search (loop-amortized device timings,
    B=16 x 1 MP, round 5): "dense" — the plane-context parallel i4
    search (75 ms; its (B, 65k, 10) candidate tensors are HBM-bound);
    "i16" — i16/uv argmin only, no i4 (3.7 ms; round 0's only job is
    seeding the recon context for the refine round, and the refine's
    Gauss-Seidel walk (51 ms) re-decides every i4 mode anyway).  With
    refine >= 1, "i16" reaches the same fixed point ~1.4x faster
    end-to-end; quality stays gated by bench.py/test_corpus.

    Output streams always decode bit-exactly regardless of ``refine``
    (levels are true closed-loop for whatever modes were chosen).
    """
    # ``i4_parallel`` applies to the COLD-START search only: its
    # decisions are just the starting point, so the cheap plane-context
    # sub-block search suffices there; refinement rounds keep the
    # within-MB Gauss-Seidel greedy walk (with true recon boundary
    # context) whose decisions the final stream actually uses.
    #
    # Search-lambda calibration (round 5): the parallel (Jacobi)
    # iteration evaluates candidates against APPROXIMATE context, which
    # systematically understates the true coding rate on textured
    # content — its self-consistent solution carries ~2.5% more
    # nonzero levels than the sequential search's at the same lambda
    # (measured on the dead-leaves corpus; on smooth content the two
    # coincide).  Scaling the SEARCH lambda by 7/4 recenters the
    # decision threshold; the emitted stream is exact closed-loop for
    # whatever modes win, so this only moves the decisions (quality
    # stays inside the bench/suite RD gates, which is how the factor
    # was picked).  The exact engine keeps the uncalibrated lambda.
    if isinstance(i4_penalty, (int, _np.integer)):
        pen_search = min((int(i4_penalty) * 7) >> 2, (1 << 19) - 1)
    else:
        pen_search = jnp.minimum((jnp.asarray(i4_penalty) * 7) >> 2,
                                 (1 << 19) - 1)
    modes = openloop_mode_search(
        y, u, v, seg_map, qsteps, tables,
        try_i4=try_i4 and not (cold == "i16" and refine > 0),
        i4_penalty=pen_search,
        i4_parallel=i4_parallel and refine > 0, i4_topk=i4_topk)
    for r in range(refine + 1):
        last = r == refine
        out = encode_wavefront_core(
            y, u, v, seg_map, qsteps, tables,
            try_i4=try_i4, i4_penalty=i4_penalty,
            modes=(modes["ymode"], modes["uvmode"],
                   modes["is_i4"], modes["imodes"]),
            want_recon=not last, use_derr=use_derr)
        if not last:
            modes = openloop_mode_search(
                y, u, v, seg_map, qsteps, tables,
                try_i4=try_i4, i4_penalty=pen_search, i4_topk=i4_topk,
                ctx=(out["recon_y"], out["recon_u"], out["recon_v"]))
    return out


__all__ = ["encode_hybrid_core", "encode_wavefront", "encode_wavefront_core",
           "openloop_mode_search"]
