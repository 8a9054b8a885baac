"""Fused Pallas TPU kernels for the VP8 dense encode phase.

One kernel instance processes one macroblock row of one image entirely
in VMEM: intra mode search (DC/TM/VE/HE), residual 4x4 forward DCT and
quantization — the same integer semantics as
``ops.encode_plane_jax.encode_plane_core_v2`` (bit-identical outputs,
enforced by tests/test_pallas_ops.py) but with a single HBM read of the
source band and a single write of the level band, instead of the ~20
plane-sized HBM round-trips the unfused XLA graph performs.  The dense
phase is bandwidth-bound, so this is where the remaining speed lives.

Layout strategy (TPU-native, not a port):
- Everything stays in plane layout (rows x image-width lanes); the 4x4
  DCT butterflies are computed with cyclic lane/sublane rotations
  (``pltpu.roll``) anchored at each aligned block base — no tiny-minor
  reshapes, no transposes.
- Per-MB reductions (mode SSE) use a log-tree of lane rotations; the
  chosen mode is spread back over the MB's 16 lanes by a doubling
  masked-fill, also with rotations.
- Prediction context (top row / left column / top-left / DC value per
  MB, with the decoder's 127/129 edge fills and optional shard halos)
  is precomputed outside the kernel by cheap XLA ops and streamed in as
  thin rows, so the kernel body is pure VPU arithmetic.

Reference parity: the per-MB search/transform/quantize pipeline of
/root/reference/pkg/libwebp/enc/quant_enc.c.go:840-1076 and the DSP
kernels FTransform_C/QuantizeBlock_C (enc.c.go:125,708), re-designed
as a resident-in-VMEM vector program.

Deployment note: on development hosts that reach the TPU through a
remote-compile tunnel, Mosaic kernel compilation can crash the compile
helper and wedge the chip (see .claude/skills/verify/SKILL.md), so the
compiled path is opt-in: set GOWEBP_PALLAS=1 (pods with native Mosaic)
to route encode_plane dispatch here; everywhere else the kernels run
under ``interpret=True`` (bit-exact, used by the test suite) and the
production default stays the pure-XLA plane engine.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roll(x, shift: int, axis: int):
    """Cyclic rotation with the same semantics as jnp.roll.

    pltpu.roll only accepts non-negative shifts; normalize.
    """
    n = x.shape[axis]
    return pltpu.roll(x, shift % n, axis)


def _lane_group_sum(row, group: int):
    """Sum each aligned group of ``group`` lanes; valid at group-base lanes.

    row: (1, W) int32. Result lanes j % group != 0 contain garbage.
    """
    s = row
    k = group
    while k > 1:
        k //= 2
        s = s + _roll(s, -k, 1)
    return s


def _spread_from_base(row, group: int, base_mask):
    """Broadcast the value at each group-base lane across its group."""
    g = jnp.where(base_mask, row, 0)
    k = 1
    while k < group:
        g = g + _roll(g, k, 1)
        k *= 2
    return g


def _fdct_band(res):
    """4x4 forward DCT of every aligned 4x4 block of a (rows, W) band.

    Same integer semantics as encode_plane_jax._fdct_plane, in rotation
    form: butterflies are evaluated anchored at block-base lanes/rows
    and the four outputs scattered back by rotation + lane select.
    """
    rows, W = res.shape
    lane4 = jax.lax.broadcasted_iota(jnp.int32, (rows, W), 1) % 4
    row4 = jax.lax.broadcasted_iota(jnp.int32, (rows, W), 0) % 4

    # Pass 1: horizontal, anchored at lanes 4k.
    d0 = res
    d1 = _roll(res, -1, 1)
    d2 = _roll(res, -2, 1)
    d3 = _roll(res, -3, 1)
    a0 = d0 + d3
    a1 = d1 + d2
    a2 = d1 - d2
    a3 = d0 - d3
    t0 = (a0 + a1) * 8
    t1 = (a2 * 2217 + a3 * 5352 + 1812) >> 9
    t2 = (a0 - a1) * 8
    t3 = (a3 * 2217 - a2 * 5352 + 937) >> 9
    tmp = jnp.where(
        lane4 == 0, t0,
        jnp.where(lane4 == 1, _roll(t1, 1, 1),
                  jnp.where(lane4 == 2, _roll(t2, 2, 1), _roll(t3, 3, 1))))

    # Pass 2: vertical, anchored at rows 4k.
    p0 = tmp
    p1 = _roll(tmp, -1, 0)
    p2 = _roll(tmp, -2, 0)
    p3 = _roll(tmp, -3, 0)
    a0 = p0 + p3
    a1 = p1 + p2
    a2 = p1 - p2
    a3 = p0 - p3
    o0 = (a0 + a1 + 7) >> 4
    o1 = ((a2 * 2217 + a3 * 5352 + 12000) >> 16) + (a3 != 0).astype(jnp.int32)
    o2 = (a0 - a1 + 7) >> 4
    o3 = (a3 * 2217 - a2 * 5352 + 51000) >> 16
    return jnp.where(
        row4 == 0, o0,
        jnp.where(row4 == 1, _roll(o1, 1, 0),
                  jnp.where(row4 == 2, _roll(o2, 2, 0), _roll(o3, 3, 0))))


def _quant_band(coef, iq_dc, bias_dc, iq_ac, bias_ac, zero_dc: bool):
    """QUANTDIV of a coefficient band (same as _quant_plane)."""
    rows, W = coef.shape
    is_dc = ((jax.lax.broadcasted_iota(jnp.int32, (rows, W), 0) % 4 == 0)
             & (jax.lax.broadcasted_iota(jnp.int32, (rows, W), 1) % 4 == 0))
    sign = coef < 0
    av = jnp.abs(coef)
    if zero_dc:
        level = jnp.minimum((av * iq_ac + bias_ac) >> 17, 2047)
        level = jnp.where(is_dc, 0, level)
    else:
        iq = jnp.where(is_dc, iq_dc, iq_ac)
        bias = jnp.where(is_dc, bias_dc, bias_ac)
        level = jnp.minimum((av * iq + bias) >> 17, 2047)
    return jnp.where(sign, -level, level)


def _mode_search(band, top, left, tl_exp, dc_exp, mb: int):
    """Intra mode search over one MB band → (pred, mode_row).

    band:   (mb, W) int32 source pixels
    top:    (1, W)  row above (127-filled on the first MB row)
    left:   (mb, W) left column, pre-expanded across each MB's lanes
    tl_exp: (1, W)  top-left corner, pre-expanded
    dc_exp: (1, W)  DC prediction value, pre-expanded
    Returns the chosen prediction band (mb, W) and the mode replicated
    across each MB's lanes (1, W).
    """
    rows, W = band.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    base_mask = lane % mb == 0

    top_b = jnp.broadcast_to(top, (rows, W))
    tl_b = jnp.broadcast_to(tl_exp, (rows, W))
    dc_b = jnp.broadcast_to(dc_exp, (rows, W))
    preds = (
        dc_b,
        jnp.clip(left + top_b - tl_b, 0, 255),   # TM
        top_b,                                    # VE
        left,                                     # HE
    )

    best_sse = None
    mode = jnp.zeros((1, W), jnp.int32)
    for m, p in enumerate(preds):
        d = band - p
        sse = _lane_group_sum(jnp.sum(d * d, axis=0, keepdims=True), mb)
        if best_sse is None:
            best_sse = sse
        else:
            better = sse < best_sse
            mode = jnp.where(better, m, mode)
            best_sse = jnp.where(better, sse, best_sse)

    mode_row = _spread_from_base(mode, mb, base_mask)
    mode_b = jnp.broadcast_to(mode_row, (rows, W))
    pred = jnp.where(
        mode_b == 0, preds[0],
        jnp.where(mode_b == 1, preds[1],
                  jnp.where(mode_b == 2, preds[2], preds[3])))
    return pred, mode_row


def _luma_kernel(y_ref, top_ref, left_ref, tl_ref, dc_ref,
                 lev_ref, dcrow_ref, mode_ref, *, quants):
    iq_dc, bias_dc, iq_ac, bias_ac = quants
    band = y_ref[0]
    pred, mode_row = _mode_search(
        band, top_ref[0, 0], left_ref[0], tl_ref[0, 0], dc_ref[0, 0], 16)
    coef = _fdct_band(band - pred)
    lev_ref[0] = _quant_band(coef, iq_dc, bias_dc, iq_ac, bias_ac, True)
    # DC coefficients (rows 0,4,8,12) feed the WHT/Y2 path outside.
    dcrow_ref[0, 0] = coef[0::4, :]
    mode_ref[0, 0] = mode_row


def _chroma_kernel(u_ref, v_ref, utop_ref, uleft_ref, utl_ref, udc_ref,
                   vtop_ref, vleft_ref, vtl_ref, vdc_ref,
                   ulev_ref, vlev_ref, mode_ref, *, quants):
    iq_dc, bias_dc, iq_ac, bias_ac = quants
    ub, vb = u_ref[0], v_ref[0]
    rows, W = ub.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    base_mask = lane % 8 == 0

    utop = jnp.broadcast_to(utop_ref[0, 0], (rows, W))
    vtop = jnp.broadcast_to(vtop_ref[0, 0], (rows, W))
    utl = jnp.broadcast_to(utl_ref[0, 0], (rows, W))
    vtl = jnp.broadcast_to(vtl_ref[0, 0], (rows, W))
    udc = jnp.broadcast_to(udc_ref[0, 0], (rows, W))
    vdc = jnp.broadcast_to(vdc_ref[0, 0], (rows, W))
    uleft, vleft = uleft_ref[0], vleft_ref[0]

    upreds = (udc, jnp.clip(uleft + utop - utl, 0, 255), utop, uleft)
    vpreds = (vdc, jnp.clip(vleft + vtop - vtl, 0, 255), vtop, vleft)

    best_sse = None
    mode = jnp.zeros((1, W), jnp.int32)
    for m in range(4):
        du = ub - upreds[m]
        dv = vb - vpreds[m]
        sse = _lane_group_sum(
            jnp.sum(du * du, axis=0, keepdims=True)
            + jnp.sum(dv * dv, axis=0, keepdims=True), 8)
        if best_sse is None:
            best_sse = sse
        else:
            better = sse < best_sse
            mode = jnp.where(better, m, mode)
            best_sse = jnp.where(better, sse, best_sse)
    mode_row = _spread_from_base(mode, 8, base_mask)
    mode_b = jnp.broadcast_to(mode_row, (rows, W))

    for preds, band, out in ((upreds, ub, ulev_ref), (vpreds, vb, vlev_ref)):
        pred = jnp.where(
            mode_b == 0, preds[0],
            jnp.where(mode_b == 1, preds[1],
                      jnp.where(mode_b == 2, preds[2], preds[3])))
        coef = _fdct_band(band - pred)
        out[0] = _quant_band(coef, iq_dc, bias_dc, iq_ac, bias_ac, False)
    mode_ref[0, 0] = mode_row


def _contexts(plane, mb, left_halo=None, leftmost=None):
    """Pre-expanded prediction context rows for the kernel.

    Returns top (B,mh,W), left_full (B,H,W), tl_exp (B,mh,W),
    dc_exp (B,mh,W) — all with the decoder's 127/129 edge fills and
    halo-aware MB-column 0 (same math as encode_plane_jax)."""
    B, H, W = plane.shape
    mh, mw = H // mb, W // mb
    shift = 5 if mb == 16 else 4

    top = jnp.full((B, mh, W), 127, plane.dtype)
    top = top.at[:, 1:, :].set(plane[:, mb - 1 :: mb, :][:, :-1, :])
    left = jnp.full((B, H, mw), 129, plane.dtype)
    left = left.at[:, :, 1:].set(plane[:, :, mb - 1 :: mb][:, :, :-1])
    if left_halo is not None:
        edge = jnp.where(leftmost, jnp.full_like(left_halo, 129), left_halo)
        left = left.at[:, :, 0].set(edge)
    tl = jnp.full((B, mh, mw), 129, plane.dtype)
    tl = tl.at[:, 1:, 1:].set(plane[:, mb - 1 :: mb, mb - 1 :: mb][:, :-1, :-1])
    if left_halo is not None:
        halo_bottoms = left_halo[:, mb - 1 :: mb][:, :-1]
        tl_col0 = jnp.where(leftmost, jnp.full_like(halo_bottoms, 129),
                            halo_bottoms)
        tl = tl.at[:, 1:, 0].set(tl_col0)
    tl = jnp.where(jnp.arange(mh)[None, :, None] == 0, 127, tl)

    have_top = (jnp.arange(mh) > 0)[None, :, None]
    have_left = (jnp.arange(mw) > 0)[None, None, :]
    if leftmost is not None:
        have_left = have_left | ~leftmost
    sum_top = top.reshape(B, mh, mw, mb).sum(axis=-1)
    sum_left = left.reshape(B, mh, mb, mw).sum(axis=-2)
    dc_both = (sum_top + sum_left + mb) >> shift
    dc_left = (sum_left + mb // 2) >> (shift - 1)
    dc_top = (sum_top + mb // 2) >> (shift - 1)
    dc = jnp.where(
        have_top & have_left, dc_both,
        jnp.where(have_left, dc_left, jnp.where(have_top, dc_top, 0x80)),
    )

    left_full = jnp.repeat(left, mb, axis=2)
    tl_exp = jnp.repeat(tl, mb, axis=2)
    dc_exp = jnp.repeat(dc, mb, axis=2)
    return top, left_full, tl_exp, dc_exp


def _band_spec(rows, W):
    return pl.BlockSpec((1, rows, W), lambda b, i: (b, i, 0),
                        memory_space=pltpu.VMEM)


def _row_spec(rows, W):
    """Thin per-MB-row input/output, carried as (B, mh, rows, W) so the
    sublane-adjacent block dim equals the array dim (Mosaic tiling rule)."""
    return pl.BlockSpec((1, 1, rows, W), lambda b, i: (b, i, 0, 0),
                        memory_space=pltpu.VMEM)


def _as_rows(x):
    """(B, mh, W) → (B, mh, 1, W) for _row_spec inputs."""
    return x[:, :, None, :]


def _run_luma(y, quants, interpret):
    B, H, W = y.shape
    mh = H // 16
    top, left_full, tl_exp, dc_exp = _contexts(y, 16)
    kernel = partial(_luma_kernel, quants=quants)
    grid = (B, mh)
    levels, dc_rows, modes = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            _band_spec(16, W),   # y band
            _row_spec(1, W),     # top row
            _band_spec(16, W),   # left (expanded)
            _row_spec(1, W),     # tl (expanded)
            _row_spec(1, W),     # dc (expanded)
        ],
        out_specs=[
            _band_spec(16, W),
            _row_spec(4, W),
            _row_spec(1, W),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W), jnp.int32),
            jax.ShapeDtypeStruct((B, mh, 4, W), jnp.int32),
            jax.ShapeDtypeStruct((B, mh, 1, W), jnp.int32),
        ],
        interpret=interpret,
    )(y, _as_rows(top), left_full, _as_rows(tl_exp), _as_rows(dc_exp))
    return levels, dc_rows.reshape(B, 4 * mh, W), modes[:, :, 0, :]


def _run_chroma(u, v, quants, interpret):
    B, H, W = u.shape
    mh = H // 8
    uctx = _contexts(u, 8)
    vctx = _contexts(v, 8)
    kernel = partial(_chroma_kernel, quants=quants)
    grid = (B, mh)
    ulev, vlev, modes = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            _band_spec(8, W), _band_spec(8, W),
            _row_spec(1, W), _band_spec(8, W), _row_spec(1, W),
            _row_spec(1, W),
            _row_spec(1, W), _band_spec(8, W), _row_spec(1, W),
            _row_spec(1, W),
        ],
        out_specs=[_band_spec(8, W), _band_spec(8, W), _row_spec(1, W)],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W), jnp.int32),
            jax.ShapeDtypeStruct((B, H, W), jnp.int32),
            jax.ShapeDtypeStruct((B, mh, 1, W), jnp.int32),
        ],
        interpret=interpret,
    )(u, v, _as_rows(uctx[0]), uctx[1], _as_rows(uctx[2]), _as_rows(uctx[3]),
      _as_rows(vctx[0]), vctx[1], _as_rows(vctx[2]), _as_rows(vctx[3]))
    return ulev, vlev, modes[:, :, 0, :]


def encode_plane_core_pallas(y, u, v, *, y1_dc, y1_ac, y2_dc, y2_ac,
                             uv_dc, uv_ac, interpret=None):
    """Fused-kernel dense encode phase; bit-identical outputs to
    encode_plane_core_v2 (tests/test_pallas_ops.py enforces this)."""
    from ..encode_plane_jax import _fwht_grid, _quant_plane, _regroup_mb_blocks

    if interpret is None:
        interpret = (jax.default_backend() != "tpu"
                     or os.environ.get("GOWEBP_PALLAS") != "1")

    def qp(q):
        return (1 << 17) // q

    y = y.astype(jnp.int32)
    u = u.astype(jnp.int32)
    v = v.astype(jnp.int32)

    levels, dc_rows, ymodes = _run_luma(
        y, (qp(y1_dc), 96 << 9, qp(y1_ac), 110 << 9), interpret)
    ulev, vlev, uvmodes = _run_chroma(
        u, v, (qp(uv_dc), 110 << 9, qp(uv_ac), 110 << 9), interpret)

    y_levels = _regroup_mb_blocks(levels, 16)
    dcs = dc_rows[:, :, 0::4]                       # (B, H/4, W/4)
    y2 = _fwht_grid(dcs)
    y2_levels = _regroup_mb_blocks(
        _quant_plane(y2, qp(y2_dc), 96 << 9, qp(y2_ac), 96 << 9, False), 4
    )[:, :, :, 0, :]
    uv_levels = jnp.concatenate(
        [_regroup_mb_blocks(ulev, 8), _regroup_mb_blocks(vlev, 8)], axis=3)

    return {
        "ymode": ymodes[:, :, ::16].astype(jnp.uint8),
        "uvmode": uvmodes[:, :, ::8].astype(jnp.uint8),
        "y_levels": y_levels.astype(jnp.int16),
        "y2_levels": y2_levels.astype(jnp.int16),
        "uv_levels": uv_levels.astype(jnp.int16),
    }


@partial(jax.jit, static_argnames=("y1_dc", "y1_ac", "y2_dc", "y2_ac",
                                   "uv_dc", "uv_ac"))
def encode_plane_step_pallas(y, u, v, *, y1_dc, y1_ac, y2_dc, y2_ac,
                             uv_dc, uv_ac):
    """Jitted fused-kernel entry (TPU; interpret-mode elsewhere)."""
    return encode_plane_core_pallas(
        y, u, v, y1_dc=y1_dc, y1_ac=y1_ac, y2_dc=y2_dc, y2_ac=y2_ac,
        uv_dc=uv_dc, uv_ac=uv_ac)


__all__ = ["encode_plane_core_pallas", "encode_plane_step_pallas"]
