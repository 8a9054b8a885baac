"""Pallas TPU kernel: the hybrid engine's i4 candidate evaluation.

One kernel invocation scores all 10 B-modes of a tile of 4x4 sub-blocks
entirely in VMEM — prediction, forward DCT, quantization, zigzag,
the exact token-grammar rate model, dequant + inverse DCT for the
distortion term, and the RD argmin — fusing what the XLA path
(`ops.encode_wavefront_jax._i4_search_parallel`) spreads over ~50
HBM-round-tripping ops.  Bit-identical outputs (enforced by
tests/test_pallas_ops.py against the XLA search on random contexts).

Layout (TPU-native): FEATURES ON SUBLANES, SUB-BLOCKS ON LANES — every
per-sub-block array is (rows, S) with S sub-blocks on the 128-lane
axis, so the 4x4 DCT butterflies are static row combinations, zigzag
is a static row permutation, and the 8 shift-composable predictors
come from one (128, 42) x (42, S) MXU matmul over the shared
[Z | avg2 | avg3] feature rows (same trick as ops.vp8_recon_jax).

Reference parity: PickBestIntra4's candidate loop
(/root/reference/pkg/libwebp/enc/quant_enc.c.go:907-998) and
GetResidualCost (dsp/cost.go:18-51), re-designed as one
resident-in-VMEM vector program.

Deployment note: Mosaic compiles WEDGE the TPU behind this
environment's remote-compile tunnel (.claude/skills/verify/SKILL.md),
so the kernel ships interpret-validated; on pods with native Mosaic it
is the drop-in fused core for the hybrid cold-start search
(GOWEBP_PALLAS=1 gating, like ops/pallas/encode_plane.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

I32 = jnp.int32

# quantizer bias constants (match encode_wavefront_jax._BIAS)
_BIAS_DC = 96 << 9
_BIAS_AC = 110 << 9

# 1/256-bit header costs of the 10 kf b-modes (kMode4Bits256 twin)
_MODE4_BITS256 = np.array(
    [256, 704, 768, 768, 960, 1024, 960, 1024, 1024, 960], np.int32)

_ZZ = np.array([0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15],
               np.int32)
_BANDS16 = np.array([0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7],
                    np.int32)

# ---------------------------------------------------------------------------
# Static selection table for the 8 shift-composable B-modes.
# Feature vector rows (42): Z(15) = [L, l3, l2, l1, l0(=I... see below),
# X, A..D, E..H, H], then avg2(14) of adjacent Z, then avg3(13).
# Mirrors ops.vp8_recon_jax._B4_SEL exactly (via the same builder).
# ---------------------------------------------------------------------------


def _sel_table() -> np.ndarray:
    from ..vp8_recon_jax import _B4_SEL

    return np.asarray(_B4_SEL, np.float32)          # (42, 128)


def _rate_tables_t3(tables):
    """(p0, p1, val) [4][8][3][...] → type-3 rows keyed by position.

    Returns (p0n, p1n) as (3, 2, 16) and valn as (3, 68, 16) int32 —
    position-indexed (band resolved), ctx-major so the kernel's per-k
    loop selects among 3 static rows.  jnp ops throughout so TRACED
    table arrays (calls from inside the hybrid engine's jit) work.
    """
    band = jnp.asarray(_BANDS16)
    p0_t, p1_t, val_t = (jnp.asarray(t).astype(I32) for t in tables)
    p0n = jnp.transpose(p0_t[3][band], (1, 2, 0))
    p1n = jnp.transpose(p1_t[3][band], (1, 2, 0))
    valn = jnp.transpose(val_t[3][band], (1, 2, 0))
    return p0n, p1n, valn


def _fdct_rows(res):
    """Exact VP8 forward DCT on (16, S) raster rows → (16, S) raster."""
    r = [res[i] for i in range(16)]
    tmp = [None] * 16
    for i in range(4):
        d0, d1, d2, d3 = r[4 * i + 0], r[4 * i + 1], r[4 * i + 2], r[4 * i + 3]
        a0, a1, a2, a3 = d0 + d3, d1 + d2, d1 - d2, d0 - d3
        tmp[4 * i + 0] = (a0 + a1) * 8
        tmp[4 * i + 1] = (a2 * 2217 + a3 * 5352 + 1812) >> 9
        tmp[4 * i + 2] = (a0 - a1) * 8
        tmp[4 * i + 3] = (a3 * 2217 - a2 * 5352 + 937) >> 9
    out = [None] * 16
    for i in range(4):
        a0 = tmp[0 + i] + tmp[12 + i]
        a1 = tmp[4 + i] + tmp[8 + i]
        a2 = tmp[4 + i] - tmp[8 + i]
        a3 = tmp[0 + i] - tmp[12 + i]
        out[0 + i] = (a0 + a1 + 7) >> 4
        out[4 + i] = ((a2 * 2217 + a3 * 5352 + 12000) >> 16) + (a3 != 0)
        out[8 + i] = (a0 - a1 + 7) >> 4
        out[12 + i] = (a3 * 2217 - a2 * 5352 + 51000) >> 16
    return jnp.stack(out)


def _idct_rows(deq):
    """Exact VP8 inverse DCT on (16, S) raster rows → (16, S) residual."""

    def mul1(a):
        return a + ((a * 20091) >> 16)

    def mul2(a):
        return (a * 35468) >> 16

    d = [deq[i] for i in range(16)]
    C = [None] * 16
    for i in range(4):
        a = d[i] + d[8 + i]
        b = d[i] - d[8 + i]
        c = mul2(d[4 + i]) - mul1(d[12 + i])
        e = mul1(d[4 + i]) + mul2(d[12 + i])
        C[0 + i] = a + e
        C[4 + i] = b + c
        C[8 + i] = b - c
        C[12 + i] = a - e
    out = [None] * 16
    for r in range(4):
        dc = C[r * 4 + 0] + 4
        a = dc + C[r * 4 + 2]
        b = dc - C[r * 4 + 2]
        c = mul2(C[r * 4 + 1]) - mul1(C[r * 4 + 3])
        e = mul1(C[r * 4 + 1]) + mul2(C[r * 4 + 3])
        out[r * 4 + 0] = (a + e) >> 3
        out[r * 4 + 1] = (b + c) >> 3
        out[r * 4 + 2] = (b - c) >> 3
        out[r * 4 + 3] = (a - e) >> 3
    return jnp.stack(out)


def _rate256_rows(zz_abs, zz_nz, p0n, p1n, valn):
    """Exact token-grammar rate (1/256 bits) for (16, S) zigzag levels.

    Vector twin of ops.rate_jax.block_rate256 with type=3, first=0,
    ctx0=1 (the i4 configuration), features-on-sublanes layout.
    zz_abs: |level| clamped to 67; zz_nz: level != 0 (both (16, S)).
    """
    S = zz_abs.shape[1]
    idx = jnp.arange(16, dtype=I32)[:, None]
    has = zz_nz.any(axis=0)
    last = jnp.max(jnp.where(zz_nz, idx, -1), axis=0)         # (S,)

    prev_nz = jnp.concatenate(
        [jnp.zeros((1, S), bool), zz_nz[:-1]], axis=0)
    prev_v = jnp.concatenate(
        [jnp.zeros((1, S), I32), zz_abs[:-1]], axis=0)
    is_first = idx == 0
    decision = is_first | prev_nz
    ctx = jnp.where(is_first, 1,
                    jnp.where(prev_nz,
                              jnp.where(prev_v == 1, 1, 2), 0)).astype(I32)

    def by_ctx(tbl):                   # tbl (3, 16) → (16, S) by ctx
        t0 = tbl[0][:, None]
        t1 = tbl[1][:, None]
        t2 = tbl[2][:, None]
        return jnp.where(ctx == 0, t0, jnp.where(ctx == 1, t1, t2))

    p0_1 = by_ctx(p0n[:, 1])
    p0_0 = by_ctx(p0n[:, 0])
    p1_0 = by_ctx(p1n[:, 0])
    p1_1 = by_ctx(p1n[:, 1])

    vcost = jnp.zeros((16, S), I32)
    c0 = ctx == 0
    c1 = ctx == 1
    for k in range(68):
        vk = jnp.where(c0, valn[0, k][:, None],
                       jnp.where(c1, valn[1, k][:, None],
                                 valn[2, k][:, None]))
        vcost = vcost + jnp.where(zz_abs == k, vk, 0)

    active = idx <= last[None, :]
    charge = (jnp.where(decision, p0_1, 0)
              + jnp.where(zz_nz, p1_1 + vcost + 256, p1_0))
    r = jnp.sum(jnp.where(active, charge, 0), axis=0)

    eob_pos = jnp.clip(jnp.where(has, last + 1, 0), 0, 15)
    eob = jnp.sum(p0_0 * (idx == eob_pos[None, :]), axis=0)
    eob = jnp.where(has & (last == 15), 0, eob)
    return r + eob


def _i4_kernel(ctx_ref, src_ref, q_ref, sel_ref, p0_ref, p1_ref, val_ref,
               bmode_ref, cost_ref):
    """Score 10 B-modes for S sub-blocks; write argmin mode + cost."""
    ctx = ctx_ref[...].astype(I32)          # (13, S): tl, top0-3, tr0-3, l0-3
    src = src_ref[...].astype(I32)          # (16, S) raster
    q = q_ref[...].astype(I32)              # (5, S): iq_dc iq_ac q_dc q_ac pen
    S = src.shape[1]

    tl = ctx[0]
    top = ctx[1:5]
    tr = ctx[5:9]
    left = ctx[9:13]

    # feature rows: Z = [L, l3, l2, l1, l0, X, A..D, E..H, H]
    def avg2(a, b):
        return (a + b + 1) >> 1

    Z = jnp.concatenate(
        [left[3][None], left[::-1], tl[None], top, tr, tr[3][None]], axis=0)
    a2 = avg2(Z[:-1], Z[1:])
    a3 = (Z[:-2] + 2 * Z[1:-1] + Z[2:] + 2) >> 2
    feat = jnp.concatenate([Z, a2, a3], axis=0)          # (42, S)

    # 8 shift-composable predictors via one MXU matmul: (128,42)@(42,S)
    sel = sel_ref[...]                                    # (42, 128) f32
    preds8 = jax.lax.dot_general(
        sel.T, feat.astype(jnp.float32),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(I32)   # (128, S)

    dc = (top.sum(axis=0) + left.sum(axis=0) + 4) >> 3    # (S,)
    tm = jnp.clip(left[:, None, :] + top[None, :, :] - tl[None, None, :],
                  0, 255)                                  # (4r, 4c, S)
    pred_tm = tm.reshape(16, S)

    iq_dc, iq_ac, q_dc, q_ac, pen = (q[i] for i in range(5))
    p0n = p0_ref[...].astype(I32)
    p1n = p1_ref[...].astype(I32)
    valn = val_ref[...].astype(I32)

    best_cost = jnp.full((S,), 2**31 - 1, I32)
    best_mode = jnp.zeros((S,), I32)
    for m in range(10):
        if m == 0:
            pred = jnp.broadcast_to(dc[None, :], (16, S))
        elif m == 1:
            pred = pred_tm
        else:
            pred = preds8[16 * (m - 2):16 * (m - 1)]
        res = src - pred
        cf = _fdct_rows(res)
        # zigzag (static row permutation) + quantize
        zz = jnp.stack([cf[int(_ZZ[n])] for n in range(16)])
        iq = jnp.concatenate([iq_dc[None], jnp.broadcast_to(
            iq_ac[None], (15, S))], axis=0)
        bias = jnp.concatenate(
            [jnp.full((1, S), _BIAS_DC, I32),
             jnp.full((15, S), _BIAS_AC, I32)], axis=0)
        av = jnp.abs(zz)
        lvl = jnp.minimum((av * iq + bias) >> 17, 2047)
        nz = lvl != 0
        v67 = jnp.minimum(lvl, 67)
        rate = _rate256_rows(v67, nz, p0n, p1n, valn)
        # dequant + inverse: distortion
        qrow = jnp.concatenate([q_dc[None], jnp.broadcast_to(
            q_ac[None], (15, S))], axis=0)
        deq_zz = jnp.where(zz < 0, -lvl, lvl) * qrow
        deq = jnp.zeros((16, S), I32)
        for n in range(16):
            deq = deq.at[int(_ZZ[n])].set(deq_zz[n])
        rec = jnp.clip(pred + _idct_rows(deq), 0, 255)
        d = src - rec
        dist = jnp.sum(d * d, axis=0)
        # exact (pen * rate) >> 16 split-limb (rate < 2^26, pen < 2^19)
        full_rate = rate + int(_MODE4_BITS256[m])
        lh, ll = pen >> 8, pen & 0xFF
        rh, rl = full_rate >> 16, full_rate & 0xFFFF
        lam = pen * rh + ((lh * rl + ((ll * rl) >> 8)) >> 8)
        cost = dist + lam
        takes = cost < best_cost
        best_cost = jnp.where(takes, cost, best_cost)
        best_mode = jnp.where(takes, m, best_mode)

    bmode_ref[...] = best_mode[None, :]
    cost_ref[...] = best_cost[None, :]


@partial(jax.jit, static_argnames=("interpret",))
def _i4_search_call(ctx13, src16, quants5, sel, p0n, p1n, valn, *,
                    interpret: bool):
    S = src16.shape[1]
    bmode, cost = pl.pallas_call(
        _i4_kernel,
        out_shape=(jax.ShapeDtypeStruct((1, S), I32),
                   jax.ShapeDtypeStruct((1, S), I32)),
        interpret=interpret,
    )(ctx13.astype(I32), src16.astype(I32), quants5.astype(I32),
      sel, p0n, p1n, valn)
    return bmode[0], cost[0]


def i4_search_pallas(ctx13, src16, quants5, tables, *, interpret=True):
    """Score + argmin the 10 B-modes for S sub-blocks in one fused pass.

    ctx13 (13, S) int32 context rows [tl, top0-3, tr0-3, left0-3];
    src16 (16, S) int32 raster source; quants5 (5, S) int32
    [iq_dc, iq_ac, q_dc, q_ac, pen]; tables = the standard NumPy
    (p0, p1, val) trellis cost tables (reshaped host-side).  Returns
    (bmode (S,), cost (S,)) identical to the XLA parallel search's
    per-sub-block decisions.
    """
    sel = jnp.asarray(_sel_table())
    p0n, p1n, valn = _rate_tables_t3(tables)
    return _i4_search_call(ctx13, src16, quants5, sel, p0n, p1n, valn,
                           interpret=interpret)


__all__ = ["i4_search_pallas"]
