"""Pallas fused encode kernels vs the XLA plane engine (bit-exact).

Runs the Pallas kernels in interpreter mode (tests are CPU-only); the
same kernel compiles with Mosaic on the real chip, where bench.py uses
it.  Outputs must be bit-identical to encode_plane_core_v2, which is
itself golden-tested against the scalar NumPy reference.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from gowebp_tpu.ops.encode_plane_jax import encode_plane_core_v2
from gowebp_tpu.ops.pallas.encode_plane import encode_plane_core_pallas

RNG = np.random.default_rng(1234)

QUANTS = dict(y1_dc=8, y1_ac=17, y2_dc=16, y2_ac=34, uv_dc=8, uv_ac=17)


def _planes(b, h, w):
    y = RNG.integers(0, 256, (b, h, w)).astype(np.int32)
    u = RNG.integers(0, 256, (b, h // 2, w // 2)).astype(np.int32)
    v = RNG.integers(0, 256, (b, h // 2, w // 2)).astype(np.int32)
    return jnp.array(y), jnp.array(u), jnp.array(v)


@pytest.mark.parametrize("shape", [(1, 16, 16), (2, 64, 128), (1, 48, 256)])
def test_pallas_matches_v2(shape):
    y, u, v = _planes(*shape)
    ref = encode_plane_core_v2(y, u, v, **QUANTS)
    got = encode_plane_core_pallas(y, u, v, **QUANTS, interpret=True)
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_array_equal(
            np.asarray(got[k]), np.asarray(ref[k]), err_msg=k)


def test_pallas_other_quants():
    y, u, v = _planes(2, 32, 64)
    q = dict(y1_dc=24, y1_ac=40, y2_dc=48, y2_ac=80, uv_dc=20, uv_ac=35)
    ref = encode_plane_core_v2(y, u, v, **q)
    got = encode_plane_core_pallas(y, u, v, **q, interpret=True)
    for k in ref:
        np.testing.assert_array_equal(
            np.asarray(got[k]), np.asarray(ref[k]), err_msg=k)


class TestDecodePost:
    def _check(self, b, h, w, with_alpha=False):
        from gowebp_tpu.ops.pallas.decode_post import yuv420_to_rgba_pallas
        from gowebp_tpu.ops.yuv_jax import batch_yuv_to_rgba

        y = jnp.array(RNG.integers(0, 256, (b, h, w)), jnp.int32)
        u = jnp.array(RNG.integers(0, 256, (b, h // 2, w // 2)), jnp.int32)
        v = jnp.array(RNG.integers(0, 256, (b, h // 2, w // 2)), jnp.int32)
        ref = np.asarray(batch_yuv_to_rgba(y, u, v))
        alpha = None
        if with_alpha:
            alpha = jnp.array(RNG.integers(0, 256, (b, h, w)), jnp.int32)
            ref = ref.copy()
            ref[..., 3] = np.asarray(alpha, np.uint8)
        got = np.asarray(yuv420_to_rgba_pallas(y, u, v, alpha, interpret=True))
        np.testing.assert_array_equal(got, ref)

    @pytest.mark.parametrize("shape", [(1, 16, 16), (2, 32, 64), (1, 48, 10)])
    def test_matches_xla(self, shape):
        self._check(*shape)

    def test_alpha_plane(self):
        self._check(1, 32, 32, with_alpha=True)


class TestI4SearchKernel:
    """Fused Pallas i4 candidate evaluation == the XLA search math
    (interpret mode; Mosaic compiles are off-limits on this tunnel)."""

    def test_matches_xla_candidate_search(self):
        import numpy as np

        from gowebp_tpu.models.vp8.encoder import (_default_cost_tables,
                                                   _i4_config, make_quants,
                                                   quality_to_q)
        from gowebp_tpu.ops import dct_jax
        from gowebp_tpu.ops.encode_wavefront_jax import (
            _MODE4_BITS256, _BIAS, _mul_shr16, _quant_lanes,
            _dequant_lanes, _sse)
        from gowebp_tpu.ops.pallas.i4_search import i4_search_pallas
        from gowebp_tpu.ops.rate_jax import block_rate256
        from gowebp_tpu.ops.vp8_recon_jax import _pred_luma4_all
        import jax.numpy as jnp

        rng = np.random.default_rng(31)
        S = 256
        tl = rng.integers(0, 256, (1, S)).astype(np.int32)
        top = rng.integers(0, 256, (1, S, 4)).astype(np.int32)
        tr = rng.integers(0, 256, (1, S, 4)).astype(np.int32)
        left = rng.integers(0, 256, (1, S, 4)).astype(np.int32)
        src = rng.integers(0, 256, (1, S, 4, 4)).astype(np.int32)

        q = make_quants(quality_to_q(75.0))
        _, pen_i = _i4_config(q.y1_ac.q, 4, 0)
        iq_dc = (1 << 17) // q.y1_dc.q
        iq_ac = (1 << 17) // q.y1_ac.q
        tables = _default_cost_tables()
        tj = tuple(jnp.asarray(t.astype(np.int32)) for t in tables)

        # ---- XLA oracle: the Gauss-Seidel substep's candidate math ----
        preds = _pred_luma4_all(jnp.asarray(tl), jnp.asarray(top),
                                jnp.asarray(tr), jnp.asarray(left))
        res4 = jnp.asarray(src)[:, :, None] - preds
        cf = dct_jax.fdct4x4(res4)
        lv = _quant_lanes(cf, jnp.full((1, S, 1), iq_dc),
                          jnp.full((1, S, 1), iq_ac),
                          _BIAS["y1_dc"], _BIAS["y1_ac"])
        dq = _dequant_lanes(lv, jnp.full((1, S, 1), q.y1_dc.q),
                            jnp.full((1, S, 1), q.y1_ac.q))
        rec = dct_jax.idct_add_clip(dq, preds)
        dist = _sse(jnp.asarray(src)[:, :, None], rec, (-1, -2))
        rate = block_rate256(lv, tj, type=3, first=0, ctx0=1)
        cost = dist + _mul_shr16(jnp.int32(pen_i),
                                 rate + jnp.asarray(_MODE4_BITS256))
        want_mode = np.asarray(jnp.argmin(cost, axis=-1))[0]
        want_cost = np.asarray(cost.min(axis=-1))[0]

        # ---- Pallas kernel ----
        ctx13 = np.concatenate(
            [tl, top[0].T, tr[0].T, left[0].T], axis=0).astype(np.int32)
        src16 = src[0].reshape(S, 16).T.astype(np.int32)
        quants5 = np.stack([
            np.full(S, iq_dc), np.full(S, iq_ac),
            np.full(S, q.y1_dc.q), np.full(S, q.y1_ac.q),
            np.full(S, pen_i)]).astype(np.int32)
        got_mode, got_cost = i4_search_pallas(
            jnp.asarray(ctx13), jnp.asarray(src16), jnp.asarray(quants5),
            tables, interpret=True)
        np.testing.assert_array_equal(np.asarray(got_cost), want_cost)
        np.testing.assert_array_equal(np.asarray(got_mode), want_mode)

    def test_wired_into_hybrid_search(self, monkeypatch):
        """GOWEBP_PALLAS_I4=interpret routes the hybrid cold-start
        search through the fused kernel with identical decisions."""
        import importlib

        import numpy as np

        import gowebp_tpu.ops.encode_wavefront_jax as W
        from gowebp_tpu.models.vp8.encoder import (_default_cost_tables,
                                                   _i4_config, make_quants,
                                                   quality_to_q)

        rng = np.random.default_rng(7)
        B, H, Wd = 1, 48, 64
        y = rng.integers(0, 256, (B, H, Wd)).astype(np.int32)
        u = rng.integers(0, 256, (B, H // 2, Wd // 2)).astype(np.int32)
        v = rng.integers(0, 256, (B, H // 2, Wd // 2)).astype(np.int32)
        q = make_quants(quality_to_q(75.0))
        row = np.array([q.y1_dc.q, q.y1_ac.q, q.y2_dc.q, q.y2_ac.q,
                        q.uv_dc.q, q.uv_ac.q], np.int32)
        qs = np.broadcast_to(row, (B, 4, 6)).copy()
        seg = np.zeros((B, H // 16, Wd // 16), np.int32)
        tables = tuple(t.astype(np.int32) for t in _default_cost_tables())
        _, pen = _i4_config(q.y1_ac.q, 4, 0)

        def search(flag):
            monkeypatch.setattr(W, "_PALLAS_I4", flag)
            out = W.openloop_mode_search(y, u, v, seg, qs, tables,
                                         try_i4=True, i4_penalty=pen,
                                         i4_parallel=True)
            return {k: np.asarray(val) for k, val in out.items()}

        want = search("0")
        got = search("interpret")
        for k in want:
            np.testing.assert_array_equal(got[k], want[k], err_msg=k)


class TestWavefrontFixedPallas:
    """The fused fixed-mode wavefront kernel (one pallas_call runs the
    whole T-step diagonal loop with compact VMEM boundary state) must
    be bit-identical to encode_wavefront_core(modes=...) — levels AND
    recon planes — across i4/i16 mixes, segments, and the UV DC
    error-diffusion chain (interpret mode; Mosaic compiles are
    off-limits on this tunnel)."""

    def _planes(self, B, H, W, seed):
        rng = np.random.default_rng(seed)
        y = rng.integers(0, 256, (B, H, W)).astype(np.int32)
        u = rng.integers(0, 256, (B, H // 2, W // 2)).astype(np.int32)
        v = rng.integers(0, 256, (B, H // 2, W // 2)).astype(np.int32)
        return rng, y, u, v

    @pytest.mark.parametrize("derr", [False, True])
    def test_matches_xla_wavefront(self, derr):
        from gowebp_tpu.models.vp8.encoder import (
            _default_cost_tables, make_quants, quality_to_q)
        from gowebp_tpu.ops.encode_wavefront_jax import encode_wavefront_core
        from gowebp_tpu.ops.pallas.wavefront_fixed import (
            wavefront_fixed_pallas)

        B, H, W = 2, 32, 64            # non-square MB grid
        mh, mw = H // 16, W // 16
        rng, y, u, v = self._planes(B, H, W, seed=5 + derr)
        q = make_quants(quality_to_q(40.0))
        row = np.array([q.y1_dc.q, q.y1_ac.q, q.y2_dc.q, q.y2_ac.q,
                        q.uv_dc.q, q.uv_ac.q], np.int32)
        qs = np.broadcast_to(row, (B, 4, 6)).copy()
        qs[:, 1] = np.clip(qs[:, 1] * 2, 1, 255)       # segment deltas
        qs[:, 2] = np.clip(qs[:, 2] // 2, 4, None)
        seg = rng.integers(0, 4, (B, mh, mw)).astype(np.int32)
        tables = tuple(t.astype(np.int32) for t in _default_cost_tables())
        # random forced decisions: exercises i16 AND i4 paths plus all
        # 10 B-modes and 4 whole-block modes
        modes = (rng.integers(0, 4, (B, mh, mw)).astype(np.int32),
                 rng.integers(0, 4, (B, mh, mw)).astype(np.int32),
                 rng.integers(0, 2, (B, mh, mw)).astype(np.int32),
                 rng.integers(0, 10, (B, mh, mw, 16)).astype(np.int32))
        want = encode_wavefront_core(y, u, v, seg, qs, tables, try_i4=True,
                                     modes=modes, want_recon=True,
                                     use_derr=derr)
        got = wavefront_fixed_pallas(y, u, v, seg, qs, modes,
                                     use_derr=derr, want_recon=True,
                                     interpret=True)
        for k in ("y_levels", "y2_levels", "uv_levels",
                  "recon_y", "recon_u", "recon_v"):
            np.testing.assert_array_equal(
                np.asarray(want[k]), np.asarray(got[k]), err_msg=k)

    def test_wired_into_wavefront_core(self, monkeypatch):
        """GOWEBP_PALLAS_WF=interpret routes encode_wavefront_core's
        fixed-mode path through the fused kernel (the production
        phase-2 flag for pods with native Mosaic)."""
        import importlib

        from gowebp_tpu.models.vp8.encoder import (
            _default_cost_tables, make_quants, quality_to_q)
        from gowebp_tpu.ops import encode_wavefront_jax as wf

        B, H, W = 1, 32, 32
        mh, mw = H // 16, W // 16
        rng, y, u, v = self._planes(B, H, W, seed=9)
        q = make_quants(quality_to_q(75.0))
        row = np.array([q.y1_dc.q, q.y1_ac.q, q.y2_dc.q, q.y2_ac.q,
                        q.uv_dc.q, q.uv_ac.q], np.int32)
        qs = np.broadcast_to(row, (B, 4, 6)).copy()
        seg = np.zeros((B, mh, mw), np.int32)
        tables = tuple(t.astype(np.int32) for t in _default_cost_tables())
        modes = (rng.integers(0, 4, (B, mh, mw)).astype(np.int32),
                 rng.integers(0, 4, (B, mh, mw)).astype(np.int32),
                 rng.integers(0, 2, (B, mh, mw)).astype(np.int32),
                 rng.integers(0, 10, (B, mh, mw, 16)).astype(np.int32))

        def run():
            return wf.encode_wavefront_core(
                y, u, v, seg, qs, tables, try_i4=True, modes=modes)

        want = {k: np.asarray(val) for k, val in run().items()}
        monkeypatch.setattr(wf, "_PALLAS_WF", "interpret")
        # the gate is read at trace time: drop the cached trace
        wf.encode_wavefront_core.clear_cache()
        got = run()
        for k in ("y_levels", "y2_levels", "uv_levels"):
            np.testing.assert_array_equal(want[k], np.asarray(got[k]),
                                          err_msg=k)
