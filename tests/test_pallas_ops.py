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
