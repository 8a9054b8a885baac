"""JAX plane-engine correctness: vs NumPy golden refs + sharded vs single."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gowebp_tpu.models.vp8 import dsp_np
from gowebp_tpu.ops import dct_jax
from gowebp_tpu.ops.encode_plane_jax import encode_plane_core

RNG = np.random.default_rng(42)


class TestTransforms:
    def test_fdct(self):
        blk = RNG.integers(-255, 256, (64, 4, 4))
        got = np.asarray(dct_jax.fdct4x4(jnp.array(blk, jnp.int32)))
        ref = np.stack([dsp_np.fdct4x4(b).reshape(4, 4) for b in blk])
        np.testing.assert_array_equal(got, ref)

    def test_idct_matches_scalar(self):
        cf = RNG.integers(-2048, 2048, (64, 4, 4))
        got = np.clip(128 + np.asarray(dct_jax.idct4x4(jnp.array(cf, jnp.int32))), 0, 255)
        for i in range(64):
            d = np.full((4, 4), 128, np.int64)
            dsp_np.idct4x4_add(cf[i].reshape(16).astype(np.int32), d)
            np.testing.assert_array_equal(got[i], d)

    def test_wht_pair(self):
        cf = RNG.integers(-2048, 2048, (16, 4, 4))
        f = np.asarray(dct_jax.fwht4x4(jnp.array(cf, jnp.int32)))
        fref = np.stack([dsp_np.fwht4x4(c.reshape(16)).reshape(4, 4) for c in cf])
        np.testing.assert_array_equal(f, fref)
        inv = np.asarray(dct_jax.iwht4x4(jnp.array(cf, jnp.int32)))
        iref = np.stack(
            [dsp_np.iwht4x4(c.reshape(16).astype(np.int32)).reshape(4, 4) for c in cf]
        )
        np.testing.assert_array_equal(inv, iref)

    def test_quant_dequant(self):
        cf = RNG.integers(-4000, 4000, (32, 4, 4))
        levels = np.asarray(
            dct_jax.quantize(jnp.array(cf, jnp.int32), (1 << 17) // 8,
                             96 << 9, (1 << 17) // 17, 110 << 9)
        )
        assert levels.shape == (32, 16)
        deq = np.asarray(dct_jax.dequantize(jnp.array(levels), 8, 17))
        assert deq.shape == (32, 4, 4)
        # Quantize→dequantize error bounded by the step.
        from gowebp_tpu.models.vp8.tables import ZIGZAG

        for i in range(32):
            for n in range(16):
                q = 8 if n == 0 else 17
                v = cf[i].reshape(16)[ZIGZAG[n]]
                lvl = levels[i, n]
                if abs(lvl) < 2047:
                    assert abs(lvl * q - v) <= q


QUANTS = dict(y1_dc=20, y1_ac=25, y2_dc=40, y2_ac=38, uv_dc=20, uv_ac=25)


class TestShardedEquivalence:
    def test_sharded_matches_single(self):
        from gowebp_tpu.parallel.mesh import batch_sharding, make_mesh
        from gowebp_tpu.parallel.shard import sharded_encode_plane_step

        B, H, W = 2, 32, 32 * 4
        y = RNG.integers(0, 256, (B, H, W)).astype(np.int32)
        u = RNG.integers(0, 256, (B, H // 2, W // 2)).astype(np.int32)
        v = RNG.integers(0, 256, (B, H // 2, W // 2)).astype(np.int32)

        single = jax.jit(lambda a, b, c: encode_plane_core(a, b, c, **QUANTS))(
            y, u, v
        )
        mesh = make_mesh(8, data=2, tile=4)
        sharding = batch_sharding(mesh)
        ys = jax.device_put(y, sharding)
        us = jax.device_put(u, sharding)
        vs = jax.device_put(v, sharding)
        sharded = sharded_encode_plane_step(mesh, ys, us, vs, quants=QUANTS)
        for k in single:
            np.testing.assert_array_equal(
                np.asarray(single[k]), np.asarray(sharded[k]), err_msg=k
            )


class TestOpenLoopStreamValidity:
    def test_jax_backend_stream_decodes(self):
        import sys

        sys.path.insert(0, "tests")
        from util import pil_decode_rgba

        from gowebp_tpu import decode_rgba
        from gowebp_tpu.config import EncoderConfig
        from gowebp_tpu.encode import encode_rgba

        img = RNG.integers(0, 256, (48, 80, 3), dtype=np.uint8)
        cfg = EncoderConfig(lossless=False, quality=75, plane_backend="jax")
        data = encode_rgba(img, config=cfg)
        ours = decode_rgba(data)
        np.testing.assert_array_equal(ours, pil_decode_rgba(data))
