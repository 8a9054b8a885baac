"""Sharded decode-recon and VP8L inverse on the 8-device virtual mesh.

Complements test_jax_ops's sharded-encode check (VERDICT r1 item 7:
scale-out beyond one step).  All runs are bit-exactness checks against
the host decoder / the unsharded exact kernels.
"""

import numpy as np

from gowebp_tpu.config import EncoderConfig
from gowebp_tpu.constants import CHUNK_VP8
from gowebp_tpu.container.riff import parse_riff
from gowebp_tpu.encode import encode_rgba
from gowebp_tpu.parallel.mesh import make_mesh


def test_sharded_recon_matches_host_decoder():
    from gowebp_tpu.models.vp8.decoder import (decode_vp8_symbols,
                                               decode_vp8_yuv,
                                               vp8_filter_params)
    from gowebp_tpu.parallel.shard import sharded_recon_step

    rng = np.random.default_rng(11)
    h = w = 64
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([
        np.clip(120 + 60 * np.sin(xx / 7) + rng.integers(-8, 9, (h, w)),
                0, 255),
        np.clip(100 + 70 * np.cos(yy / 9), 0, 255),
        (xx * 3 + yy * 2) % 256,
    ], -1).astype(np.uint8)
    data = encode_rgba(img, config=EncoderConfig(lossless=False,
                                                 quality=80.0, method=4))
    payload = parse_riff(data).find(CHUNK_VP8).payload
    st, coeffs, modes = decode_vp8_symbols(payload)
    fps = vp8_filter_params(st, modes)

    mesh = make_mesh(8, data=2, tile=4)
    B = 8
    cb = np.broadcast_to(coeffs, (B,) + coeffs.shape).copy()
    mb = np.broadcast_to(modes, (B,) + modes.shape).copy()
    fb = np.broadcast_to(fps, (B,) + fps.shape).copy()
    Y, U, V = sharded_recon_step(
        mesh, cb, mb[:, :, 0].astype(np.int32),
        mb[:, :, 5:21].astype(np.int32), mb[:, :, 1].astype(np.int32),
        fb, mb_w=st.mb_w, mb_h=st.mb_h, filter_type=st.filter_type)
    hy, hu, hv = decode_vp8_yuv(payload)
    Yn, Un, Vn = np.asarray(Y), np.asarray(U), np.asarray(V)
    for k in range(B):
        np.testing.assert_array_equal(
            Yn[k][: hy.shape[0], : hy.shape[1]], hy)
        np.testing.assert_array_equal(
            Un[k][: hu.shape[0], : hu.shape[1]], hu)
        np.testing.assert_array_equal(
            Vn[k][: hv.shape[0], : hv.shape[1]], hv)


def test_sharded_vp8l_inverse_matches_unsharded():
    from gowebp_tpu.ops.lossless_jax import (add_green_inverse,
                                             predictor_inverse)
    from gowebp_tpu.parallel.shard import sharded_lossless_inverse

    rng = np.random.default_rng(3)
    B, h, w, bits = 8, 24, 40, 4
    res = rng.integers(0, 1 << 32, (B, h, w), dtype=np.uint32)
    th = (h + (1 << bits) - 1) >> bits
    tw = (w + (1 << bits) - 1) >> bits
    modes = (0xFF000000
             | (rng.integers(0, 14, (th, tw), dtype=np.uint32) << 8))
    mesh = make_mesh(8, data=4, tile=2)
    got = np.asarray(sharded_lossless_inverse(mesh, res, modes, bits=bits))
    for k in range(B):
        want = np.asarray(add_green_inverse(
            predictor_inverse(res[k], modes, bits)))
        np.testing.assert_array_equal(got[k], want)
