"""Exact closed-loop TPU wavefront encoder: equality + stream validity."""

import numpy as np

from gowebp_tpu import decode_rgba
from gowebp_tpu.config import EncoderConfig
from gowebp_tpu.encode import encode_rgba

from util import make_test_images, pil_decode_rgba

RNG = np.random.default_rng(21)


def test_wavefront_equals_sequential():
    from gowebp_tpu.models.vp8.encoder import (
        _encode_frame_dense_native,
        make_quants,
    )
    from gowebp_tpu.ops.encode_wavefront_jax import encode_wavefront

    B, H, W = 2, 48, 80
    y = RNG.integers(0, 256, (B, H, W)).astype(np.int32)
    u = RNG.integers(0, 256, (B, H // 2, W // 2)).astype(np.int32)
    v = RNG.integers(0, 256, (B, H // 2, W // 2)).astype(np.int32)
    q = make_quants(40)
    out = encode_wavefront(
        y, u, v,
        y1_dc=q.y1_dc.q, y1_ac=q.y1_ac.q, y2_dc=q.y2_dc.q,
        y2_ac=q.y2_ac.q, uv_dc=q.uv_dc.q, uv_ac=q.uv_ac.q,
    )
    for b in range(B):
        nat = _encode_frame_dense_native(y[b], u[b], v[b], W // 16, H // 16,
                                         q, method=0)
        if nat is None:  # no native lib: nothing to compare against
            return
        for key, nk in (("ymode", "ymode"), ("uvmode", "uvmode"),
                        ("y2_levels", "y2"), ("y_levels", "yl"),
                        ("uv_levels", "uvl")):
            got = np.asarray(out[key][b]).reshape(np.asarray(nat[nk]).shape)
            np.testing.assert_array_equal(got, np.asarray(nat[nk]),
                                          err_msg=f"img {b} {key}")


def test_wavefront_stream_matches_host_encoder():
    img = make_test_images()["photo"][..., :3].copy()
    # The wavefront backend must produce the same file as the host
    # closed-loop encoder in its i16 configuration.
    host = encode_rgba(
        img, config=EncoderConfig(lossless=False, quality=70, method=0,
                                  segments=1)
    )
    wave = encode_rgba(
        img, config=EncoderConfig(lossless=False, quality=70, method=0,
                                  segments=1, plane_backend="jax")
    )
    assert host == wave
    np.testing.assert_array_equal(decode_rgba(wave), pil_decode_rgba(wave))
