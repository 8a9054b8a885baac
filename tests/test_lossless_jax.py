"""JAX VP8L transform ops vs NumPy golden references."""

import numpy as np
import jax.numpy as jnp

from gowebp_tpu.models.vp8l import transforms_np as tnp
from gowebp_tpu.ops import lossless_jax as lj

RNG = np.random.default_rng(77)


def rand_argb(h, w):
    return RNG.integers(0, 2**32, (h, w), dtype=np.uint64).astype(np.uint32)


class TestElementwise:
    def test_green(self):
        x = rand_argb(16, 23)
        np.testing.assert_array_equal(
            np.asarray(lj.add_green_inverse(jnp.array(x))),
            tnp.add_green_inverse(x),
        )
        np.testing.assert_array_equal(
            np.asarray(lj.subtract_green_forward(jnp.array(x))),
            tnp.subtract_green_forward(x),
        )

    def test_color_transform(self):
        x = rand_argb(19, 31)
        timg = rand_argb(5, 8)
        bits = 2
        np.testing.assert_array_equal(
            np.asarray(lj.color_transform_inverse(jnp.array(x), jnp.array(timg), bits)),
            tnp.color_transform_inverse(x, timg, bits),
        )
        np.testing.assert_array_equal(
            np.asarray(lj.color_transform_forward(jnp.array(x), jnp.array(timg), bits)),
            tnp.color_transform_forward(x, timg, bits),
        )


class TestPredictors:
    def test_predict_plane_matches_encoder(self):
        from gowebp_tpu.models.vp8l import encoder as E

        x = rand_argb(17, 21)
        for mode in range(14):
            ref = E._predict_plane(x, mode)
            got = np.asarray(lj.predict_plane(jnp.array(x), mode))
            np.testing.assert_array_equal(got, ref, err_msg=f"mode {mode}")

    def test_search_and_inverse_roundtrip(self):
        x = rand_argb(33, 29)
        bits = 3
        mode_img, residual = lj.predictor_search(jnp.array(x), bits)
        back = tnp.predictor_inverse(
            np.asarray(residual), np.asarray(mode_img), bits
        )
        np.testing.assert_array_equal(back, x)

    def test_jax_inverse_matches_numpy(self):
        x = rand_argb(25, 18)
        bits = 2
        th = tnp.subsample_size(25, bits)
        tw = tnp.subsample_size(18, bits)
        modes = RNG.integers(0, 14, (th, tw)).astype(np.uint32)
        mode_img = (0xFF000000 | (modes << 8)).astype(np.uint32)
        residual = tnp.predictor_forward(x, mode_img, bits)
        ref = tnp.predictor_inverse(residual, mode_img, bits)
        np.testing.assert_array_equal(ref, x)  # sanity: np fwd/inv agree
        got = np.asarray(
            lj.predictor_inverse(jnp.array(residual), jnp.array(mode_img), bits)
        )
        np.testing.assert_array_equal(got, x)
