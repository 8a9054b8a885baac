"""JAX YUV/upsample ops vs NumPy golden refs + batch decode equivalence."""

import numpy as np
import jax.numpy as jnp

from gowebp_tpu.ops import yuv_jax, yuv_np

from util import make_test_images, pil_encode_lossy

RNG = np.random.default_rng(31)


class TestOps:
    def test_yuv_to_rgb(self):
        y = RNG.integers(0, 256, (3, 24, 31))
        u = RNG.integers(0, 256, (3, 24, 31))
        v = RNG.integers(0, 256, (3, 24, 31))
        got = np.asarray(yuv_jax.yuv_to_rgb(jnp.array(y), jnp.array(u), jnp.array(v)))
        for b in range(3):
            ref = yuv_np.yuv_to_rgb(y[b], u[b], v[b])
            np.testing.assert_array_equal(got[b], ref)

    def test_fancy_upsample(self):
        for h, w in ((24, 31), (25, 32), (17, 17), (2, 2)):
            h2, w2 = (h + 1) // 2, (w + 1) // 2
            ch = RNG.integers(0, 256, (2, h2, w2))
            got = np.asarray(yuv_jax.fancy_upsample(jnp.array(ch), h, w))
            for b in range(2):
                ref = yuv_np.fancy_upsample(ch[b], h, w)
                np.testing.assert_array_equal(got[b], ref, err_msg=f"{h}x{w}")


class TestBatchDecode:
    def test_matches_individual(self):
        from gowebp_tpu import decode_rgba
        from gowebp_tpu.decode import decode_rgba_batch

        imgs = make_test_images()
        datas = [
            pil_encode_lossy(imgs["photo"][..., :3].copy(), quality=q)
            for q in (40, 75)
        ] + [pil_encode_lossy(imgs["gradient"][..., :3].copy(), quality=70)]
        batch = decode_rgba_batch(datas)
        for data, out in zip(datas, batch):
            np.testing.assert_array_equal(out, decode_rgba(data))
