"""Headline benchmark: TPU dense encode-phase throughput vs libwebp.

Runs the flagship jittable step (VP8 dense encode phase: mode search +
FDCT/FWHT + quantization for every MB of a batch) on the default JAX
device (the real TPU chip under the driver) and compares against
libwebp's single-core *full* encoder (via Pillow) on the same pixels.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import io
import json
import sys
import time

import numpy as np


def make_images(batch: int, size: int) -> np.ndarray:
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:size, 0:size]
    imgs = np.zeros((batch, size, size, 3), np.uint8)
    for b in range(batch):
        imgs[b, ..., 0] = np.clip(
            110 + 70 * np.sin(xx / (13 + b)) + rng.normal(0, 8, (size, size)), 0, 255
        )
        imgs[b, ..., 1] = np.clip(
            100 + 60 * np.cos(yy / (17 + b)) + rng.normal(0, 8, (size, size)), 0, 255
        )
        imgs[b, ..., 2] = ((xx // 2 + yy // 3 + 37 * b) % 256).astype(np.uint8)
    return imgs


def libwebp_baseline_mps(img: np.ndarray) -> float:
    """Single-core libwebp full-encode megapixels/s (Pillow)."""
    from PIL import Image

    pil = Image.fromarray(img)
    # Warm-up.
    buf = io.BytesIO()
    pil.save(buf, "WEBP", quality=75, method=4)
    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        buf = io.BytesIO()
        pil.save(buf, "WEBP", quality=75, method=4)
    dt = time.perf_counter() - t0
    mp = img.shape[0] * img.shape[1] / 1e6
    return n * mp / dt


def main() -> None:
    import jax

    from gowebp_tpu.models.vp8.encoder import make_quants, quality_to_q, rgb_to_yuv420
    from gowebp_tpu.ops.encode_plane_jax import encode_plane_step

    batch, size = 8, 1024
    imgs = make_images(batch, size)

    q = make_quants(quality_to_q(75.0))
    quants = dict(
        y1_dc=q.y1_dc.q, y1_ac=q.y1_ac.q,
        y2_dc=q.y2_dc.q, y2_ac=q.y2_ac.q,
        uv_dc=q.uv_dc.q, uv_ac=q.uv_ac.q,
    )

    ys, us, vs = [], [], []
    for b in range(batch):
        y, u, v = rgb_to_yuv420(imgs[b])
        ys.append(y)
        us.append(u)
        vs.append(v)
    y = jax.device_put(np.stack(ys).astype(np.int32))
    u = jax.device_put(np.stack(us).astype(np.int32))
    v = jax.device_put(np.stack(vs).astype(np.int32))

    # Warm-up/compile.
    out = encode_plane_step(y, u, v, **quants)
    jax.block_until_ready(out)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = encode_plane_step(y, u, v, **quants)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    mps = iters * batch * size * size / 1e6 / dt

    baseline = libwebp_baseline_mps(imgs[0])
    result = {
        "metric": "vp8_dense_encode_throughput",
        "value": round(mps, 2),
        "unit": "megapixels/s",
        "vs_baseline": round(mps / baseline, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
