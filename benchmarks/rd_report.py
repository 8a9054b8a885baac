"""RD comparison vs libwebp (via Pillow) on a deterministic corpus.

Usage: python benchmarks/rd_report.py [--quick]

Prints, per image and quality: bytes and RGB-PSNR for libwebp and for
gowebp_tpu, plus encode wall time.  All images are synthesized with a
fixed seed so results are reproducible anywhere.
"""

from __future__ import annotations

import io
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from PIL import Image  # noqa: E402

from gowebp_tpu import decode_rgba, encode_rgba  # noqa: E402


def corpus(size: int = 512) -> dict:
    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:size, 0:size]
    imgs = {}
    ph = np.zeros((size, size, 3), np.uint8)
    ph[..., 0] = (np.sin(xx / 31) * 80 + 130
                  + rng.normal(0, 6, (size, size))).clip(0, 255)
    ph[..., 1] = (np.cos(yy / 43) * 70 + 120
                  + rng.normal(0, 6, (size, size))).clip(0, 255)
    ph[..., 2] = (((xx + yy) / 4) % 190 + 30).clip(0, 255)
    imgs["photo"] = ph
    g = np.full((size, size, 3), 245, np.uint8)
    for _ in range(60):
        x, y = rng.integers(0, size - 52, 2)
        w_, h_ = rng.integers(10, 50, 2)
        g[y : y + h_, x : x + w_] = rng.integers(0, 255, 3)
    for i in range(0, size, 17):
        g[i : i + 2, :] = 10
    imgs["graphics"] = g
    s = np.full((size, size, 3), 255, np.uint8)
    s[::7, :] = (40, 40, 200)
    s[:, ::11] = (0, 0, 0)
    imgs["screen"] = s
    grad = np.zeros((size, size, 3), np.uint8)
    grad[..., 0] = (xx * 3) % 256
    grad[..., 1] = (yy * 2) % 256
    grad[..., 2] = ((xx + yy)) % 256
    imgs["gradient"] = grad
    return imgs


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255 ** 2 / mse) if mse else 99.0


def main() -> None:
    quick = "--quick" in sys.argv
    qualities = (50, 75) if quick else (30, 50, 75, 90)
    imgs = corpus(256 if quick else 512)

    print(f"{'image':9s} {'q':>3s} | {'libwebp':>9s} {'psnr':>6s} {'ms':>5s}"
          f" | {'ours':>9s} {'psnr':>6s} {'ms':>5s} | ratio")
    for name, arr in imgs.items():
        rgba = np.dstack([arr, np.full(arr.shape[:2], 255, np.uint8)])
        for q in qualities:
            t = time.perf_counter()
            b = io.BytesIO()
            Image.fromarray(arr).save(b, "WEBP", quality=q)
            t_lw = (time.perf_counter() - t) * 1000
            lw = b.getvalue()
            lw_dec = np.asarray(Image.open(io.BytesIO(lw)).convert("RGB"))
            t = time.perf_counter()
            ours = encode_rgba(rgba, quality=q, lossless=False)
            t_us = (time.perf_counter() - t) * 1000
            ours_dec = decode_rgba(ours)[..., :3]
            print(f"{name:9s} {q:3d} | {len(lw):9d} {psnr(arr, lw_dec):6.2f}"
                  f" {t_lw:5.0f} | {len(ours):9d} {psnr(arr, ours_dec):6.2f}"
                  f" {t_us:5.0f} | {len(ours) / len(lw):5.3f}")
        # lossless
        t = time.perf_counter()
        b = io.BytesIO()
        Image.fromarray(arr).save(b, "WEBP", lossless=True, quality=75)
        t_lw = (time.perf_counter() - t) * 1000
        t = time.perf_counter()
        ours = encode_rgba(rgba, lossless=True, quality=75)
        t_us = (time.perf_counter() - t) * 1000
        assert np.array_equal(decode_rgba(ours)[..., :3], arr)
        print(f"{name:9s}  LL | {len(b.getvalue()):9d} {'inf':>6s} {t_lw:5.0f}"
              f" | {len(ours):9d} {'inf':>6s} {t_us:5.0f}"
              f" | {len(ours) / len(b.getvalue()):5.3f}")


if __name__ == "__main__":
    main()
