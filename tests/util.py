"""Shared test helpers: golden-image generation via Pillow (libwebp)."""

import io

import numpy as np
from PIL import Image


def pil_encode_lossless(rgba: np.ndarray, quality: int = 75, exact: bool = True) -> bytes:
    img = Image.fromarray(rgba, "RGBA" if rgba.shape[-1] == 4 else "RGB")
    buf = io.BytesIO()
    img.save(buf, "WEBP", lossless=True, quality=quality, exact=exact)
    return buf.getvalue()


def pil_encode_lossy(arr: np.ndarray, quality: int = 75, exact: bool = False) -> bytes:
    img = Image.fromarray(arr, "RGBA" if arr.shape[-1] == 4 else "RGB")
    buf = io.BytesIO()
    img.save(buf, "WEBP", lossless=False, quality=quality, exact=exact)
    return buf.getvalue()


def pil_decode_rgba(data: bytes) -> np.ndarray:
    img = Image.open(io.BytesIO(data))
    img.load()
    return np.asarray(img.convert("RGBA"))


def make_test_images(rng=None):
    """A small corpus hitting different VP8L encoder decisions."""
    rng = rng or np.random.default_rng(1234)
    imgs = {}

    solid = np.zeros((32, 32, 4), np.uint8)
    solid[..., :] = (30, 200, 90, 255)
    imgs["solid"] = solid

    grad = np.zeros((64, 48, 4), np.uint8)
    yy, xx = np.mgrid[0:64, 0:48]
    grad[..., 0] = (xx * 5) % 256
    grad[..., 1] = (yy * 3) % 256
    grad[..., 2] = ((xx + yy) * 2) % 256
    grad[..., 3] = 255
    imgs["gradient"] = grad

    noise = rng.integers(0, 256, (40, 40, 4), dtype=np.uint8)
    noise[..., 3] = 255
    imgs["noise"] = noise

    pal = np.zeros((50, 33, 4), np.uint8)
    colors = np.array(
        [(255, 0, 0, 255), (0, 255, 0, 255), (0, 0, 255, 255), (10, 20, 30, 128)],
        np.uint8,
    )
    idx = rng.integers(0, 4, (50, 33))
    pal[:] = colors[idx]
    imgs["palette4"] = pal

    pal2 = np.zeros((31, 65, 4), np.uint8)
    idx2 = (np.mgrid[0:31, 0:65][0] + np.mgrid[0:31, 0:65][1]) % 2
    pal2[:] = np.array([(0, 0, 0, 255), (255, 255, 255, 255)], np.uint8)[idx2]
    imgs["palette2"] = pal2

    alpha = rng.integers(0, 256, (24, 56, 4), dtype=np.uint8)
    imgs["alpha_noise"] = alpha

    photo = np.zeros((128, 128, 4), np.uint8)
    yy, xx = np.mgrid[0:128, 0:128]
    base = (
        100
        + 50 * np.sin(xx / 9.0)
        + 40 * np.cos(yy / 7.0)
        + rng.normal(0, 6, (128, 128))
    )
    photo[..., 0] = np.clip(base, 0, 255)
    photo[..., 1] = np.clip(base * 0.8 + 20, 0, 255)
    photo[..., 2] = np.clip(255 - base, 0, 255)
    photo[..., 3] = 255
    imgs["photo"] = photo

    return imgs
