"""VP8L encoder: round-trip bit-exactness + independent libwebp decode."""

import numpy as np
import pytest

from gowebp_tpu import decode_rgba
from gowebp_tpu.config import EncoderConfig
from gowebp_tpu.encode import encode_rgba

from util import make_test_images, pil_decode_rgba

IMAGES = make_test_images()


def _rgba(img):
    if img.shape[2] == 3:
        img = np.concatenate(
            [img, np.full(img.shape[:2] + (1,), 255, np.uint8)], axis=-1
        )
    return img


@pytest.mark.parametrize("name", list(IMAGES.keys()))
def test_roundtrip_and_oracle(name):
    img = _rgba(IMAGES[name])
    data = encode_rgba(img, lossless=True, config=EncoderConfig(lossless=True, exact=True))
    # Our own decoder round-trips bit-exactly.
    np.testing.assert_array_equal(decode_rgba(data), img)
    # libwebp (independent decoder) agrees.
    np.testing.assert_array_equal(pil_decode_rgba(data), img)


def test_rgb_input():
    img = IMAGES["gradient"][..., :3].copy()
    data = encode_rgba(img, lossless=True, config=EncoderConfig(lossless=True, exact=True))
    out = decode_rgba(data)
    np.testing.assert_array_equal(out[..., :3], img)
    assert (out[..., 3] == 255).all()


def test_single_pixel():
    img = np.array([[[12, 34, 56, 78]]], np.uint8)
    data = encode_rgba(img, lossless=True, config=EncoderConfig(lossless=True, exact=True))
    np.testing.assert_array_equal(decode_rgba(data), img)
    np.testing.assert_array_equal(pil_decode_rgba(data), img)


def test_single_row_and_column():
    rng = np.random.default_rng(4)
    row = rng.integers(0, 256, (1, 77, 4), dtype=np.uint8)
    col = rng.integers(0, 256, (63, 1, 4), dtype=np.uint8)
    for img in (row, col):
        data = encode_rgba(img, lossless=True, config=EncoderConfig(lossless=True, exact=True))
        np.testing.assert_array_equal(decode_rgba(data), img)
        np.testing.assert_array_equal(pil_decode_rgba(data), img)


def test_palette_sizes():
    rng = np.random.default_rng(5)
    for ncolors in (2, 3, 4, 5, 16, 17, 255):
        colors = rng.integers(0, 256, (ncolors, 4), dtype=np.uint8)
        idx = rng.integers(0, ncolors, (37, 41))
        img = colors[idx]
        data = encode_rgba(img, lossless=True, config=EncoderConfig(lossless=True, exact=True))
        np.testing.assert_array_equal(decode_rgba(data), img)
        np.testing.assert_array_equal(pil_decode_rgba(data), img)
