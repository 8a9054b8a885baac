"""VP8 lossy encoder: valid streams (libwebp oracle) + PSNR parity."""

import numpy as np
import pytest

from gowebp_tpu import decode_rgba
from gowebp_tpu.encode import encode_rgba

from util import (
    make_test_images,
    pil_decode_rgba,
    pil_encode_lossy,
)

IMAGES = make_test_images()


def psnr(a, b):
    mse = ((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2).mean()
    return 10 * np.log10(255**2 / max(mse, 1e-9))


@pytest.mark.parametrize("quality", [20, 50, 75, 95])
def test_photo_stream_validity_and_quality(quality):
    img = IMAGES["photo"][..., :3].copy()
    data = encode_rgba(img, lossless=False, quality=quality)
    ours = decode_rgba(data)
    golden = pil_decode_rgba(data)
    # Our decode and libwebp's decode of our stream agree bit-exactly.
    np.testing.assert_array_equal(ours, golden)
    # Quality parity: PSNR within 1 dB of libwebp at the same quality
    # setting while being no larger than 1.2x its size.
    p = psnr(golden[..., :3], img)
    lw = pil_encode_lossy(img, quality=quality)
    plw = psnr(pil_decode_rgba(lw)[..., :3], img)
    assert p > plw - 1.0, f"PSNR {p:.2f} vs libwebp {plw:.2f}"
    assert len(data) < 1.2 * len(lw), f"size {len(data)} vs libwebp {len(lw)}"


def test_odd_dimensions():
    img = IMAGES["photo"][:77, :51, :3].copy()
    data = encode_rgba(img, lossless=False, quality=70)
    np.testing.assert_array_equal(decode_rgba(data), pil_decode_rgba(data))


def test_tiny():
    img = IMAGES["photo"][:8, :10, :3].copy()
    data = encode_rgba(img, lossless=False, quality=70)
    np.testing.assert_array_equal(decode_rgba(data), pil_decode_rgba(data))


def test_alpha_roundtrip():
    img = IMAGES["alpha_noise"].copy()
    data = encode_rgba(img, lossless=False, quality=80)
    ours = decode_rgba(data)
    np.testing.assert_array_equal(ours, pil_decode_rgba(data))
    # Alpha is losslessly coded.
    np.testing.assert_array_equal(ours[..., 3], img[..., 3])


def test_flat_image_skips():
    img = np.full((64, 64, 3), 128, np.uint8)
    data = encode_rgba(img, lossless=False, quality=75)
    assert len(data) < 200  # skip flags make flat images tiny
    np.testing.assert_array_equal(decode_rgba(data), pil_decode_rgba(data))
