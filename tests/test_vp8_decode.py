"""VP8 lossy decoder conformance: bit-exact vs libwebp (via Pillow)."""

import numpy as np
import pytest

from gowebp_tpu import decode_rgba

from util import make_test_images, pil_decode_rgba, pil_encode_lossy

IMAGES = make_test_images()


def check(arr, **kw):
    data = pil_encode_lossy(arr, **kw)
    ours = decode_rgba(data)
    golden = pil_decode_rgba(data)
    np.testing.assert_array_equal(ours, golden)


@pytest.mark.parametrize("quality", [5, 50, 95])
def test_photo_qualities(quality):
    check(IMAGES["photo"][..., :3].copy(), quality=quality)


def test_gradient():
    check(IMAGES["gradient"][..., :3].copy(), quality=75)


def test_odd_dimensions():
    check(IMAGES["photo"][:121, :99, :3].copy(), quality=70)


def test_tiny():
    check(IMAGES["photo"][:5, :3, :3].copy(), quality=70)


def test_alpha_lossy():
    check(IMAGES["alpha_noise"], quality=70)


def test_noise_low_quality():
    check(IMAGES["noise"][..., :3].copy(), quality=20)
