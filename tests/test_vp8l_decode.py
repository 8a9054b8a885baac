"""VP8L lossless decoder conformance: bit-exact vs libwebp (via Pillow)."""

import numpy as np
import pytest

from gowebp_tpu import decode_rgba
from gowebp_tpu.models.vp8l.decoder import DIST_MAP, plane_code_to_distance

from util import make_test_images, pil_decode_rgba, pil_encode_lossless

IMAGES = make_test_images()


class TestDistMap:
    def test_first_entries(self):
        assert DIST_MAP[0] == (0, 1)
        assert DIST_MAP[1] == (1, 0)
        assert DIST_MAP[2] == (1, 1)
        assert DIST_MAP[3] == (-1, 1)
        assert DIST_MAP[4] == (0, 2)
        assert DIST_MAP[5] == (2, 0)
        assert DIST_MAP[119] == (8, 7)

    def test_far_codes(self):
        assert plane_code_to_distance(100, 121) == 1
        assert plane_code_to_distance(100, 200) == 80

    def test_near_clamp(self):
        # (-1, 0)-ish mappings must clamp to >= 1.
        assert plane_code_to_distance(1, 4) >= 1  # (-1,1) at width 1


@pytest.mark.parametrize("name", list(IMAGES.keys()))
@pytest.mark.parametrize("quality", [0, 50, 100])
def test_bit_exact_vs_libwebp(name, quality):
    img = IMAGES[name]
    data = pil_encode_lossless(img, quality=quality)
    ours = decode_rgba(data)
    golden = pil_decode_rgba(data)
    np.testing.assert_array_equal(ours, golden)
    # Lossless: must equal the original pixels too.
    np.testing.assert_array_equal(ours, img)
