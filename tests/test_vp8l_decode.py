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


class TestNativeGroupParse:
    """wtpu_vp8l_read_groups (round 4): the native code-length parser
    must consume bit-identically to the Python reference and fail
    typed, never crash, on corrupt headers."""

    def _payload(self, seed=3):
        import io

        from PIL import Image

        from gowebp_tpu.constants import CHUNK_VP8L
        from gowebp_tpu.container.riff import parse_riff

        rng = np.random.default_rng(seed)
        img = np.clip(rng.normal(128, 50, (96, 120, 3)), 0,
                      255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "WEBP", lossless=True)
        return parse_riff(buf.getvalue()).find(CHUNK_VP8L).payload

    def test_matches_python_parse(self):
        import gowebp_tpu.models.vp8l.decoder as D

        p = self._payload()
        want = D.decode_vp8l(p)
        orig = D._read_prefix_groups_native
        try:
            D._read_prefix_groups_native = lambda *a, **k: None
            got = D.decode_vp8l(p)
        finally:
            D._read_prefix_groups_native = orig
        np.testing.assert_array_equal(want, got)

    def test_corrupt_headers_fail_typed(self):
        import gowebp_tpu.models.vp8l.decoder as D
        from gowebp_tpu.errors import WebPError

        p = self._payload(seed=9)
        rng = np.random.default_rng(5)
        # the prefix-code section sits early in the stream: hammer the
        # first 200 bytes where the parser runs
        buf = bytearray(p)
        for _ in range(200):
            i = int(rng.integers(5, min(200, len(buf))))
            old = buf[i]
            buf[i] = int(rng.integers(0, 256))
            try:
                out = D.decode_vp8l(bytes(buf))
                assert isinstance(out, np.ndarray)
            except WebPError:
                pass
            buf[i] = old
