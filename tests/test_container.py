"""RIFF container parse/assemble tests (Pillow files as golden input)."""

import numpy as np
import pytest

from gowebp_tpu.container import riff
from gowebp_tpu.errors import BitstreamError

from util import make_test_images, pil_encode_lossless, pil_encode_lossy


class TestParse:
    def test_lossless_features(self):
        img = make_test_images()["gradient"]
        data = pil_encode_lossless(img)
        f = riff.get_features(data)
        assert (f.width, f.height) == (48, 64)
        assert f.format == "lossless"

    def test_lossy_features(self):
        img = make_test_images()["photo"][..., :3].copy()
        data = pil_encode_lossy(img)
        f = riff.get_features(data)
        assert (f.width, f.height) == (128, 128)
        assert f.format == "lossy"
        assert not f.has_alpha

    def test_lossy_alpha_features(self):
        img = make_test_images()["alpha_noise"]
        data = pil_encode_lossy(img)
        f = riff.get_features(data)
        assert f.has_alpha

    def test_reject_garbage(self):
        with pytest.raises(BitstreamError):
            riff.parse_riff(b"RIFFxxxxJUNK" + b"\x00" * 100)

    def test_roundtrip_assembly(self):
        img = make_test_images()["solid"]
        data = pil_encode_lossless(img)
        parsed = riff.parse_riff(data)
        rebuilt = riff.assemble(parsed.chunks)
        assert rebuilt == data

    def test_vp8x_build(self):
        c = riff.build_vp8x(1920, 1080, has_alpha=True)
        assert len(c.payload) == 10
        blob = riff.assemble([c])
        parsed = riff.parse_riff(blob)
        assert parsed.canvas_width == 1920
        assert parsed.canvas_height == 1080
        assert parsed.vp8x_flags & 0x10
