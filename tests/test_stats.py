"""Encoder stats + progress hooks."""

import numpy as np
import pytest

from gowebp_tpu.config import EncoderConfig
from gowebp_tpu.encode import encode_rgba
from gowebp_tpu.errors import EncodeError
from gowebp_tpu.stats import EncodeStats

from util import make_test_images

IMAGES = make_test_images()


def test_lossy_stats():
    stats = EncodeStats()
    data = encode_rgba(IMAGES["photo"][..., :3].copy(), lossless=False,
                       quality=75, stats=stats)
    assert stats.coded_size == len(data)
    total = stats.block_count_i16 + stats.block_count_i4
    assert total == 64  # 128x128 = 8x8 MBs
    assert stats.header_bytes > 0
    assert stats.residual_bytes > 0
    assert stats.quantizer > 0
    assert stats.psnr["y"] > 25


def test_lossless_stats():
    stats = EncodeStats()
    data = encode_rgba(IMAGES["gradient"], lossless=True, stats=stats)
    assert stats.coded_size == len(data)
    assert stats.lossless_size > 0
    # Subtract-green is a gated trial since the q>=75 probe landed; the
    # predictor transform is the stable marker of the photo path.
    assert "predictor" in stats.transforms


def test_palette_stats():
    stats = EncodeStats()
    encode_rgba(IMAGES["palette4"], lossless=True, stats=stats)
    assert stats.palette_size == 4
    assert "color-indexing" in stats.transforms


def test_progress_hook_runs_and_aborts():
    calls = []
    cfg = EncoderConfig(lossless=True,
                        progress_hook=lambda p: calls.append(p) or True)
    encode_rgba(IMAGES["solid"], config=cfg)
    assert 0 in calls and 100 in calls

    cfg2 = EncoderConfig(lossless=True, progress_hook=lambda p: False)
    with pytest.raises(EncodeError, match="abort"):
        encode_rgba(IMAGES["solid"], config=cfg2)


class TestBitAccounting:
    """BITTRACE analog (SURVEY.md §5.1): per-syntax-class bit counts."""

    def test_lossy_classes_cover_stream(self):
        import io
        import numpy as np
        from PIL import Image
        from gowebp_tpu.utils.bittrace import bit_accounting

        rng = np.random.default_rng(2)
        arr = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
        b = io.BytesIO()
        Image.fromarray(arr).save(b, "WEBP", quality=60)
        r = bit_accounting(b.getvalue())
        assert r["format"] == "lossy"
        c = r["classes"]
        assert c["residuals"] > c["intra_modes"] > 0
        assert 0 < sum(c.values()) <= r["total_bits"]
        assert sum(r["residuals_per_partition"]) == c["residuals"]

    def test_lossless_classes_cover_stream(self):
        import numpy as np
        from gowebp_tpu import encode_rgba
        from gowebp_tpu.utils.bittrace import bit_accounting

        rng = np.random.default_rng(3)
        arr = rng.integers(0, 4, (40, 56, 4), dtype=np.uint8) * 80
        arr[..., 3] = 255
        r = bit_accounting(encode_rgba(arr, lossless=True))
        assert r["format"] == "lossless"
        c = r["classes"]
        assert c["pixel_data"] > 0 and c["huffman_codes"] > 0
        assert 0 < sum(c.values()) <= r["total_bits"]
