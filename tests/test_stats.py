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
