"""Every accepted encoder knob changes behavior (VERDICT r1 item 9).

Feature parity targets: preprocessing (webp_encoding.go:51-67,
analysis_enc.c.go:220), partition_limit (webp_encoder.go:82-98),
emulate_jpeg_size (quant_enc.c.go:215-232,285), image_hint
(vp8l_encoder.go EncoderAnalyze), low_memory (webp_encoder.go:106-111).
"""

import numpy as np
import pytest

from gowebp_tpu.config import EncoderConfig, ImageHint
from gowebp_tpu.decode import decode_rgba
from gowebp_tpu.encode import encode_rgba

def _img(n=96):
    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:n, 0:n]
    img = np.stack([
        np.clip(120 + 60 * np.sin(xx / 9) + rng.integers(-6, 7, (n, n)),
                0, 255),
        np.clip(100 + 70 * np.cos(yy / 13) + rng.integers(-6, 7, (n, n)),
                0, 255),
        np.clip(90 + 50 * np.sin((xx + yy) / 17), 0, 255),
    ], -1).astype(np.uint8)
    return img


def _enc(img, **kw):
    return encode_rgba(img, config=EncoderConfig(lossless=False,
                                                 quality=75.0, **kw))


def test_preprocessing_dither_changes_output_and_decodes():
    img = _img()
    base = _enc(img)
    dith = _enc(img, preprocessing=2)
    assert dith != base
    out = decode_rgba(dith)
    assert out.shape == (96, 96, 4)
    # Deterministic: same input → same dithered stream.
    assert _enc(img, preprocessing=2) == dith


def test_preprocessing_segment_smooth_runs():
    img = _img(128)
    out = _enc(img, preprocessing=1, segments=4)
    assert decode_rgba(out).shape == (128, 128, 4)


def test_partition_limit_suppresses_i4():
    from gowebp_tpu.stats import EncodeStats

    img = _img(128)
    s0, s100 = EncodeStats(), EncodeStats()
    encode_rgba(img, config=EncoderConfig(lossless=False, quality=75.0,
                                          method=4), stats=s0)
    encode_rgba(img, config=EncoderConfig(lossless=False, quality=75.0,
                                          method=4, partition_limit=100),
                stats=s100)
    assert s100.block_count_i4 == 0
    # Mid values scale the i4 penalty monotonically.
    s50 = EncodeStats()
    encode_rgba(img, config=EncoderConfig(lossless=False, quality=75.0,
                                          method=4, partition_limit=50),
                stats=s50)
    assert s50.block_count_i4 <= s0.block_count_i4


@pytest.mark.parametrize("plim", [90, 95, 99])
def test_partition_limit_high_values_bit_identical_jax(plim):
    """ADVICE r2 (medium): the quadratically scaled i4 penalty must stay
    inside _mul_shr16's int32-exact domain (< 2^19) so the JAX wavefront
    and native host encoders agree at extreme partition_limit values."""
    img = _img(96)
    host = encode_rgba(img, config=EncoderConfig(
        lossless=False, quality=75.0, method=4, partition_limit=plim))
    jaxb = encode_rgba(img, config=EncoderConfig(
        lossless=False, quality=75.0, method=4, partition_limit=plim,
        plane_backend="jax"))
    assert host == jaxb
    # Very low quality + plim=99 previously overflowed at trace time.
    lowq = encode_rgba(img, config=EncoderConfig(
        lossless=False, quality=1.0, method=4, partition_limit=99,
        plane_backend="jax"))
    assert decode_rgba(lowq).shape == (96, 96, 4)


def test_emulate_jpeg_size_changes_quantizer():
    from gowebp_tpu.stats import EncodeStats

    img = _img()
    a, b = EncodeStats(), EncodeStats()
    encode_rgba(img, config=EncoderConfig(lossless=False, quality=60.0),
                stats=a)
    encode_rgba(img, config=EncoderConfig(lossless=False, quality=60.0,
                                          emulate_jpeg_size=True), stats=b)
    assert a.quantizer != b.quantizer
    assert decode_rgba(encode_rgba(
        img, config=EncoderConfig(lossless=False, quality=60.0,
                                  emulate_jpeg_size=True))).shape[2] == 4


def test_low_memory_still_valid_at_method6():
    img = _img()
    cfg = EncoderConfig(lossless=False, quality=80.0, method=6,
                        autofilter=True, low_memory=True)
    data = encode_rgba(img, config=cfg)
    assert decode_rgba(data).shape == (96, 96, 4)


@pytest.mark.parametrize("hint", [ImageHint.PHOTO, ImageHint.GRAPH])
def test_image_hint_lossless_roundtrips(hint):
    rng = np.random.default_rng(4)
    pal = rng.integers(0, 256, (80, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 80, (64, 64))]
    data = encode_rgba(img, config=EncoderConfig(lossless=True,
                                                 quality=80.0,
                                                 image_hint=hint))
    assert np.array_equal(decode_rgba(data)[..., :3], img)


def test_segment_stats_arrays():
    from gowebp_tpu.stats import EncodeStats

    img = _img(160)
    st = EncodeStats()
    encode_rgba(img, config=EncoderConfig(lossless=False, quality=75.0,
                                          segments=4), stats=st)
    total = (160 // 16) ** 2
    assert sum(st.segment_block_i4) + sum(st.segment_block_i16) == total
    assert len(st.segment_quant) == 4
