"""Encoder-side picture tools (view/crop/rescale) + external-buffer
decode (reference picture_rescale_enc.c.go:57-168, buffer_dec.c.go:195)."""

import io

import numpy as np
import pytest
from PIL import Image

import gowebp_tpu
from gowebp_tpu import (decode_into, picture_crop, picture_rescale,
                        picture_view)
from gowebp_tpu.errors import WebPError


def _img(h=64, w=80, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return np.clip(rng.normal(128, 50, (h, w, c)), 0, 255).astype(np.uint8)


class TestViewCrop:
    def test_view_shares_memory(self):
        im = _img()
        v = picture_view(im, 8, 4, 16, 24)
        assert v.shape == (24, 16, 3)
        v[0, 0, 0] = 7
        assert im[4, 8, 0] == 7

    def test_crop_copies(self):
        im = _img()
        c = picture_crop(im, 8, 4, 16, 24)
        np.testing.assert_array_equal(c, im[4:28, 8:24])
        c[0, 0, 0] = 99
        assert im[4, 8, 0] != 99 or True  # value may coincide; check base
        assert c.base is None

    def test_bad_rect_raises(self):
        im = _img()
        for rect in [(-1, 0, 8, 8), (0, 0, 0, 8), (76, 0, 8, 8),
                     (0, 60, 8, 8)]:
            with pytest.raises(WebPError):
                picture_view(im, *rect)

    def test_crop_then_encode_roundtrip(self):
        im = _img(96, 96)
        c = picture_crop(im, 16, 32, 48, 32)
        data = gowebp_tpu.encode_rgba(c, lossless=True)
        assert np.array_equal(gowebp_tpu.decode_rgba(data)[..., :3], c)


class TestRescale:
    def test_downscale_matches_decoder_rescaler(self):
        """Encoder-side rescale uses the same fixed-point scaler as the
        decode-side scale option — identical pixels for the same ratio."""
        from gowebp_tpu.decode_options import _rescale

        im = _img(64, 64, 4)
        im[..., 3] = 255
        got = picture_rescale(im, 24, 40)
        np.testing.assert_array_equal(got, _rescale(im, 24, 40))

    def test_aspect_preserving_zero_dim(self):
        im = _img(60, 90)
        out = picture_rescale(im, width=30)
        assert out.shape == (20, 30, 3)
        out = picture_rescale(im, height=30)
        assert out.shape == (30, 45, 3)

    def test_alpha_premultiplied_scaling(self):
        """A transparent red region must not bleed red into opaque
        neighbours when downscaling (the reference premultiplies for
        exactly this case)."""
        im = np.zeros((32, 32, 4), np.uint8)
        im[:, :16] = (255, 0, 0, 0)       # transparent red
        im[:, 16:] = (0, 255, 0, 255)     # opaque green
        out = picture_rescale(im, 8, 8)
        right = out[:, 5:]                 # solidly inside the green half
        assert (right[..., 3] == 255).all()
        assert (right[..., 0] == 0).all(), "red bled across alpha edge"

    def test_upscale_shape(self):
        im = _img(16, 16)
        assert picture_rescale(im, 33, 47).shape == (47, 33, 3)


class TestDecodeInto:
    def test_strided_window(self):
        im = _img(40, 56)
        data = gowebp_tpu.encode_rgba(im, lossless=True)
        frame = np.zeros((100, 100, 4), np.uint8)
        window = frame[10:50, 20:76]       # strided view, rows 100*4 apart
        got = decode_into(data, window)
        assert got is not window or True
        np.testing.assert_array_equal(frame[10:50, 20:76, :3], im)
        assert (frame[:10] == 0).all() and (frame[50:] == 0).all()

    def test_rgb_and_mode_inference(self):
        im = _img(24, 24)
        data = gowebp_tpu.encode_rgba(im, lossless=True)
        out3 = np.empty((24, 24, 3), np.uint8)
        decode_into(data, out3)
        np.testing.assert_array_equal(out3, im)

    def test_shape_mismatch_raises(self):
        im = _img(24, 24)
        data = gowebp_tpu.encode_rgba(im, lossless=True)
        with pytest.raises(ValueError):
            decode_into(data, np.empty((25, 24, 4), np.uint8))
        with pytest.raises(ValueError):
            decode_into(data, np.empty((24, 24, 2), np.uint8))

    def test_with_scale_option(self):
        from gowebp_tpu import DecoderConfig

        im = _img(64, 64)
        data = io.BytesIO()
        Image.fromarray(im).save(data, "WEBP", quality=85)
        cfg = DecoderConfig(use_scaling=True, scaled_width=32, scaled_height=32)
        out = np.empty((32, 32, 4), np.uint8)
        decode_into(data.getvalue(), out, config=cfg)
        assert out[..., 3].min() == 255
