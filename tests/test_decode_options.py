"""Decoder options, output modes, incremental decoding, metrics."""

import numpy as np
import pytest

import gowebp_tpu
from gowebp_tpu import decode_rgba
from gowebp_tpu.config import EncoderConfig
from gowebp_tpu.decode import DecoderConfig, decode, decode_yuv
from gowebp_tpu.errors import InvalidConfig, NotEnoughData
from gowebp_tpu.idec import STATE_DONE, IncrementalDecoder
from gowebp_tpu.utils.metrics import plane_psnr, psnr, ssim

from util import make_test_images, pil_decode_rgba, pil_encode_lossy, pil_encode_lossless

IMAGES = make_test_images()
LOSSY = pil_encode_lossy(IMAGES["photo"][..., :3].copy(), quality=75)
LOSSLESS = pil_encode_lossless(IMAGES["gradient"])


class TestOptions:
    def test_modes(self):
        rgba = decode(LOSSY, mode="RGBA")
        bgra = decode(LOSSY, mode="BGRA")
        np.testing.assert_array_equal(rgba[..., 0], bgra[..., 2])
        rgb = decode(LOSSY, mode="RGB")
        assert rgb.shape[-1] == 3
        argb = decode(LOSSY, mode="ARGB")
        np.testing.assert_array_equal(argb[..., 0], rgba[..., 3])

    def test_crop(self):
        cfg = DecoderConfig(use_cropping=True, crop_left=8, crop_top=4,
                            crop_width=32, crop_height=16)
        out = decode_rgba(LOSSY, cfg)
        full = decode_rgba(LOSSY)
        np.testing.assert_array_equal(out, full[4:20, 8:40])

    def test_bad_crop_rejected(self):
        cfg = DecoderConfig(use_cropping=True, crop_left=1000, crop_top=0,
                            crop_width=200, crop_height=10)
        with pytest.raises(InvalidConfig):
            decode_rgba(LOSSY, cfg)

    def test_flip(self):
        out = decode_rgba(LOSSY, DecoderConfig(flip=True))
        np.testing.assert_array_equal(out[::-1], decode_rgba(LOSSY))

    def test_scale(self):
        cfg = DecoderConfig(use_scaling=True, scaled_width=64, scaled_height=0)
        out = decode_rgba(LOSSY, cfg)
        assert out.shape[:2] == (64, 64)  # aspect preserved (128x128 src)

    def test_bypass_filtering_and_no_fancy(self):
        a = decode_rgba(LOSSY, DecoderConfig(bypass_filtering=True))
        b = decode_rgba(LOSSY, DecoderConfig(no_fancy_upsampling=True))
        full = decode_rgba(LOSSY)
        assert a.shape == b.shape == full.shape
        # Options change the output (weakly — just ensure plumbing works).
        assert not np.array_equal(a, full) or not np.array_equal(b, full)

    def test_yuv_output(self):
        y, u, v = decode_yuv(LOSSY)
        assert y.shape == (128, 128)
        assert u.shape == (64, 64)


class TestIncremental:
    def test_chunked_lossy(self):
        dec = IncrementalDecoder()
        step = max(1, len(LOSSY) // 17)
        saw_partial = False
        for i in range(0, len(LOSSY), step):
            dec.append(LOSSY[i : i + step])
            if dec.state != STATE_DONE and dec.rows_decoded > 0:
                part = dec.get_partial_output()
                assert part is not None
                saw_partial = True
        assert dec.state == STATE_DONE
        np.testing.assert_array_equal(dec.get_output(), decode_rgba(LOSSY))
        assert saw_partial

    def test_partial_rows_match_final(self):
        dec = IncrementalDecoder()
        dec.append(LOSSY[: len(LOSSY) * 2 // 3])
        n = dec.rows_decoded
        if n > 0:
            part = dec.get_partial_output()
            full = decode_rgba(LOSSY)
            np.testing.assert_array_equal(part, full[:n])
        dec.append(LOSSY[len(LOSSY) * 2 // 3 :])
        assert dec.state == STATE_DONE

    def test_mb_granular_resume(self):
        """VERDICT r2 item 8: VP8 incremental decode resumes per
        MACROBLOCK (reference MBContext, idec_dec.c.go:271), not per
        row — mid-row progress must be observable under tiny appends,
        and the result must stay bit-exact."""
        dec = IncrementalDecoder()
        saw_mid_row = False
        step = 37
        for i in range(0, len(LOSSY), step):
            dec.append(LOSSY[i : i + step])
            v = getattr(dec, "_vp8", None)
            if v is not None and (v._modes_x > 0 or v._resid_x > 0):
                saw_mid_row = True
        assert dec.state == STATE_DONE
        np.testing.assert_array_equal(dec.get_output(), decode_rgba(LOSSY))
        assert saw_mid_row, "decoder never held mid-row progress"

    def test_chunked_lossless(self):
        dec = IncrementalDecoder()
        for i in range(0, len(LOSSLESS), 50):
            dec.append(LOSSLESS[i : i + 50])
        assert dec.state == STATE_DONE
        np.testing.assert_array_equal(dec.get_output(), decode_rgba(LOSSLESS))

    def test_incomplete_raises(self):
        dec = IncrementalDecoder()
        dec.append(LOSSY[:100])
        with pytest.raises(NotEnoughData):
            dec.get_output()


class TestMetrics:
    def test_psnr(self):
        a = IMAGES["photo"]
        assert psnr(a, a) == 99.0
        noisy = a.astype(np.int32) + 5
        assert 30 < psnr(a, np.clip(noisy, 0, 255)) < 40

    def test_plane_psnr(self):
        d = plane_psnr(IMAGES["photo"], IMAGES["photo"])
        assert d["all"] == 99.0

    def test_ssim(self):
        a = IMAGES["photo"]
        assert ssim(a, a) > 0.999
        rng = np.random.default_rng(0)
        b = np.clip(a.astype(np.int32) + rng.integers(-30, 30, a.shape), 0, 255)
        assert ssim(a, b) < 0.98


class TestIncrementalVP8L:
    def test_lossless_partial_rows(self):
        """VP8L suspend/resume: partial rows must match the final decode."""
        rng = np.random.default_rng(9)
        arr = rng.integers(0, 255, (120, 90, 4), dtype=np.uint8)
        arr[..., 3] = 255
        data = pil_encode_lossless(arr)
        full = decode_rgba(data)
        dec = IncrementalDecoder()
        saw_partial = 0
        for i in range(0, len(data), 37):
            dec.append(data[i : i + 37])
            n = dec.rows_decoded
            if dec.state != STATE_DONE and n > 0:
                part = dec.get_partial_output()
                np.testing.assert_array_equal(part[:n], full[:part.shape[0]][:n])
                saw_partial = max(saw_partial, n)
        assert dec.state == STATE_DONE
        np.testing.assert_array_equal(dec.get_output(), full)
        assert saw_partial > 0      # resumed mid-stream at least once


class TestEncodeYUV:
    def test_yuv_input_roundtrip(self):
        """YUV-plane input path: encode_yuv output decodes to those planes."""
        from gowebp_tpu import encode_yuv
        from gowebp_tpu.decode import decode_yuv

        rng = np.random.default_rng(5)
        h, w = 64, 80
        y = rng.integers(16, 235, (h, w), dtype=np.uint8)
        u = rng.integers(16, 240, ((h + 1) // 2, (w + 1) // 2), dtype=np.uint8)
        v = rng.integers(16, 240, ((h + 1) // 2, (w + 1) // 2), dtype=np.uint8)
        data = encode_yuv(y, u, v, quality=90)
        dy, du, dv = decode_yuv(data)
        assert dy.shape == (h, w)
        assert psnr(y, dy) > 28
        # Pillow must accept the container too.
        assert pil_decode_rgba(data).shape == (h, w, 4)

    def test_yuv_with_alpha(self):
        from gowebp_tpu import encode_yuv

        rng = np.random.default_rng(6)
        h, w = 32, 48
        y = rng.integers(0, 255, (h, w), dtype=np.uint8)
        u = np.full(((h + 1) // 2, (w + 1) // 2), 128, np.uint8)
        v = np.full(((h + 1) // 2, (w + 1) // 2), 128, np.uint8)
        a = rng.integers(0, 255, (h, w), dtype=np.uint8)
        data = encode_yuv(y, u, v, alpha=a, quality=80)
        out = decode_rgba(data)
        assert out.shape == (h, w, 4)
        np.testing.assert_array_equal(out[..., 3], a)


class TestOutputModesExtended:
    def test_premultiplied_and_packed(self):
        from gowebp_tpu import decode
        from gowebp_tpu.config import EncoderConfig
        from gowebp_tpu.encode import encode_rgba

        rng = np.random.default_rng(5)
        arr = rng.integers(0, 256, (24, 32, 4), dtype=np.uint8)
        data = encode_rgba(
            arr, config=EncoderConfig(lossless=True, exact=True))
        base = decode_rgba(data)
        pm = decode(data, mode="rgbA")
        a = base[..., 3].astype(np.uint32)
        for c in range(3):
            exp = ((base[..., c].astype(np.uint32) * a * 32897) >> 23)
            np.testing.assert_array_equal(pm[..., c], exp.astype(np.uint8))
        np.testing.assert_array_equal(pm[..., 3], base[..., 3])
        assert decode(data, mode="RGB_565").shape == (24, 32, 2)
        assert decode(data, mode="RGBA_4444").shape == (24, 32, 2)

    def test_cleanup_transparent_area(self):
        """exact=False (default) flattens RGB under alpha=0 like the
        reference; visible pixels stay exact for lossless."""
        from gowebp_tpu.config import EncoderConfig
        from gowebp_tpu.encode import encode_rgba

        rng = np.random.default_rng(6)
        arr = rng.integers(0, 256, (48, 48, 4), dtype=np.uint8)
        arr[..., 3] = rng.choice([0, 255], (48, 48))
        d_clean = encode_rgba(arr, lossless=True)
        d_exact = encode_rgba(
            arr, config=EncoderConfig(lossless=True, exact=True))
        assert len(d_clean) < len(d_exact)
        out = decode_rgba(d_clean)
        vis = arr[..., 3] > 0
        np.testing.assert_array_equal(out[vis], arr[vis])
        np.testing.assert_array_equal(out[..., 3], arr[..., 3])
        np.testing.assert_array_equal(decode_rgba(d_exact), arr)


class TestDecodeYUVA:
    """Rescaled/cropped YUVA output path (reference io_dec.c.go:232-520
    EmitRescaledYUV/ExportYUVA; the last §2 buffer-mgmt delta)."""

    def _file(self, with_alpha=False, h=64, w=80):
        rng = np.random.default_rng(41)
        img = np.clip(rng.normal(120, 40, (h, w, 3)), 0, 255).astype(np.uint8)
        if with_alpha:
            img = np.dstack([img, np.clip(
                200 + rng.integers(-80, 50, (h, w)), 0, 255).astype(np.uint8)])
        return gowebp_tpu.encode_rgba(
            img, config=EncoderConfig(lossless=False, quality=80.0))

    def test_plain_matches_decode_yuv(self):
        data = self._file()
        y, u, v, a = gowebp_tpu.decode_yuva(data)
        y0, u0, v0 = gowebp_tpu.decode_yuv(data)
        np.testing.assert_array_equal(y, y0)
        np.testing.assert_array_equal(u, u0)
        np.testing.assert_array_equal(v, v0)
        assert a is None

    def test_alpha_plane_present(self):
        data = self._file(with_alpha=True)
        y, u, v, a = gowebp_tpu.decode_yuva(data)
        assert a is not None and a.shape == y.shape
        rgba = gowebp_tpu.decode_rgba(data)
        np.testing.assert_array_equal(a, rgba[..., 3])

    def test_crop_is_plane_slice_with_even_snap(self):
        data = self._file()
        cfg = DecoderConfig(use_cropping=True, crop_left=13, crop_top=7,
                            crop_width=32, crop_height=24)
        y, u, v, a = gowebp_tpu.decode_yuva(data, cfg)
        y0, u0, v0 = gowebp_tpu.decode_yuv(data)
        # offsets snap down to even (12, 6) for chroma alignment
        np.testing.assert_array_equal(y, y0[6:30, 12:44])
        np.testing.assert_array_equal(u, u0[3:15, 6:22])
        assert y.shape == (24, 32) and u.shape == (12, 16) == v.shape

    def test_scale_matches_per_plane_rescaler(self):
        from gowebp_tpu.decode_options import _rescale

        data = self._file(with_alpha=True)
        cfg = DecoderConfig(use_scaling=True, scaled_width=40,
                            scaled_height=0)   # aspect-preserving height
        y, u, v, a = gowebp_tpu.decode_yuva(data, cfg)
        y0, u0, v0 = gowebp_tpu.decode_yuv(data)
        sh = 64 * 40 // 80
        assert y.shape == (sh, 40) and a.shape == (sh, 40)
        assert u.shape == ((sh + 1) // 2, 20) == v.shape
        np.testing.assert_array_equal(
            y, _rescale(y0[..., None], 40, sh)[..., 0])

    def test_flip_reverses_rows(self):
        data = self._file()
        y, u, v, _ = gowebp_tpu.decode_yuva(data, DecoderConfig(flip=True))
        y0, u0, v0 = gowebp_tpu.decode_yuv(data)
        np.testing.assert_array_equal(y, y0[::-1])
        np.testing.assert_array_equal(v, v0[::-1])

    def test_bad_crop_raises(self):
        from gowebp_tpu.errors import InvalidConfig

        data = self._file()
        with pytest.raises(InvalidConfig):
            gowebp_tpu.decode_yuva(data, DecoderConfig(
                use_cropping=True, crop_left=70, crop_top=0,
                crop_width=32, crop_height=24))


class TestOutputModes:
    """The full colorspace-mode surface (reference MODE_* set)."""

    def _file(self, alpha=False):
        import io

        import numpy as np
        from PIL import Image

        rng = np.random.default_rng(41)
        c = 4 if alpha else 3
        im = np.clip(rng.normal(128, 40, (24, 28, c)), 0, 255).astype(
            np.uint8)
        if alpha:
            im[..., 3] = np.where(rng.random((24, 28)) < 0.3, 64, 255)
        buf = io.BytesIO()
        Image.fromarray(im).save(buf, "WEBP", lossless=True, exact=True)
        return buf.getvalue(), im

    def test_channel_permutations(self):
        import numpy as np

        from gowebp_tpu.decode import decode

        data, _ = self._file(alpha=True)
        rgba = decode(data, mode="RGBA")
        np.testing.assert_array_equal(decode(data, mode="BGRA"),
                                      rgba[..., [2, 1, 0, 3]])
        np.testing.assert_array_equal(decode(data, mode="ARGB"),
                                      rgba[..., [3, 0, 1, 2]])
        np.testing.assert_array_equal(decode(data, mode="BGR"),
                                      rgba[..., [2, 1, 0]])

    def test_premultiplied_modes(self):
        import numpy as np

        from gowebp_tpu.decode import decode

        data, _ = self._file(alpha=True)
        rgba = decode(data, mode="RGBA")
        pre = decode(data, mode="rgbA")
        a = rgba[..., 3].astype(np.uint32)
        want = ((rgba[..., 0].astype(np.uint32) * a * 32897) >> 23)
        np.testing.assert_array_equal(pre[..., 0], want.astype(np.uint8))
        np.testing.assert_array_equal(pre[..., 3], rgba[..., 3])
        # channel order composes with premultiply
        bgra_pre = decode(data, mode="bgrA")
        np.testing.assert_array_equal(bgra_pre[..., 2], pre[..., 0])

    def test_packed_16bit_modes(self):
        import numpy as np

        from gowebp_tpu.decode import decode

        data, _ = self._file(alpha=True)
        rgba = decode(data, mode="RGBA")
        p565 = decode(data, mode="RGB_565")
        assert p565.shape == rgba.shape[:2] + (2,)
        np.testing.assert_array_equal(
            p565[..., 0],
            (rgba[..., 0] & 0xF8) | (rgba[..., 1] >> 5))
        p4444 = decode(data, mode="RGBA_4444")
        np.testing.assert_array_equal(
            p4444[..., 1],
            (rgba[..., 2] & 0xF0) | (rgba[..., 3] >> 4))
        pre4444 = decode(data, mode="rgbA_4444")
        assert pre4444.shape == p4444.shape

    def test_bad_mode_rejected(self):
        import pytest

        from gowebp_tpu.decode import decode

        data, _ = self._file()
        with pytest.raises(ValueError):
            decode(data, mode="CMYK")
