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


class TestDithering:
    """Exact VP8Random chroma dithering (reference VP8InitDithering/
    DitherRow + random.go): C++ and pure-Python paths must agree."""

    def _decode_both(self, data, strength):
        import gowebp_tpu.models.vp8.decoder as dec
        from gowebp_tpu.container.riff import parse_riff

        payload = parse_riff(data).find(b"VP8 ").payload
        native = dec.decode_vp8_yuv(payload, dithering_strength=strength)
        orig = dec._decode_vp8_yuv_native
        try:
            dec._decode_vp8_yuv_native = lambda *a, **k: None
            pure = dec.decode_vp8_yuv(payload, dithering_strength=strength)
        finally:
            dec._decode_vp8_yuv_native = orig
        return native, pure

    def test_native_matches_python_and_only_flat_blocks_change(self):
        rng = np.random.default_rng(5)
        # Flat background (ditherable) + a noisy patch (has chroma AC).
        # Dithering only engages when uv_quant < 12, i.e. high quality.
        arr = np.full((64, 80, 3), 90, np.uint8)
        arr[16:48, 16:48] = rng.integers(0, 256, (32, 32, 3))
        data = pil_encode_lossy(arr, quality=98)

        (yn, un, vn), (yp, up, vp) = self._decode_both(data, 100)
        np.testing.assert_array_equal(yn, yp)
        np.testing.assert_array_equal(un, up)
        np.testing.assert_array_equal(vn, vp)

        base_y, base_u, base_v = self._decode_both(data, 0)[0]
        # Luma is never dithered.
        np.testing.assert_array_equal(yn, base_y)
        # Dithering nudged some flat chroma, by at most the descaled amp.
        du = un.astype(int) - base_u.astype(int)
        assert np.abs(du).max() <= 8
        assert (du != 0).any()

    def test_zero_strength_is_identity(self):
        arr = np.full((32, 32, 3), 128, np.uint8)
        data = pil_encode_lossy(arr, quality=60)
        from gowebp_tpu.models.vp8.decoder import decode_vp8_yuv
        from gowebp_tpu.container.riff import parse_riff
        payload = parse_riff(data).find(b"VP8 ").payload
        a = decode_vp8_yuv(payload)
        b = decode_vp8_yuv(payload, dithering_strength=0)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)

    def test_rng_reference_vector(self):
        """First draws of VP8Random against hand-computed values."""
        from gowebp_tpu.models.vp8.decoder import VP8Random, _RANDOM_TABLE

        rg = VP8Random()
        d0 = _RANDOM_TABLE[0] - _RANDOM_TABLE[31]
        if d0 < 0:
            d0 += 1 << 31
        v = (d0 << 1) & 0xFFFFFFFF
        v = v - (1 << 32) if v & 0x80000000 else v
        expect = ((v >> 24) * 255 >> 8) + 128
        assert rg.bits2(8, 255) == expect


class TestBatchSymbolDecode:
    """Interleaved multi-stream symbol decode == per-image oracle."""

    def _payloads(self):
        from gowebp_tpu.config import EncoderConfig
        from gowebp_tpu.constants import CHUNK_VP8
        from gowebp_tpu.container.riff import parse_riff
        from gowebp_tpu.encode import encode_rgba

        payloads = []
        # libwebp-encoded (single partition)
        for q in (30, 75):
            data = pil_encode_lossy(IMAGES["photo"][..., :3].copy(),
                                    quality=q)
            payloads.append(parse_riff(data).find(CHUNK_VP8).payload)
        # our encoder: multi-partition / segments / method sweep
        rng = np.random.default_rng(11)
        for q, m, parts, segs, sz in [(75, 4, 3, 4, 160), (30, 2, 2, 1, 96),
                                      (95, 6, 1, 4, 128), (10, 0, 0, 2, 80)]:
            im = np.clip(rng.normal(128, 40, (sz, sz + 16, 3)),
                         0, 255).astype(np.uint8)
            cfg = EncoderConfig(lossless=False, quality=float(q), method=m,
                                partitions=parts, segments=segs)
            data = encode_rgba(im, config=cfg)
            payloads.append(parse_riff(data).find(CHUNK_VP8).payload)
        # engine edge cases: an (almost) all-skip image, and more token
        # partitions than MB rows (streams beyond mb_h never arm)
        flat = np.full((64, 64, 3), 120, np.uint8)
        payloads.append(parse_riff(encode_rgba(
            flat, config=EncoderConfig(lossless=False, quality=20)
        )).find(CHUNK_VP8).payload)
        tiny = np.clip(rng.normal(128, 45, (32, 256, 3)),
                       0, 255).astype(np.uint8)   # 2 MB rows, 8 partitions
        payloads.append(parse_riff(encode_rgba(
            tiny, config=EncoderConfig(lossless=False, quality=75,
                                       partitions=3)
        )).find(CHUNK_VP8).payload)
        return payloads

    def test_matches_per_image_decode(self):
        from gowebp_tpu.models.vp8.decoder import (decode_vp8_symbols,
                                                   decode_vp8_symbols_batch)

        payloads = self._payloads()
        got = decode_vp8_symbols_batch(payloads)
        for i, p in enumerate(payloads):
            st, coeffs, modes = decode_vp8_symbols(p)
            st2, c2, m2 = got[i]
            assert (st2.mb_w, st2.mb_h) == (st.mb_w, st.mb_h)
            np.testing.assert_array_equal(coeffs, c2, err_msg=f"img {i}")
            np.testing.assert_array_equal(modes, m2, err_msg=f"img {i}")

    def test_many_streams_saturate_lanes(self):
        """>32 interleaved streams: lanes must free, re-install queued
        streams, and keep both 16-lane groups correct under churn."""
        from gowebp_tpu.models.vp8.decoder import (decode_vp8_symbols,
                                                   decode_vp8_symbols_batch)

        base = self._payloads()
        payloads = (base * 5)[:40]          # ~130 token streams
        want = [decode_vp8_symbols(p) for p in base]
        got = decode_vp8_symbols_batch(payloads)
        for i, p in enumerate(payloads):
            st, coeffs, modes = want[base.index(p)]
            st2, c2, m2 = got[i]
            assert (st2.mb_w, st2.mb_h) == (st.mb_w, st.mb_h)
            np.testing.assert_array_equal(coeffs, c2, err_msg=f"img {i}")
            np.testing.assert_array_equal(modes, m2, err_msg=f"img {i}")

    def test_concurrent_batch_calls_are_isolated(self):
        """All mutable engine state is per-call; static tables are
        const.  4 threads decoding simultaneously must each match the
        sequential oracle (the production pipeline runs 2-threaded)."""
        import concurrent.futures as cf

        from gowebp_tpu.models.vp8.decoder import (decode_vp8_symbols,
                                                   decode_vp8_symbols_batch)

        payloads = self._payloads()
        want = [decode_vp8_symbols(p) for p in payloads]
        with cf.ThreadPoolExecutor(4) as pool:
            results = list(pool.map(
                lambda _: decode_vp8_symbols_batch(payloads), range(4)))
        for got in results:
            for i in range(len(payloads)):
                np.testing.assert_array_equal(want[i][1], got[i][1],
                                              err_msg=f"img {i}")
                np.testing.assert_array_equal(want[i][2], got[i][2],
                                              err_msg=f"img {i}")

    def test_corruption_fuzz_batch_engine(self):
        """Random byte flips in the token partitions must never crash or
        hang the interleaved engine — typed failure or a well-formed
        result (the scalar decoder's fuzz contract, applied to the
        batch path where the memory-safety guards live)."""
        from gowebp_tpu.errors import WebPError
        from gowebp_tpu.models.vp8.decoder import decode_vp8_symbols_batch

        payloads = self._payloads()
        rng = np.random.default_rng(31)
        for p in payloads[:3]:
            buf = bytearray(p)
            for _ in range(60):
                i = int(rng.integers(len(buf) // 2, len(buf)))
                old = buf[i]
                buf[i] = int(rng.integers(0, 256))
                try:
                    out = decode_vp8_symbols_batch([bytes(buf)] * 3)
                    assert len(out) == 3
                except WebPError:
                    pass
                buf[i] = old

    def test_truncated_stream_fails_cleanly(self):
        from gowebp_tpu.errors import BitstreamError
        from gowebp_tpu.models.vp8.decoder import decode_vp8_symbols_batch

        payloads = self._payloads()
        bad = payloads[0][: len(payloads[0]) // 3]
        with pytest.raises(BitstreamError):
            decode_vp8_symbols_batch([bad])


def test_overlapped_single_image_decode_bit_exact():
    """The 2-thread overlapped native decode (symbol parse thread +
    banded recon/filter/dither behind it, wtpu_vp8_decode_frame_mt)
    must be bit-identical to the sequential path — including the
    chroma-dither RNG sequence, whose banding lags are the subtle part.
    Mirrors the reference's MT pipeline (frame_dec.c.go:493-536)."""
    import io
    import os

    from PIL import Image

    from gowebp_tpu.constants import CHUNK_VP8
    from gowebp_tpu.container.riff import parse_riff
    from gowebp_tpu.models.vp8.decoder import decode_vp8_yuv

    rng = np.random.default_rng(11)
    h, w = 160, 640                     # wide enough to pass the MT gate
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([
        np.clip(120 + 60 * np.sin(xx / 9) + rng.normal(0, 12, (h, w)), 0, 255),
        np.clip(110 + 50 * np.cos(yy / 7), 0, 255),
        ((xx + yy) % 256).astype(float)], -1).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "WEBP", quality=60, method=4)
    payload = parse_riff(buf.getvalue()).find(CHUNK_VP8).payload
    try:
        for dither in (0, 100):
            os.environ["GOWEBP_DECODE_OVERLAP"] = "0"
            seq = decode_vp8_yuv(payload, dithering_strength=dither)
            os.environ["GOWEBP_DECODE_OVERLAP"] = "1"
            mt = decode_vp8_yuv(payload, dithering_strength=dither)
            for a, b in zip(seq, mt):
                np.testing.assert_array_equal(a, b)
    finally:
        os.environ.pop("GOWEBP_DECODE_OVERLAP", None)
