"""Pipelined batch encoder: pack/unpack round-trip + end-to-end parity."""

import numpy as np
import pytest

from gowebp_tpu.config import EncoderConfig
from gowebp_tpu.decode import decode_rgba
from gowebp_tpu.encode import encode_rgba
from gowebp_tpu.ops.encode_pipeline import (
    _plan,
    dense_packed_step,
    encode_rgba_batch_pipelined,
    unpack_g4,
)
from gowebp_tpu.utils.metrics import psnr

def _photo(h, w, seed):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, 3), np.int32)
    img[..., 0] = 120 + 70 * np.sin(xx / 11) + 30 * np.cos(yy / 17)
    img[..., 1] = 110 + 60 * np.cos((xx + yy) / 23)
    img[..., 2] = 90 + 80 * np.sin(yy / 13)
    img += rng.integers(-6, 7, (h, w, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def _images(n, h, w, seed=11):
    return [_photo(h, w, seed + i) for i in range(n)]


def test_pack_unpack_roundtrip_matches_dense():
    imgs = _images(3, 80, 96)
    from gowebp_tpu.models.vp8.encoder import make_quants, quality_to_q

    q = make_quants(quality_to_q(75.0))
    out = dense_packed_step(
        np.stack(imgs),
        y1_dc=q.y1_dc.q, y1_ac=q.y1_ac.q, y2_dc=q.y2_dc.q, y2_ac=q.y2_ac.q,
        uv_dc=q.uv_dc.q, uv_ac=q.uv_ac.q,
        cap_g=_plan(80, 96)["cap_g"],
    )
    plan = _plan(80, 96)
    counts = np.asarray(out["counts"])
    maxabs = np.asarray(out["maxabs"])
    mask = np.asarray(out["mask"])
    vals = np.asarray(out["vals"])
    for b in range(3):
        assert maxabs[b] <= 127
        y2, yl, uvl = unpack_g4(mask[b], vals[b], int(counts[b]), plan)
        t = plan["total"]
        np.testing.assert_array_equal(
            y2, np.asarray(out["y2_levels"][b]).reshape(t, 16))
        np.testing.assert_array_equal(
            yl, np.asarray(out["y_levels"][b]).reshape(t, 16, 16))
        np.testing.assert_array_equal(
            uvl, np.asarray(out["uv_levels"][b]).reshape(t, 8, 16))


@pytest.mark.parametrize("engine,backend", [
    ("openloop", "jax-openloop"),
    ("wavefront", "jax"),
])
def test_pipelined_matches_direct_backend(engine, backend):
    imgs = _images(5, 64, 80)
    got = encode_rgba_batch_pipelined(imgs, quality=75.0, chunk=2,
                                      engine=engine)
    cfg = EncoderConfig(lossless=False, quality=75.0,
                        plane_backend=backend)
    for im, data in zip(imgs, got):
        ref = encode_rgba(im, config=cfg)
        assert data == ref


def test_pipelined_decodes_with_reasonable_psnr():
    imgs = _images(3, 96, 96)
    out = encode_rgba_batch_pipelined(imgs, quality=90.0, chunk=8)
    for im, data in zip(imgs, out):
        dec = decode_rgba(data)
        assert dec.shape == (96, 96, 4)
        # Exact closed-loop engine: host-encoder quality.
        assert psnr(dec[..., :3], im) > 33.0

    fast = encode_rgba_batch_pipelined(imgs, quality=90.0, chunk=8,
                                       engine="openloop")
    for im, data in zip(imgs, fast):
        assert psnr(decode_rgba(data)[..., :3], im) > 24.0


def test_hybrid_engine_quality_and_validity():
    """Hybrid (parallel search + fixed-mode closed-loop wavefront):
    streams must be fully valid (zero prediction drift) and the quality
    must stay within a whisker of the exact in-loop search."""
    imgs = _images(3, 96, 112)
    hyb = encode_rgba_batch_pipelined(imgs, quality=75.0, chunk=4,
                                      engine="hybrid")
    exact = encode_rgba_batch_pipelined(imgs, quality=75.0, chunk=4,
                                        engine="wavefront")
    from PIL import Image
    import io

    for im, h, e in zip(imgs, hyb, exact):
        dh = decode_rgba(h)[..., :3]
        # Independent decoder agrees bit-exactly -> no drift.
        pil = np.asarray(Image.open(io.BytesIO(h)).convert("RGB"))
        np.testing.assert_array_equal(dh, pil)
        p_h = psnr(dh, im)
        p_e = psnr(decode_rgba(e)[..., :3], im)
        assert p_h > p_e - 0.3, (p_h, p_e)
        assert len(h) < len(e) * 1.12, (len(h), len(e))


def test_hybrid_fixed_point_reproduces_exact_search():
    """The sequential search's decisions are a stable fixed point of the
    parallel search: given the exact engine's own recon as context, the
    parallel search reproduces them, and the fixed-mode wavefront then
    emits bit-identical levels."""
    import jax.numpy as jnp

    from gowebp_tpu.models.vp8.encoder import (
        _default_cost_tables, _i4_config, make_quants, quality_to_q,
        rgb_to_yuv420)
    from gowebp_tpu.ops.encode_wavefront_jax import (
        encode_wavefront_core, openloop_mode_search)

    im = _images(1, 64, 64)[0]
    y, u, v = rgb_to_yuv420(im)
    y = y.astype(np.int32)[None]
    u = u.astype(np.int32)[None]
    v = v.astype(np.int32)[None]
    q = make_quants(quality_to_q(75.0))
    row = np.array([q.y1_dc.q, q.y1_ac.q, q.y2_dc.q, q.y2_ac.q,
                    q.uv_dc.q, q.uv_ac.q], np.int32)
    qs = np.broadcast_to(row, (1, 4, 6)).copy()
    seg = np.zeros((1, 4, 4), np.int32)
    tables = tuple(jnp.asarray(t.astype(np.int32))
                   for t in _default_cost_tables())
    _, pen = _i4_config(q.y1_ac.q, 4, 0)
    full = encode_wavefront_core(y, u, v, seg, qs, tables,
                                 try_i4=True, i4_penalty=pen)
    modes = tuple(full[k].astype(np.int32)
                  for k in ("ymode", "uvmode", "is_i4", "imodes"))
    fixed = encode_wavefront_core(y, u, v, seg, qs, tables,
                                  try_i4=True, i4_penalty=pen,
                                  modes=modes, want_recon=True)
    for k in ("y_levels", "y2_levels", "uv_levels"):
        np.testing.assert_array_equal(np.asarray(full[k]),
                                      np.asarray(fixed[k]))
    redo = openloop_mode_search(
        y, u, v, seg, qs, tables, try_i4=True, i4_penalty=pen,
        ctx=(fixed["recon_y"], fixed["recon_u"], fixed["recon_v"]))
    for k in ("ymode", "uvmode", "is_i4", "imodes"):
        np.testing.assert_array_equal(np.asarray(full[k]).astype(np.int32),
                                      np.asarray(redo[k]))


def test_pipelined_odd_dimensions():
    imgs = _images(2, 61, 47)
    out = encode_rgba_batch_pipelined(imgs, quality=80.0)
    for im, data in zip(imgs, out):
        dec = decode_rgba(data)
        assert dec.shape == (61, 47, 4)
        assert psnr(dec[..., :3], im) > 28.0


def test_escape_fallback_dense_fetch():
    # q=100 + extreme checkerboard drives |level| > 127 → dense fallback.
    rng = np.random.default_rng(5)
    im = (rng.integers(0, 2, (64, 64, 1)) * 255).astype(np.uint8)
    im = np.repeat(im, 3, axis=2)
    out = encode_rgba_batch_pipelined([im], quality=100.0)
    from gowebp_tpu.models.vp8.encoder import make_quants, quality_to_q

    q = make_quants(quality_to_q(100.0))
    plan = _plan(64, 64)
    step = dense_packed_step(
        im[None],
        y1_dc=q.y1_dc.q, y1_ac=q.y1_ac.q, y2_dc=q.y2_dc.q, y2_ac=q.y2_ac.q,
        uv_dc=q.uv_dc.q, uv_ac=q.uv_ac.q, cap_g=plan["cap_g"],
    )
    assert int(np.asarray(step["maxabs"])[0]) > 127, "fixture too tame"
    dec = decode_rgba(out[0])
    assert psnr(dec[..., :3], im) > 35.0


def test_pipelined_matches_direct_at_escape_quality():
    im = _images(1, 64, 64)[0].copy()
    im[::2, ::2] = 255
    im[1::2, 1::2] = 0
    got = encode_rgba_batch_pipelined([im], quality=100.0)
    cfg = EncoderConfig(lossless=False, quality=100.0, plane_backend="jax")
    assert got[0] == encode_rgba(im, config=cfg)
