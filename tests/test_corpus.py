"""Corpus hardening: HD/4K fixtures, method×quality sweep, multi-pass,
qmin/qmax, and truncation/corruption fuzzing (VERDICT r1 item 8;
BASELINE configs #4/#5).
"""

import io

import numpy as np
import pytest
from PIL import Image

import gowebp_tpu
from gowebp_tpu.config import EncoderConfig
from gowebp_tpu.errors import WebPError


def synth_photo(h, w, seed=0):
    """Photographic stand-in: smooth structure + texture + noise."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, 3), np.float64)
    img[..., 0] = 120 + 60 * np.sin(xx / 53) + 35 * np.cos(yy / 71)
    img[..., 1] = 105 + 65 * np.cos((xx + yy) / 87) + 20 * np.sin(xx / 13)
    img[..., 2] = 95 + 55 * np.sin(yy / 43) + 15 * np.cos(xx / 7)
    img += rng.normal(0, 5, (h, w, 3))
    # local texture patches
    img += (12 * np.sin(xx / 3.1) * np.cos(yy / 2.7)
            * ((xx // 128 + yy // 128) % 3 == 0))[..., None]
    return np.clip(img, 0, 255).astype(np.uint8)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))


def test_1080p_rd_dominates_libwebp():
    """BASELINE config #4: 1080p q=75 — PSNR >= libwebp at matched (or
    smaller) size, allowing the usual rate/distortion trade window."""
    img = synth_photo(1080, 1920, seed=4)
    data = gowebp_tpu.encode_rgba(
        img, config=EncoderConfig(lossless=False, quality=75.0, method=4))
    ours = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    p_ours = _psnr(ours, img)

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "WEBP", quality=75, method=4)
    ref_data = buf.getvalue()
    ref = np.asarray(Image.open(io.BytesIO(ref_data)).convert("RGB"))
    p_ref = _psnr(ref, img)

    # RD dominance: not meaningfully worse on either axis, and strictly
    # better on at least one.
    size_ok = len(data) <= 1.02 * len(ref_data)
    psnr_ok = p_ours >= p_ref - 0.25
    better = len(data) < 0.98 * len(ref_data) or p_ours > p_ref + 0.1
    assert size_ok and psnr_ok and better, (
        f"ours {len(data)}B {p_ours:.2f}dB vs libwebp "
        f"{len(ref_data)}B {p_ref:.2f}dB")


def test_4k_lossy_roundtrip_bit_exact_decode():
    """BASELINE config #5 (single-chip slice): 4K encode, and our decode
    of the stream equals libwebp's decode bit for bit."""
    img = synth_photo(2160, 3840, seed=5)
    data = gowebp_tpu.encode_rgba(
        img, config=EncoderConfig(lossless=False, quality=75.0))
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    ours = gowebp_tpu.decode_rgba(data)[..., :3]
    np.testing.assert_array_equal(ours, ref)
    assert _psnr(ref, img) > 30.0


@pytest.mark.parametrize("method", [0, 1, 2, 3, 4, 5, 6])
def test_lossy_method_sweep_decodes_everywhere(method):
    img = synth_photo(96, 128, seed=method)
    for q in (10, 50, 75, 95):
        data = gowebp_tpu.encode_rgba(
            img, config=EncoderConfig(lossless=False, quality=float(q),
                                      method=method))
        ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        ours = gowebp_tpu.decode_rgba(data)[..., :3]
        np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("method", [0, 3, 6])
def test_lossless_method_sweep_roundtrips(method):
    img = synth_photo(80, 96, seed=10 + method)
    for q in (10, 50, 90):
        data = gowebp_tpu.encode_rgba(
            img, config=EncoderConfig(lossless=True, quality=float(q),
                                      method=method))
        assert np.array_equal(gowebp_tpu.decode_rgba(data)[..., :3], img)
        pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        assert np.array_equal(pil, img)


def test_multipass_target_size_and_qbounds():
    from gowebp_tpu.stats import EncodeStats

    img = synth_photo(256, 256, seed=9)
    free = gowebp_tpu.encode_rgba(
        img, config=EncoderConfig(lossless=False, quality=90.0))
    target = int(len(free) * 0.6)
    data = gowebp_tpu.encode_rgba(
        img, config=EncoderConfig(lossless=False, quality=90.0, passes=6,
                                  target_size=target))
    assert len(data) <= target * 1.1, (len(data), target)
    # qmin/qmax clamp the quantizer index.
    st = EncodeStats()
    gowebp_tpu.encode_rgba(
        img, config=EncoderConfig(lossless=False, quality=95.0,
                                  qmin=40, qmax=70), stats=st)
    assert 40 * 127 // 100 <= st.quantizer <= 70 * 127 // 100


def _fixtures():
    img = synth_photo(64, 80, seed=2)
    lossy = gowebp_tpu.encode_rgba(
        img, config=EncoderConfig(lossless=False, quality=75.0))
    lossless = gowebp_tpu.encode_rgba(
        img, config=EncoderConfig(lossless=True, quality=75.0))
    rgba = np.dstack([img, ((np.arange(64 * 80) % 256)
                            .reshape(64, 80)).astype(np.uint8)])
    alpha = gowebp_tpu.encode_rgba(
        rgba, config=EncoderConfig(lossless=False, quality=75.0))
    return [lossy, lossless, alpha]


def test_truncation_fuzz_never_hangs_or_crashes():
    """Every truncation either raises a typed WebPError or returns a
    well-formed array — no hangs, no unhandled exceptions."""
    for data in _fixtures():
        # Fine stride near the start (headers), coarser in the payload.
        cuts = list(range(0, min(64, len(data)))) + \
            list(range(64, len(data), 97))
        for n in cuts:
            try:
                out = gowebp_tpu.decode_rgba(data[:n])
            except WebPError:
                continue
            assert isinstance(out, np.ndarray) and out.ndim == 3


def test_corruption_fuzz_never_hangs_or_crashes():
    rng = np.random.default_rng(17)
    for data in _fixtures():
        buf = bytearray(data)
        for _ in range(120):
            i = int(rng.integers(0, len(buf)))
            old = buf[i]
            buf[i] = int(rng.integers(0, 256))
            try:
                out = gowebp_tpu.decode_rgba(bytes(buf))
                assert isinstance(out, np.ndarray)
            except WebPError:
                pass
            buf[i] = old


def test_garbage_and_empty_inputs():
    rng = np.random.default_rng(23)
    for blob in (b"", b"RIFF", bytes(rng.integers(0, 256, 64, np.uint8)),
                 b"RIFF\x00\x00\x00\x00WEBP"):
        with pytest.raises(WebPError):
            gowebp_tpu.decode_rgba(blob)


def test_1080p_hybrid_rd_dominates_libwebp():
    """The BENCHED engine's quality gate (VERDICT r3 item 3): the hybrid
    pipeline (`encode_rgba_batch_pipelined(engine="hybrid")`, the
    engine bench.py claims throughput for) must hold the same
    RD-dominance window as the host encoder at 1080p q=75."""
    from gowebp_tpu.ops.encode_pipeline import encode_rgba_batch_pipelined

    img = synth_photo(1080, 1920, seed=4)
    outs = encode_rgba_batch_pipelined([img], quality=75.0, threads=2,
                                       chunk=1, engine="hybrid")
    data = outs[0]
    ours = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    p_ours = _psnr(ours, img)

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "WEBP", quality=75, method=4)
    ref_data = buf.getvalue()
    ref = np.asarray(Image.open(io.BytesIO(ref_data)).convert("RGB"))
    p_ref = _psnr(ref, img)

    size_ok = len(data) <= 1.02 * len(ref_data)
    psnr_ok = p_ours >= p_ref - 0.25
    better = len(data) < 0.98 * len(ref_data) or p_ours > p_ref + 0.1
    assert size_ok and psnr_ok and better, (
        f"hybrid {len(data)}B {p_ours:.2f}dB vs libwebp "
        f"{len(ref_data)}B {p_ref:.2f}dB")


def test_vp8l_natural_corpus_ratio_vs_libwebp():
    """Regression gate for the VP8L ratio-parity claim (VERDICT r4 weak
    #6): on the deterministic natural-statistics corpus
    (gowebp_tpu/utils/corpus.py — dead-leaves + 1/f texture), method-4
    q75 lossless output must stay within 1.005x of libwebp per image
    and at-or-under 1.0x aggregate.  Round-5 measured 0.975-1.001 per
    image, 0.993 aggregate (the entropy-descent cross-color chooser is
    what closed this; reference predictor_enc.go:759-877)."""
    from gowebp_tpu.utils.corpus import natural_image

    tot = tot_lw = 0
    for seed in range(4):
        img = natural_image(256, 256, seed=seed)
        ours = gowebp_tpu.encode_rgba(
            img, config=EncoderConfig(lossless=True, quality=75.0,
                                      method=4))
        assert np.array_equal(gowebp_tpu.decode_rgba(ours)[..., :3], img)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "WEBP", lossless=True, quality=75,
                                  method=4)
        assert len(ours) <= 1.005 * buf.tell(), (
            f"seed {seed}: {len(ours)} vs libwebp {buf.tell()}")
        tot += len(ours)
        tot_lw += buf.tell()
    assert tot <= tot_lw, f"aggregate {tot} vs libwebp {tot_lw}"


def test_lossy_natural_corpus_rd_vs_libwebp():
    """Same corpus, lossy q75: RD must not be dominated by libwebp
    (size <= 1.02x at PSNR >= -0.25 dB; round-5 measured ~0.97x at
    equal PSNR on natural statistics)."""
    from gowebp_tpu.utils.corpus import natural_image

    img = natural_image(512, 512, seed=10)
    data = gowebp_tpu.encode_rgba(
        img, config=EncoderConfig(lossless=False, quality=75.0, method=4))
    ours = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "WEBP", quality=75, method=4)
    ref = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))
    assert len(data) <= 1.02 * buf.tell()
    assert _psnr(ours, img) >= _psnr(ref, img) - 0.25


def test_multipass_target_psnr():
    """target_psnr drives the multi-pass quantizer search (reference
    StatLoop's PSNR-driven ComputeNextQ, frame_enc.c.go:57-82).  The
    target is defined in the encoder's own YUV domain (like the
    reference's PassStats), not post-upsampling RGB — 4:2:0
    subsampling caps RGB PSNR regardless of quantizer."""
    from gowebp_tpu.decode import decode_yuv
    from gowebp_tpu.models.vp8.encoder import rgb_to_yuv420

    img = synth_photo(192, 192, seed=12)
    target = 33.0
    data = gowebp_tpu.encode_rgba(
        img, config=EncoderConfig(lossless=False, quality=50.0, passes=6,
                                  target_psnr=target))
    sy, su, sv = rgb_to_yuv420(img)
    dy, du, dv = decode_yuv(data)
    se = n = 0
    for dec, src in ((dy, sy), (du, su), (dv, sv)):
        dec = dec[: src.shape[0], : src.shape[1]].astype(np.float64)
        se += ((dec - src.astype(np.float64)) ** 2).sum()
        n += dec.size
    p = 10 * np.log10(255.0 ** 2 / max(se / n, 1e-12))
    assert p >= target - 0.5, f"YUV PSNR {p:.2f} missed target {target}"
    # the search should also not blow the size out versus just asking
    # for max quality (i.e. it really searched, not just clamped)
    free = gowebp_tpu.encode_rgba(
        img, config=EncoderConfig(lossless=False, quality=95.0))
    assert len(data) < len(free), (len(data), len(free))
