"""Headline benchmark: end-to-end TPU batch encode vs libwebp.

Headline metric: **end-to-end lossy encode throughput of the HYBRID
engine** — uint8 RGB pixels in, complete .webp byte strings out —
via `encode_rgba_batch_pipelined(engine="hybrid")`: host YUV +
segmentation (thread pool) → one fused h2d buffer → device parallel
mode search (i16/uv/i4 Gauss-Seidel) + fixed-mode exact closed-loop
wavefront + G4PACKv2 → one fused d2h buffer → host entropy emission
(C++ tokenizer, thread pool).

Unlike round 2's open-loop headline (whose prediction drift cost ~17 dB
PSNR on this corpus — quantified in "extra"), the hybrid engine's
streams are exactly closed-loop: the same engine owns the quality AND
the throughput claim.  Its quality rides in "extra" as PSNR/size
against libwebp on the same images (quality 75, method 4).

Baseline: libwebp's single-core full encoder (via Pillow), same
quality/method.

Extras:
  - hybrid_psnr_db / libwebp_psnr_db + hybrid_size_ratio: the quality
    assertion for the benched engine.
  - stage breakdown (seconds): prep / h2d / fetch(d2h) / emit.
  - vp8_hybrid_device_mps: the device phase alone (search + wavefront),
    i.e. the number the same pipeline reaches once the host link is
    PCIe instead of this tunnel.
  - vp8_e2e_exact_search_mps: e2e with the full in-loop RD search
    (bit-identical to the sequential host encoder).
  - openloop PSNR: the r2 fast path's drift penalty, for the record.
  - vp8_decode_to_device_mps: batch decode, device-resident output.

Environment note: this host reaches the TPU through a tunnel whose
transfers run at ~12-60 MB/s with multi-second stalls (time-varying);
production PCIe is 2-3 orders of magnitude faster, so the e2e numbers
are a lower bound (see ARCHITECTURE.md "Performance notes").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

import io
import json
import time

import numpy as np


def make_images(batch: int, size: int) -> np.ndarray:
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:size, 0:size]
    imgs = np.zeros((batch, size, size, 3), np.uint8)
    for b in range(batch):
        imgs[b, ..., 0] = np.clip(
            110 + 70 * np.sin(xx / (13 + b % 8))
            + rng.normal(0, 8, (size, size)), 0, 255
        )
        imgs[b, ..., 1] = np.clip(
            100 + 60 * np.cos(yy / (17 + b % 8))
            + rng.normal(0, 8, (size, size)), 0, 255
        )
        imgs[b, ..., 2] = ((xx // 2 + yy // 3 + 37 * b) % 256).astype(np.uint8)
    return imgs


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    d = a.astype(np.float64) - b.astype(np.float64)
    return 10 * np.log10(255.0 ** 2 / np.mean(d * d))


def libwebp_encode_mps(img: np.ndarray) -> float:
    """Single-core libwebp full-encode megapixels/s (Pillow)."""
    from PIL import Image

    pil = Image.fromarray(img)
    buf = io.BytesIO()
    pil.save(buf, "WEBP", quality=75, method=4)
    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        buf = io.BytesIO()
        pil.save(buf, "WEBP", quality=75, method=4)
    dt = time.perf_counter() - t0
    return n * img.shape[0] * img.shape[1] / 1e6 / dt


def libwebp_decode_mps(datas: list, size: int) -> float:
    from PIL import Image

    np.asarray(Image.open(io.BytesIO(datas[0])).convert("RGB"))
    t0 = time.perf_counter()
    for d in datas:
        np.asarray(Image.open(io.BytesIO(d)).convert("RGB"))
    dt = time.perf_counter() - t0
    return len(datas) * size * size / 1e6 / dt


def main() -> None:
    import jax
    from PIL import Image

    from gowebp_tpu.decode import decode_rgba_batch
    from gowebp_tpu.ops.encode_pipeline import encode_rgba_batch_pipelined

    size, chunk = 1024, 32
    n_e2e = 64
    imgs = make_images(n_e2e, size)
    lst = [imgs[i] for i in range(n_e2e)]
    mp = size * size / 1e6

    def best_of(fn, mps_for, reps=2):
        """Max throughput over reps (the tunnel stalls randomly)."""
        best, out = 0.0, None
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            best = max(best, mps_for / (time.perf_counter() - t0))
        return best, out

    # --- libwebp baselines + per-image quality on a subset ---
    enc_base = libwebp_encode_mps(imgs[0])
    nq = 8
    lw_sizes, lw_psnr = [], []
    datas = []
    for b in range(16):
        buf = io.BytesIO()
        Image.fromarray(imgs[b]).save(buf, "WEBP", quality=75, method=4)
        datas.append(buf.getvalue())
        if b < nq:
            lw_sizes.append(buf.tell())
            lw_psnr.append(psnr(np.asarray(
                Image.open(io.BytesIO(buf.getvalue())).convert("RGB")),
                imgs[b]))

    # --- extra: batch decode with device-resident output (measured
    # BEFORE the encode rounds: the tunnel degrades for a while after
    # sustained bulk transfers, which once cost this metric 9x) ---
    outs_d = decode_rgba_batch(datas, device_out=True)  # warm
    jax.block_until_ready(outs_d)
    dec, _ = best_of(
        lambda: jax.block_until_ready(
            decode_rgba_batch(datas, device_out=True)),
        len(datas) * mp, reps=3)
    dec_base = libwebp_decode_mps(datas, size)

    # --- headline: end-to-end batch encode, HYBRID engine ---
    encode_rgba_batch_pipelined(lst[:chunk], quality=75.0, threads=8,
                                chunk=chunk, engine="hybrid")  # warm
    timings = {}
    e2e_hybrid, outs = best_of(
        lambda: encode_rgba_batch_pipelined(
            lst, quality=75.0, threads=8, chunk=chunk, depth=3,
            engine="hybrid", timings=timings),
        n_e2e * mp)
    hy_sizes = [len(outs[b]) for b in range(nq)]
    hy_psnr = [psnr(np.asarray(
        Image.open(io.BytesIO(outs[b])).convert("RGB")), imgs[b])
        for b in range(nq)]

    # --- extra: exact in-loop-search engine e2e (smaller run) ---
    n_wf = 16
    encode_rgba_batch_pipelined(lst[:n_wf], quality=75.0, threads=8,
                                chunk=n_wf, engine="wavefront")  # warm
    e2e_exact, _ = best_of(
        lambda: encode_rgba_batch_pipelined(
            lst[:n_wf], quality=75.0, threads=8, chunk=n_wf,
            engine="wavefront"),
        n_wf * mp, reps=1)

    # --- extra: open-loop drift penalty (r2's headline engine) ---
    fast = encode_rgba_batch_pipelined(lst[:nq], quality=75.0, threads=8,
                                       chunk=nq, engine="openloop")
    ol_psnr = [psnr(np.asarray(
        Image.open(io.BytesIO(fast[b])).convert("RGB")), imgs[b])
        for b in range(nq)]

    # --- extra: device-phase throughput (hybrid core, planes resident) ---
    import jax.numpy as jnp

    from gowebp_tpu.models.vp8.encoder import (
        _default_cost_tables, _i4_config, make_quants, quality_to_q,
        rgb_to_yuv420)
    from gowebp_tpu.ops.encode_wavefront_jax import encode_hybrid_core

    nb = 16
    pl = [rgb_to_yuv420(imgs[b]) for b in range(nb)]
    y = jax.device_put(np.stack([p[0] for p in pl]).astype(np.int32))
    u = jax.device_put(np.stack([p[1] for p in pl]).astype(np.int32))
    v = jax.device_put(np.stack([p[2] for p in pl]).astype(np.int32))
    q = make_quants(quality_to_q(75.0))
    row = np.array([q.y1_dc.q, q.y1_ac.q, q.y2_dc.q, q.y2_ac.q,
                    q.uv_dc.q, q.uv_ac.q], np.int32)
    qsb = jax.device_put(np.broadcast_to(row, (nb, 4, 6)).copy())
    segb = jax.device_put(np.zeros((nb, size // 16, size // 16), np.int32))
    tables = tuple(jax.device_put(t.astype(np.int32))
                   for t in _default_cost_tables())
    _, pen = _i4_config(q.y1_ac.q, 4, 0)

    def run_dev():
        out = encode_hybrid_core(y, u, v, segb, qsb, tables,
                                 try_i4=True, i4_penalty=pen, refine=1)
        return int(np.asarray(out["ymode"][0, 0, 0]))  # force sync

    run_dev()
    dev_mps, _ = best_of(run_dev, nb * mp, reps=2)

    result = {
        "metric": "vp8_e2e_encode_throughput_hybrid",
        "value": round(e2e_hybrid, 2),
        "unit": "megapixels/s",
        "vs_baseline": round(e2e_hybrid / enc_base, 2),
        "extra": {
            "libwebp_encode_mps_1core": round(enc_base, 2),
            "hybrid_psnr_db": round(float(np.mean(hy_psnr)), 3),
            "libwebp_psnr_db": round(float(np.mean(lw_psnr)), 3),
            "hybrid_size_ratio_vs_libwebp": round(
                sum(hy_sizes) / sum(lw_sizes), 4),
            "openloop_psnr_db": round(float(np.mean(ol_psnr)), 3),
            "vp8_e2e_exact_search_mps": round(e2e_exact, 2),
            "vp8_hybrid_device_mps": round(dev_mps, 2),
            "vp8_decode_to_device_mps": round(dec, 2),
            "libwebp_decode_mps_1core": round(dec_base, 2),
            "decode_vs_baseline": round(dec / dec_base, 2),
            "stage_seconds": {k: round(v, 2) for k, v in timings.items()},
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
