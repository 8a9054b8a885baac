"""Per-phase device timing for the hybrid encoder (tunnel-proof).

Timing through the axon tunnel is polluted by ~25 ms launch round trips
and phantom syncs, so each phase is wrapped in ONE jitted
`lax.fori_loop` with a *traced* rep count: run k1 and k2 reps of the
same executable and take the slope (t2 - t1) / (k2 - k1).  The loop
carry perturbs the input by (acc & 1) so XLA cannot hoist the
loop-invariant body, and every run ends in a scalar fetch.

Usage:  python benchmarks/dev_phase_timing.py [--smoke]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true", help="CPU-sized run")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--phases", default="", help="comma list to filter")
    args = ap.parse_args()
    if args.smoke:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if args.smoke:
        # the axon plugin ignores the env var alone (see tests/conftest)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from bench import make_images
    from gowebp_tpu.models.vp8.encoder import (
        _default_cost_tables, _i4_config, make_quants, quality_to_q,
        rgb_to_yuv420)
    from gowebp_tpu.ops.encode_wavefront_jax import (
        encode_hybrid_core, encode_wavefront_core, openloop_mode_search)

    size = 128 if args.smoke else 1024
    nb = 2 if args.smoke else 16
    imgs = make_images(nb, size)
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
    mp = nb * size * size / 1e6

    # recon context for the refine-search variants: one fixed-mode pass
    cold = jax.jit(lambda *a: openloop_mode_search(
        *a, try_i4=True, i4_penalty=pen, i4_parallel=True))(
        y, u, v, segb, qsb, tables)
    modes_t = tuple(cold[k] for k in ("ymode", "uvmode", "is_i4", "imodes"))
    wf1 = encode_wavefront_core(y, u, v, segb, qsb, tables, try_i4=True,
                                i4_penalty=pen, modes=modes_t,
                                want_recon=True)
    ctx = tuple(jax.device_put(np.asarray(wf1[k]))
                for k in ("recon_y", "recon_u", "recon_v"))
    modes_dev = tuple(jax.device_put(np.asarray(m)) for m in modes_t)

    def timed(fn):
        """fn(y, ...) -> pytree.  Returns k-rep jitted runner."""

        def runner(k, y_, u_, v_, seg_, qs_, tb0, tb1, tb2):
            def body(i, carry):
                acc, yy = carry
                out = fn(yy, u_, v_, seg_, qs_, (tb0, tb1, tb2))
                leaf = jax.tree_util.tree_leaves(out)[0]
                s = leaf.reshape(-1)[0].astype(jnp.int32)
                # data-dependent perturbation: defeats loop hoisting,
                # never changes magnitude enough to alter timing
                return acc + s, y_ + (s & 1)

            acc, _ = lax.fori_loop(0, k, body, (jnp.int32(0), y_))
            return acc

        return jax.jit(runner)

    phases = {
        "hybrid_r1_par": lambda yy, u_, v_, s_, q_, tb: encode_hybrid_core(
            yy, u_, v_, s_, q_, tb, try_i4=True, i4_penalty=pen,
            refine=1, i4_parallel=True),
        "search_cold_par": lambda yy, u_, v_, s_, q_, tb: (
            openloop_mode_search(yy, u_, v_, s_, q_, tb, try_i4=True,
                                 i4_penalty=pen, i4_parallel=True)),
        "search_refine_gs": lambda yy, u_, v_, s_, q_, tb: (
            openloop_mode_search(yy, u_, v_, s_, q_, tb, try_i4=True,
                                 i4_penalty=pen, ctx=ctx)),
        "search_refine_par": lambda yy, u_, v_, s_, q_, tb: (
            openloop_mode_search(yy, u_, v_, s_, q_, tb, try_i4=True,
                                 i4_penalty=pen, ctx=ctx,
                                 i4_parallel=True)),
        "search_i16only": lambda yy, u_, v_, s_, q_, tb: (
            openloop_mode_search(yy, u_, v_, s_, q_, tb, try_i4=False)),
        "wf_fixed_recon": lambda yy, u_, v_, s_, q_, tb: (
            encode_wavefront_core(yy, u_, v_, s_, q_, tb, try_i4=True,
                                  i4_penalty=pen, modes=modes_dev,
                                  want_recon=True)),
        "wf_fixed": lambda yy, u_, v_, s_, q_, tb: (
            encode_wavefront_core(yy, u_, v_, s_, q_, tb, try_i4=True,
                                  i4_penalty=pen, modes=modes_dev)),
    }
    if args.phases:
        keep = set(args.phases.split(","))
        phases = {k: v for k, v in phases.items() if k in keep}

    k1, k2 = (1, 2) if args.smoke else (1, args.reps)
    print(f"{'phase':20s} {'ms/rep':>9s} {'MP/s':>8s}  (k1={k1}, k2={k2})")
    results = {}
    for name, fn in phases.items():
        r = timed(fn)
        t_compile0 = time.perf_counter()
        int(np.asarray(r(k1, y, u, v, segb, qsb, *tables)))  # compile+warm
        compile_s = time.perf_counter() - t_compile0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            int(np.asarray(r(k1, y, u, v, segb, qsb, *tables)))
            t1 = time.perf_counter()
            int(np.asarray(r(k2, y, u, v, segb, qsb, *tables)))
            t2 = time.perf_counter()
            slope = ((t2 - t1) - (t1 - t0)) / (k2 - k1)
            best = min(best, slope)
        results[name] = best
        print(f"{name:20s} {best * 1e3:9.1f} {mp / best:8.1f}"
              f"   [compile+warm {compile_s:.0f}s]")

    if {"search_cold_par", "wf_fixed_recon", "search_refine_gs",
            "wf_fixed"} <= results.keys():
        cur = (results["search_cold_par"] + results["wf_fixed_recon"]
               + results["search_refine_gs"] + results["wf_fixed"])
        print(f"\nsum(current structure)  {cur * 1e3:9.1f} {mp / cur:8.1f}")
    if {"search_i16only", "wf_fixed_recon", "search_refine_par",
            "wf_fixed"} <= results.keys():
        alt = (results["search_i16only"] + results["wf_fixed_recon"]
               + results["search_refine_par"] + results["wf_fixed"])
        print(f"sum(i16cold+par refine) {alt * 1e3:9.1f} {mp / alt:8.1f}")


if __name__ == "__main__":
    main()
