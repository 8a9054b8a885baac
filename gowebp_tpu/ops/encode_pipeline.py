"""Pipelined batch lossy encode: host uint8 RGB → .webp bytes.

End-to-end throughput path (the "encode a million photos" shape of the
reference's `webp.Encode`, re-designed for a TPU + thin-host system).
Four overlapped stages:

  1. h2d: uint8 RGB chunks (cheapest possible wire format, ~3 B/px).
  2. device (one jit): exact BT.601 fixed-point RGB→YUV420, edge pad to
     macroblock multiples, open-loop dense encode
     (`encode_plane_core_v2`: mode search + FDCT/FWHT + quantization for
     every MB at once), and a group-of-4 sparse pack of the level
     tensors (levels are ~90% zero at q75, and the device→host link is
     the scarce resource).
  3. d2h: group bitmask + int8 values, sliced to the chunk's actual
     max count (~0.4-0.6 B/px instead of ~3.1 B/px dense).
  4. host: unpack to dense int16 + two-pass entropy emission
     (C++ tokenizer), fanned out over a thread pool.

G4PACK wire format (per image):
  flat  = concat(y2_levels, y_levels, uv_levels), zigzag int16,
          zero-padded to a multiple of 32 coefficients
  group g = flat[4g : 4g+4]; mask bit g set iff any coeff nonzero;
          mask bits packed LSB-first into bytes
  values: the nonzero groups' 4 coeffs as int8, ascending group order
  escape: any |level| > 127 (or overflowing the value capacity) marks
          the image for a dense int16 fallback fetch — correctness never
          depends on the compact path.

Feature parity target: the reference's encode pipeline driver
(/root/reference/pkg/libwebp/enc/webp_encoding.go:21-107) at batch
scale; the entropy stage mirrors frame_enc.c.go:218-290 via the native
tokenizer.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np

from .encode_plane_jax import encode_plane_core_v2
from .encode_wavefront_jax import encode_wavefront
from .yuv_jax import rgb_to_yuv420

GROUP = 4  # coefficients per mask bit


def _plan(h: int, w: int):
    """Static per-shape layout: padded dims, coeff counts, group counts."""
    H = (h + 15) // 16 * 16
    W = (w + 15) // 16 * 16
    mb_h, mb_w = H // 16, W // 16
    total = mb_h * mb_w
    n_coeff = total * (16 + 256 + 128)
    n_group = (n_coeff + GROUP - 1) // GROUP
    n_group_pad = (n_group + 7) // 8 * 8
    return {
        "H": H, "W": W, "mb_h": mb_h, "mb_w": mb_w, "total": total,
        "n_coeff": n_coeff, "n_group": n_group, "n_group_pad": n_group_pad,
        # Capacity: half the groups may be nonzero before the dense
        # fallback kicks in (typical content at q75 runs ~10-35%).
        "cap_g": max(8, n_group_pad // 2),
    }


def _pack_g4(flat, cap_g: int):
    """(B, n_coeff_pad) int32/int16 → G4PACK tensors (device side)."""
    import jax.numpy as jnp

    B = flat.shape[0]
    g = flat.reshape(B, -1, GROUP)
    gnz = (g != 0).any(-1)
    counts = gnz.sum(axis=1).astype(jnp.int32)
    maxabs = jnp.abs(flat).max(axis=1).astype(jnp.int32)
    weights = (1 << jnp.arange(8, dtype=jnp.uint32))
    mask = (gnz.reshape(B, -1, 8).astype(jnp.uint32) * weights)
    mask = mask.sum(-1).astype(jnp.uint8)
    ng = gnz.shape[1]
    idx = jax.vmap(
        lambda m: jnp.where(m, size=cap_g, fill_value=ng - 1)[0]
    )(gnz)
    vals = jnp.take_along_axis(g, idx[..., None], axis=1)
    lane = jnp.arange(cap_g)[None]
    vals = jnp.where((lane < counts[:, None])[..., None], vals, 0)
    vals = jnp.clip(vals, -128, 127).astype(jnp.int8)
    return mask, vals, counts, maxabs


@partial(
    jax.jit,
    static_argnames=(
        "y1_dc", "y1_ac", "y2_dc", "y2_ac", "uv_dc", "uv_ac", "cap_g",
        "engine",
    ),
)
def dense_packed_step(rgb, *, y1_dc, y1_ac, y2_dc, y2_ac, uv_dc, uv_ac,
                      cap_g, engine="wavefront"):
    """uint8 RGB (B, H, W, 3) → packed levels + modes, all on device.

    ``engine`` picks the dense encoder: "wavefront" (exact closed-loop,
    bit-identical to the sequential host encoder) or "openloop" (fully
    parallel, fastest, lower quality from prediction drift).
    H and W must be even (caller pads odd inputs); macroblock padding is
    edge-replicated in-graph to match the host encoder's `_pad_to_mb`.
    Returns dense level tensors too (never fetched unless an image needs
    the escape fallback).
    """
    import jax.numpy as jnp

    B, h, w = rgb.shape[:3]
    plan = _plan(h, w)
    H, W = plan["H"], plan["W"]

    y, u, v = rgb_to_yuv420(rgb)
    y = jnp.pad(y, ((0, 0), (0, H - h), (0, W - w)), mode="edge")
    u = jnp.pad(u, ((0, 0), (0, (H - h) // 2), (0, (W - w) // 2)),
                mode="edge")
    v = jnp.pad(v, ((0, 0), (0, (H - h) // 2), (0, (W - w) // 2)),
                mode="edge")

    dense = encode_wavefront if engine == "wavefront" else encode_plane_core_v2
    out = dense(
        y, u, v,
        y1_dc=y1_dc, y1_ac=y1_ac, y2_dc=y2_dc, y2_ac=y2_ac,
        uv_dc=uv_dc, uv_ac=uv_ac,
    )
    flat = jnp.concatenate(
        [
            out["y2_levels"].reshape(B, -1).astype(jnp.int32),
            out["y_levels"].reshape(B, -1).astype(jnp.int32),
            out["uv_levels"].reshape(B, -1).astype(jnp.int32),
        ],
        axis=1,
    )
    pad = plan["n_group_pad"] * GROUP - plan["n_coeff"]
    if pad:
        flat = jnp.pad(flat, ((0, 0), (0, pad)))
    mask, vals, counts, maxabs = _pack_g4(flat, cap_g)
    return {
        "mask": mask, "vals": vals, "counts": counts, "maxabs": maxabs,
        "ymode": out["ymode"], "uvmode": out["uvmode"],
        "y_levels": out["y_levels"], "y2_levels": out["y2_levels"],
        "uv_levels": out["uv_levels"],
    }


def unpack_g4(mask: np.ndarray, vals: np.ndarray, count: int, plan: dict):
    """G4PACK arrays (one image) → (y2, yl, uvl) int16 views."""
    ng = plan["n_group_pad"]
    bits = np.unpackbits(mask, bitorder="little")[:ng].astype(bool)
    flat = np.zeros((ng, GROUP), np.int16)
    flat[bits] = vals[:count]
    flat = flat.reshape(-1)[: plan["n_coeff"]]
    t = plan["total"]
    y2 = flat[: t * 16].reshape(t, 16)
    yl = flat[t * 16 : t * 272].reshape(t, 16, 16)
    uvl = flat[t * 272 :].reshape(t, 8, 16)
    return y2, yl, uvl


def encode_rgba_batch_pipelined(images, *, quality: float = 75.0,
                                threads: int = 2, chunk: int = 8,
                                config=None, engine: str = "wavefront"):
    """Lossy-encode same-shaped uint8 RGB(A) images, fully pipelined.

    Returns a list of complete .webp byte strings (order preserved).
    Device dispatch of chunk k+1 overlaps the fetch of chunk k and the
    host emission of chunk k-1.  ``engine`` selects the dense encoder
    (see `dense_packed_step`).
    """
    import concurrent.futures as cf

    import jax

    from ..config import EncoderConfig
    from ..constants import CHUNK_VP8
    from ..container.riff import Chunk, assemble_simple
    from ..models.vp8.encoder import (
        emit_frame_arrays,
        make_quants,
        quality_to_q,
    )

    if not images:
        return []
    if config is None:
        config = EncoderConfig(lossless=False, quality=quality)
    base_q = quality_to_q(config.quality)
    base_q = max(config.qmin * 127 // 100,
                 min(config.qmax * 127 // 100, base_q))
    q = make_quants(base_q)
    quants = dict(
        y1_dc=q.y1_dc.q, y1_ac=q.y1_ac.q, y2_dc=q.y2_dc.q, y2_ac=q.y2_ac.q,
        uv_dc=q.uv_dc.q, uv_ac=q.uv_ac.q,
    )

    first = np.asarray(images[0])
    h, w = first.shape[:2]
    plan = _plan(h + (h & 1), w + (w & 1))
    n = len(images)

    def to_rgb(im):
        im = np.asarray(im)
        rgb = im[..., :3]
        if (h & 1) or (w & 1):
            rgb = np.pad(rgb, ((0, h & 1), (0, w & 1), (0, 0)), mode="edge")
        return rgb

    def emit_one(mask_row, vals_row, count, ymode, uvmode, dense=None):
        if dense is None:
            y2, yl, uvl = unpack_g4(mask_row, vals_row, count, plan)
        else:
            y2, yl, uvl = dense
        payload = emit_frame_arrays(
            y2, yl, uvl,
            np.zeros(plan["total"], np.uint8), ymode, uvmode,
            plan["mb_w"], plan["mb_h"], w, h, base_q, config,
        )
        if payload is None:
            raise RuntimeError("native tokenizer unavailable")
        return assemble_simple(Chunk(CHUNK_VP8, payload))

    def fetch_chunk(out, idxs):
        """Blocking d2h of one chunk's packed tensors (fetch thread)."""
        counts = np.asarray(out["counts"])
        maxabs = np.asarray(out["maxabs"])
        kmax = max(1, int(counts[: len(idxs)].max()))
        kmax = min(kmax, plan["cap_g"])
        mask = np.asarray(out["mask"])
        vals = np.asarray(out["vals"][:, :kmax])
        ymode = np.asarray(out["ymode"])
        uvmode = np.asarray(out["uvmode"])
        jobs = []
        for j, gi in enumerate(idxs):
            if maxabs[j] > 127 or counts[j] > plan["cap_g"]:
                t = plan["total"]
                dense = (
                    np.asarray(out["y2_levels"][j]).reshape(t, 16),
                    np.asarray(out["y_levels"][j]).reshape(t, 16, 16),
                    np.asarray(out["uv_levels"][j]).reshape(t, 8, 16),
                )
                jobs.append((gi, None, None, 0, ymode[j], uvmode[j], dense))
            else:
                jobs.append((gi, mask[j], vals[j], int(counts[j]),
                             ymode[j], uvmode[j], None))
        return jobs

    results = [None] * n
    chunk = max(1, chunk)
    starts = list(range(0, n, chunk))

    def dispatch(s):
        idxs = list(range(s, min(s + chunk, n)))
        rgb = np.stack([to_rgb(images[i]) for i in idxs])
        if len(idxs) < chunk:  # keep one compiled shape
            rgb = np.concatenate(
                [rgb, np.repeat(rgb[-1:], chunk - len(idxs), axis=0)]
            )
        dev = jax.device_put(rgb)
        out = dense_packed_step(dev, cap_g=plan["cap_g"], engine=engine,
                                **quants)
        return dev, out, idxs

    with cf.ThreadPoolExecutor(max_workers=max(1, threads)) as emit_pool, \
            cf.ThreadPoolExecutor(max_workers=1) as fetch_pool:
        emit_futs = []
        fetch_fut = None
        prev = None
        for s in starts:
            cur = dispatch(s)  # async device work for this chunk
            if prev is not None:
                _, out, idxs = prev
                fetch_fut = fetch_pool.submit(fetch_chunk, out, idxs)
            if fetch_fut is not None and prev is not None:
                for job in fetch_fut.result():
                    gi, mrow, vrow, cnt, ym, um, dense = job
                    emit_futs.append(
                        (gi, emit_pool.submit(
                            emit_one, mrow, vrow, cnt, ym, um, dense))
                    )
            prev = cur
        _, out, idxs = prev
        for job in fetch_chunk(out, idxs):
            gi, mrow, vrow, cnt, ym, um, dense = job
            emit_futs.append(
                (gi, emit_pool.submit(emit_one, mrow, vrow, cnt, ym, um,
                                      dense))
            )
        for gi, fut in emit_futs:
            results[gi] = fut.result()
    return results


__all__ = [
    "dense_packed_step",
    "encode_rgba_batch_pipelined",
    "unpack_g4",
]
