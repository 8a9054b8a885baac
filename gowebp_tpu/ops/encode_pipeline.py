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
    bit-identical to the sequential host encoder in its i16-only,
    single-segment configuration) or "openloop" (fully parallel,
    fastest, lower quality from prediction drift).
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
        "hdr": jnp.stack([counts, maxabs], axis=1),
        "ymode": out["ymode"], "uvmode": out["uvmode"],
        "y_levels": out["y_levels"], "y2_levels": out["y2_levels"],
        "uv_levels": out["uv_levels"],
    }


@jax.jit
def yuv_activity_step(rgb):
    """Phase A: uint8 RGB → padded YUV planes + per-MB activity sums.

    The activity sums are exact int32 (|4-neighbour laplacian| summed
    per macroblock), so host-side `segments_from_activity(sums / 256)`
    reproduces `analyze_segments` on the host-converted planes bit for
    bit.  Planes stay on device for phase B.
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

    ya = y.astype(jnp.int32)
    lap = jnp.abs(
        4 * ya[:, 1:-1, 1:-1] - ya[:, :-2, 1:-1] - ya[:, 2:, 1:-1]
        - ya[:, 1:-1, :-2] - ya[:, 1:-1, 2:]
    )
    lap = jnp.pad(lap, ((0, 0), (1, 1), (1, 1)))[:, :H, :W]
    act = lap.reshape(B, plan["mb_h"], 16, plan["mb_w"], 16).sum(
        axis=(2, 4), dtype=jnp.int32)
    return {"y": y, "u": u, "v": v, "act": act.reshape(B, -1)}


@partial(jax.jit, static_argnames=("cap_g", "try_i4"))
def wavefront_packed_step(y, u, v, seg_map, qsteps, tables, *, cap_g,
                          try_i4, i4_penalty):
    """Phase B: full closed-loop wavefront encode + G4PACK of levels.

    Same mode decisions as the sequential host encoder (i4 search,
    per-segment quantizers); is_i4/imodes ride along for emission.
    """
    import jax.numpy as jnp

    from .encode_wavefront_jax import encode_wavefront_core

    B, H, W = y.shape
    plan = _plan(H, W)
    out = encode_wavefront_core(
        y.astype(jnp.int32), u.astype(jnp.int32), v.astype(jnp.int32),
        seg_map, qsteps, tables, try_i4=try_i4, i4_penalty=i4_penalty)
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
        "hdr": jnp.stack([counts, maxabs], axis=1),
        "ymode": out["ymode"], "uvmode": out["uvmode"],
        "is_i4": out["is_i4"], "imodes": out["imodes"],
        "y_levels": out["y_levels"], "y2_levels": out["y2_levels"],
        "uv_levels": out["uv_levels"],
    }


def _pack_g4v2(flat, cap_s: int, cap_b: int):
    """(B, n_coeff_pad) int32 → nibble/byte dual-stream pack (G4PACKv2).

    Per 4-coeff group a 2-bit state: 0 = all-zero, 1 = "small" (every
    coeff in [-8, 7] → 4 nibbles = 2 bytes), 2 = "big" (4 int8 = 4
    bytes).  At q≈75 most nonzero groups are small, so this roughly
    halves the device→host payload vs the single int8 stream.
    """
    import jax.numpy as jnp

    B = flat.shape[0]
    g = flat.reshape(B, -1, GROUP)
    gmax = g.max(-1)
    gmin = g.min(-1)
    nz = (g != 0).any(-1)
    small = nz & (gmax <= 7) & (gmin >= -8)
    state = jnp.where(nz, jnp.where(small, 1, 2), 0).astype(jnp.uint32)
    counts_s = small.sum(1).astype(jnp.int32)
    counts_b = (state == 2).sum(1).astype(jnp.int32)
    maxabs = jnp.abs(flat).max(1).astype(jnp.int32)
    w4 = jnp.array([1, 4, 16, 64], jnp.uint32)
    mask2 = (state.reshape(B, -1, 4) * w4).sum(-1).astype(jnp.uint8)
    ng = g.shape[1]

    def gather(pred, cap, counts, pad_val):
        idx = jax.vmap(
            lambda m: jnp.where(m, size=cap, fill_value=ng - 1)[0]
        )(pred)
        vals = jnp.take_along_axis(g, idx[..., None], axis=1)
        lane = jnp.arange(cap)[None]
        return jnp.where((lane < counts[:, None])[..., None], vals, pad_val)

    gs = gather(small, cap_s, counts_s, -8)
    n = (gs + 8).astype(jnp.uint32) & 0xF
    small_b = jnp.stack(
        [(n[..., 0] | (n[..., 1] << 4)).astype(jnp.uint8),
         (n[..., 2] | (n[..., 3] << 4)).astype(jnp.uint8)], axis=-1)
    gb = gather(state == 2, cap_b, counts_b, 0)
    big_b = jnp.clip(gb, -128, 127).astype(jnp.int8)
    return mask2, small_b, big_b, counts_s, counts_b, maxabs


def unpack_g4v2(mask2: np.ndarray, small: np.ndarray, big: np.ndarray,
                cs: int, cb: int, plan: dict):
    """G4PACKv2 arrays (one image) → (y2, yl, uvl) int16 views."""
    ng = plan["n_group_pad"]
    states = (
        (mask2[:, None] >> (2 * np.arange(4, dtype=np.uint8))) & 3
    ).reshape(-1)[:ng]
    flat = np.zeros((ng, GROUP), np.int16)
    s_idx = np.nonzero(states == 1)[0]
    sm = small[:cs]
    flat[s_idx] = (
        np.stack([sm[:, 0] & 0xF, sm[:, 0] >> 4,
                  sm[:, 1] & 0xF, sm[:, 1] >> 4], axis=-1).astype(np.int16)
        - 8
    )
    b_idx = np.nonzero(states == 2)[0]
    flat[b_idx] = big[:cb].astype(np.int16)
    flat = flat.reshape(-1)[: plan["n_coeff"]]
    t = plan["total"]
    y2 = flat[: t * 16].reshape(t, 16)
    yl = flat[t * 16 : t * 272].reshape(t, 16, 16)
    uvl = flat[t * 272 :].reshape(t, 8, 16)
    return y2, yl, uvl


def _levels_to_flat(out, plan):
    import jax.numpy as jnp

    B = out["y_levels"].shape[0]
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
    return flat


@partial(
    jax.jit,
    static_argnames=(
        "y1_dc", "y1_ac", "y2_dc", "y2_ac", "uv_dc", "uv_ac",
        "cap_s", "cap_b",
    ),
)
def planes_packed_step(y, u, v, *, y1_dc, y1_ac, y2_dc, y2_ac, uv_dc,
                       uv_ac, cap_s, cap_b):
    """uint8 MB-padded YUV420 planes → open-loop dense encode + G4PACKv2.

    Planes arrive host-converted (native `rgb_to_yuv420`, 1.5 B/px on
    the wire instead of 3 B/px RGB) and already edge-padded to
    macroblock multiples.
    """
    import jax.numpy as jnp

    B, H, W = y.shape
    plan = _plan(H, W)
    out = encode_plane_core_v2(
        y.astype(jnp.int32), u.astype(jnp.int32), v.astype(jnp.int32),
        y1_dc=y1_dc, y1_ac=y1_ac, y2_dc=y2_dc, y2_ac=y2_ac,
        uv_dc=uv_dc, uv_ac=uv_ac,
    )
    flat = _levels_to_flat(out, plan)
    mask2, small, big, cs, cb, maxabs = _pack_g4v2(flat, cap_s, cap_b)
    return {
        "mask2": mask2, "small": small, "big": big,
        "hdr": jnp.stack([cs, cb, maxabs], axis=1),
        "ymode": out["ymode"], "uvmode": out["uvmode"],
        "y_levels": out["y_levels"], "y2_levels": out["y2_levels"],
        "uv_levels": out["uv_levels"],
    }


@partial(jax.jit, static_argnames=("H", "W"))
def _split_flat(buf, *, H, W):
    """One fused h2d buffer (B, H*W*3/2) uint8 → (y, u, v) planes.

    Three separate device_puts cost three tunnel round trips (~30 ms
    each); one large transfer runs at full link bandwidth.
    """
    B = buf.shape[0]
    ys = H * W
    cs = (H // 2) * (W // 2)
    y = buf[:, :ys].reshape(B, H, W)
    u = buf[:, ys:ys + cs].reshape(B, H // 2, W // 2)
    v = buf[:, ys + cs:].reshape(B, H // 2, W // 2)
    return y, u, v


@jax.jit
def activity_step(y):
    """Padded uint8 Y plane → per-MB int32 activity sums (see
    yuv_activity_step)."""
    import jax.numpy as jnp

    B, H, W = y.shape
    ya = y.astype(jnp.int32)
    lap = jnp.abs(
        4 * ya[:, 1:-1, 1:-1] - ya[:, :-2, 1:-1] - ya[:, 2:, 1:-1]
        - ya[:, 1:-1, :-2] - ya[:, 1:-1, 2:]
    )
    lap = jnp.pad(lap, ((0, 0), (1, 1), (1, 1)))[:, :H, :W]
    act = lap.reshape(B, H // 16, 16, W // 16, 16).sum(
        axis=(2, 4), dtype=jnp.int32)
    return act.reshape(B, -1)


@partial(jax.jit, static_argnames=("cap_s", "cap_b", "try_i4", "search",
                                   "use_derr", "refine", "cold", "i4_topk"))
def planes_wavefront_packed_step(y, u, v, seg_map, qsteps, tables, *,
                                 cap_s, cap_b, try_i4, i4_penalty,
                                 search: str = "closed",
                                 use_derr: bool = False,
                                 refine: int = 1, cold: str = "i16",
                                 i4_topk=None):
    """Closed-loop wavefront encode from uint8 planes + G4PACKv2.

    search="closed": full in-loop RD mode search (bit-identical to the
    sequential host encoder).  search="open": hybrid engine — open-loop
    parallel mode search, exact fixed-mode closed-loop coding (~30x
    less sequential work, same zero-drift stream).  ``refine`` (hybrid
    only) is the number of recon-context refinement rounds: 1 matches
    the round-3 default; 0 halves the device time for ~0.5% bytes.
    """
    import jax.numpy as jnp

    from .encode_wavefront_jax import (
        encode_hybrid_core, encode_wavefront_core)

    B, H, W = y.shape
    plan = _plan(H, W)
    if search == "open":
        # cold-start i4 decisions from the parallel plane-context
        # search (half the Gauss-Seidel cost; +0.5% bytes measured,
        # still under libwebp size at equal PSNR — the refine round's
        # Seidel walk makes the decisions that ship)
        dense = partial(encode_hybrid_core, refine=refine,
                        i4_parallel=True, cold=cold, i4_topk=i4_topk)
    else:
        dense = encode_wavefront_core
    out = dense(
        y.astype(jnp.int32), u.astype(jnp.int32), v.astype(jnp.int32),
        seg_map, qsteps, tables, try_i4=try_i4, i4_penalty=i4_penalty,
        use_derr=use_derr)
    flat = _levels_to_flat(out, plan)
    mask2, small, big, cs, cb, maxabs = _pack_g4v2(flat, cap_s, cap_b)
    return {
        "mask2": mask2, "small": small, "big": big,
        "hdr": jnp.stack([cs, cb, maxabs], axis=1),
        "ymode": out["ymode"], "uvmode": out["uvmode"],
        "is_i4": out["is_i4"], "imodes": out["imodes"],
        "y_levels": out["y_levels"], "y2_levels": out["y2_levels"],
        "uv_levels": out["uv_levels"],
    }


@partial(jax.jit, static_argnames=("ks", "kb", "with_i4"))
def _export_packed_v2(out, *, ks, kb, with_i4):
    """One fused uint8 d2h buffer for G4PACKv2 (see _export_packed).

    The (counts_s, counts_b, maxabs) header rides in the buffer's first
    12 bytes per image, so a steady-state chunk costs exactly ONE d2h
    round trip: the host slices streams at the sticky (ks, kb) buckets
    and re-exports at bigger buckets only when a chunk overflows them.
    """
    import jax.numpy as jnp

    B = out["mask2"].shape[0]
    parts = [
        lax_bitcast_u8(out["hdr"]).reshape(B, -1),
        out["mask2"],
        out["small"][:, :ks].reshape(B, -1),
        lax_bitcast_u8(out["big"][:, :kb]).reshape(B, -1),
        out["ymode"].reshape(B, -1).astype(jnp.uint8),
        out["uvmode"].reshape(B, -1).astype(jnp.uint8),
    ]
    if with_i4:
        parts.append(out["is_i4"].reshape(B, -1).astype(jnp.uint8))
        parts.append(out["imodes"].reshape(B, -1).astype(jnp.uint8))
    return jnp.concatenate(parts, axis=1)


def _bucket(kmax: int, cap: int) -> int:
    """Round a chunk's max group count up to a power of two (≥4096).

    The d2h exporter is jit-compiled per bucket; real kmax varies per
    chunk, so bucketing keeps the executable cache tiny (≲6 shapes)
    instead of recompiling a slice (+~0.5 s) for every chunk.
    """
    b = 4096
    while b < kmax:
        b *= 2
    return min(b, cap)


@partial(jax.jit, static_argnames=("kbucket", "with_i4"))
def _export_packed(out, *, kbucket, with_i4):
    """Fuse every host-bound tensor into ONE uint8 buffer (one d2h).

    The dev→host link here is a tunnel with ~30 ms per-transfer latency;
    fetching mask/vals/modes separately costs 5-6 round trips per chunk.
    Layout per image (host splits by static offsets):
      [mask bytes | vals int8 (kbucket*4) | ymode | uvmode
       | is_i4 | imodes*16 (wavefront only)]
    """
    import jax.numpy as jnp

    B = out["mask"].shape[0]
    parts = [
        out["mask"],
        lax_bitcast_u8(out["vals"][:, :kbucket]).reshape(B, -1),
        out["ymode"].reshape(B, -1).astype(jnp.uint8),
        out["uvmode"].reshape(B, -1).astype(jnp.uint8),
    ]
    if with_i4:
        parts.append(out["is_i4"].reshape(B, -1).astype(jnp.uint8))
        parts.append(out["imodes"].reshape(B, -1).astype(jnp.uint8))
    return jnp.concatenate(parts, axis=1)


def lax_bitcast_u8(x):
    import jax.numpy as jnp
    from jax import lax

    return lax.bitcast_convert_type(x, jnp.uint8)


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
                                config=None, engine: str = "wavefront",
                                depth: int = 3, timings: dict | None = None,
                                refine: int = 1, cold: str = "i16",
                                i4_topk=None):
    """Lossy-encode same-shaped uint8 RGB(A) images, fully pipelined.

    Returns a list of complete .webp byte strings (order preserved).
    Stages overlapped across chunks (`depth` in flight): host YUV
    conversion (native, thread pool) → h2d planes (1.5 B/px) → device
    dense encode + G4PACKv2 → one fused d2h buffer → host unpack +
    entropy emission (thread pool).

    engine="wavefront" runs the full closed-loop path — segmentation,
    i4 mode search at method >= 4, per-segment quantizers — and each
    output file is bit-identical to `encode_rgba(im, config)` with
    plane_backend="jax" (which itself equals the sequential host
    encoder).  engine="openloop" is the reduced open-loop fast path.
    """
    import concurrent.futures as cf

    import jax
    import jax.numpy as jnp

    from ..config import EncoderConfig
    from ..constants import CHUNK_VP8
    from ..container.riff import Chunk, assemble_simple
    from ..models.vp8.encoder import (
        _default_cost_tables,
        _segment_tree_probs,
        emit_frame_arrays,
        make_quants,
        quality_to_q,
    )

    if not images:
        return []
    import time as _time

    if timings is None:
        timings = {}
    for k in ("prep", "h2d", "fetch", "emit_thread_s", "total"):
        timings.setdefault(k, 0.0)

    def _acc(key, t0):
        timings[key] += _time.perf_counter() - t0

    _t_total = _time.perf_counter()
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
    wavefront = engine in ("wavefront", "hybrid")
    if wavefront:
        from ..models.vp8.encoder import _i4_config_seg

        tp0, tp1, tval = _default_cost_tables()
        tables = tuple(jnp.asarray(t.astype(np.int32))
                       for t in (tp0, tp1, tval))
        try_i4, _ = _i4_config_seg(np.zeros((4, 6), np.int32),
                                   config.method, config.partition_limit)
        from ..models.vp8.encoder import ERROR_DIFFUSION_QUALITY

        use_derr = config.quality <= ERROR_DIFFUSION_QUALITY

    def qrow(sq):
        return (sq.y1_dc.q, sq.y1_ac.q, sq.y2_dc.q, sq.y2_ac.q,
                sq.uv_dc.q, sq.uv_ac.q)

    base_row = np.array(qrow(q), np.int32)

    first = np.asarray(images[0])
    h, w = first.shape[:2]
    plan = _plan(h + (h & 1), w + (w & 1))
    n = len(images)
    H, W = plan["H"], plan["W"]
    cap_s = plan["n_group_pad"] // 2
    cap_b = plan["n_group_pad"] // 4

    def prep_planes(im):
        """Host: RGB(A) → MB-padded uint8 YUV420 planes (native kernel,
        identical fixed-point math to the device conversion)."""
        from ..models.vp8.encoder import rgb_to_yuv420 as host_yuv

        im = np.asarray(im)
        rgb = im[..., :3]
        if (h & 1) or (w & 1):
            rgb = np.pad(rgb, ((0, h & 1), (0, w & 1), (0, 0)), mode="edge")
        yp, up, vp = host_yuv(rgb)
        h2, w2 = yp.shape
        yp = np.pad(yp.astype(np.uint8), ((0, H - h2), (0, W - w2)),
                    mode="edge")
        up = np.pad(up.astype(np.uint8),
                    ((0, H // 2 - up.shape[0]), (0, W // 2 - up.shape[1])),
                    mode="edge")
        vp = np.pad(vp.astype(np.uint8),
                    ((0, H // 2 - vp.shape[0]), (0, W // 2 - vp.shape[1])),
                    mode="edge")
        return yp, up, vp

    def emit_one(small_pack, big_vals, count_b, ymode, uvmode, dense=None,
                 is_i4=None, imodes=None, seg=None):
        _t0 = _time.perf_counter()
        try:
            return _emit_one(small_pack, big_vals, count_b, ymode, uvmode,
                             dense, is_i4, imodes, seg)
        finally:
            _acc("emit_thread_s", _t0)

    def _emit_one(small_pack, big_vals, count_b, ymode, uvmode, dense,
                  is_i4, imodes, seg):
        if dense is None:
            mask2, small, count_s = small_pack
            y2, yl, uvl = unpack_g4v2(mask2, small, big_vals, count_s,
                                      count_b, plan)
        else:
            y2, yl, uvl = dense
        if is_i4 is None:
            is_i4 = np.zeros(plan["total"], np.uint8)
        payload = emit_frame_arrays(
            y2, yl, uvl, is_i4, ymode, uvmode,
            plan["mb_w"], plan["mb_h"], w, h, base_q, config,
            imodes=imodes, seg=seg,
        )
        if payload is None:
            raise RuntimeError("native tokenizer unavailable")
        return assemble_simple(Chunk(CHUNK_VP8, payload))

    results = [None] * n
    chunk = max(1, chunk)
    starts = list(range(0, n, chunk))

    ys_len = H * W
    cs_len = (H // 2) * (W // 2)

    def prep_one(im):
        """Host: planes + flat wire buffer slice + segmentation.

        Segmentation runs here (host, thread pool) instead of a
        device activity round trip — the per-chunk d2h latency (~30 ms
        through the tunnel) used to serialize the dispatch loop.
        """
        yp, up, vp = prep_planes(im)
        flat = np.empty(ys_len + 2 * cs_len, np.uint8)
        flat[:ys_len] = yp.reshape(-1)
        flat[ys_len:ys_len + cs_len] = up.reshape(-1)
        flat[ys_len + cs_len:] = vp.reshape(-1)
        rows = np.broadcast_to(base_row, (4, 6))
        seg = None
        if wavefront and config.segments > 1:
            from ..models.vp8.encoder import analyze_segments

            seg_map, deltas = analyze_segments(
                yp, plan["mb_w"], plan["mb_h"],
                config.segments, config.sns_strength, base_q)
            if len(set(deltas[: config.segments])) > 1:
                seg = {
                    "map": seg_map,
                    "deltas": deltas,
                    "probs": _segment_tree_probs(seg_map),
                    "quants": [make_quants(max(0, min(127, base_q + d)))
                               for d in deltas],
                }
                rows = np.array([qrow(s) for s in seg["quants"]], np.int32)
        if wavefront:
            from ..models.vp8.encoder import _i4_config_seg

            _, pens = _i4_config_seg(rows, config.method,
                                     config.partition_limit)
        else:
            pens = np.zeros(4, np.int32)
        return flat, seg, rows, pens

    def prep_chunk(s, pool):
        idxs = list(range(s, min(s + chunk, n)))
        prepped = list(pool.map(prep_one, (images[i] for i in idxs)))
        while len(prepped) < chunk:  # keep one compiled shape
            prepped.append(prepped[-1])
        buf = np.stack([p[0] for p in prepped])
        segs = [p[1] for p in prepped]
        qs = np.stack([p[2] for p in prepped])
        pens = np.stack([p[3] for p in prepped])
        return buf, segs, qs, pens, idxs

    def dispatch(prepped):
        buf, segs, qs, pens, idxs = prepped
        _t0 = _time.perf_counter()
        bd = jax.device_put(buf)                     # ONE h2d transfer
        jax.block_until_ready(bd)
        _acc("h2d", _t0)
        yd, ud, vd = _split_flat(bd, H=H, W=W)
        if not wavefront:
            out = planes_packed_step(yd, ud, vd, cap_s=cap_s, cap_b=cap_b,
                                     **quants)
            return out, idxs, None
        seg_maps = np.stack([
            (seg["map"].reshape(plan["mb_h"], plan["mb_w"]).astype(np.int32)
             if seg is not None
             else np.zeros((plan["mb_h"], plan["mb_w"]), np.int32))
            for seg in segs
        ])
        out = planes_wavefront_packed_step(
            yd, ud, vd,
            jax.device_put(seg_maps), jax.device_put(qs), tables,
            cap_s=cap_s, cap_b=cap_b, try_i4=try_i4,
            i4_penalty=jax.device_put(pens),
            search=("open" if engine == "hybrid" else "closed"),
            use_derr=use_derr, refine=refine, cold=cold,
            i4_topk=i4_topk)
        return out, idxs, segs[: len(idxs)]

    # Sticky export buckets: start minimal, grow on overflow; every
    # (ks, kb) pair compiles one export executable, so growth is
    # monotone and the cache stays tiny.
    sticky = {"ks": min(4096, cap_s), "kb": min(4096, cap_b)}

    def fetch_and_emit(out, idxs, segs, emit_pool):
        """Blocking d2h of one chunk (fetch thread) → emit futures.

        Steady state: ONE d2h round trip (header rides in the fused
        buffer).  A chunk whose counts overflow the sticky buckets is
        re-exported once at the grown buckets.
        """
        with_i4 = "is_i4" in out
        t = plan["total"]
        n_mask = plan["n_group_pad"] // 4

        def fetch(ks, kb):
            _t0 = _time.perf_counter()
            buf = np.asarray(_export_packed_v2(out, ks=ks, kb=kb,
                                               with_i4=with_i4))
            _acc("fetch", _t0)
            hdr = buf[:, :12].copy().view(np.int32).reshape(-1, 3)
            return buf, hdr[:, 0], hdr[:, 1], hdr[:, 2]

        ks, kb = sticky["ks"], sticky["kb"]
        buf, cs, cb, maxabs = fetch(ks, kb)
        need_ks = _bucket(max(1, int(cs[: len(idxs)].max())), cap_s)
        need_kb = _bucket(max(1, int(cb[: len(idxs)].max())), cap_b)
        if need_ks > ks or need_kb > kb:
            ks, kb = max(ks, need_ks), max(kb, need_kb)
            sticky["ks"], sticky["kb"] = ks, kb
            buf, cs, cb, maxabs = fetch(ks, kb)
        nb = len(cs)
        o = 12
        mask2 = buf[:, o:o + n_mask]; o += n_mask
        small = buf[:, o:o + ks * 2].reshape(nb, ks, 2); o += ks * 2
        big = buf[:, o:o + kb * GROUP].view(np.int8).reshape(nb, kb, GROUP)
        o += kb * GROUP
        ymode = buf[:, o:o + t]; o += t
        uvmode = buf[:, o:o + t]; o += t
        if with_i4:
            is_i4 = buf[:, o:o + t]; o += t
            imodes = buf[:, o:o + t * 16].reshape(nb, t, 16)
        else:
            is_i4 = imodes = None
        futs = []
        for j, gi in enumerate(idxs):
            seg = segs[j] if segs is not None else None
            i4j = is_i4[j] if is_i4 is not None else None
            imj = imodes[j] if imodes is not None else None
            if maxabs[j] > 127 or cs[j] > cap_s or cb[j] > cap_b:
                dense = (
                    np.asarray(out["y2_levels"][j]).reshape(t, 16),
                    np.asarray(out["y_levels"][j]).reshape(t, 16, 16),
                    np.asarray(out["uv_levels"][j]).reshape(t, 8, 16),
                )
                futs.append((gi, emit_pool.submit(
                    emit_one, None, None, 0, ymode[j], uvmode[j], dense,
                    i4j, imj, seg)))
            else:
                futs.append((gi, emit_pool.submit(
                    emit_one, (mask2[j], small[j], int(cs[j])),
                    big[j], int(cb[j]), ymode[j], uvmode[j], None,
                    i4j, imj, seg)))
        return futs

    from collections import deque

    def prep_timed(s, pool):
        _t0 = _time.perf_counter()
        try:
            return prep_chunk(s, pool)
        finally:
            _acc("prep", _t0)

    ahead = max(1, depth)
    with cf.ThreadPoolExecutor(max_workers=max(1, threads)) as emit_pool, \
            cf.ThreadPoolExecutor(max_workers=2) as prep_pool, \
            cf.ThreadPoolExecutor(max_workers=1) as fetch_pool:
        emit_futs = []
        pending = deque()
        # Look-ahead prep: host YUV/segmentation for the next `depth`
        # chunks runs in the pools while the main thread is busy with
        # the current chunk's h2d upload (the two used to serialize,
        # costing ~2/3 of the wall clock).
        prep_futs = deque(
            prep_pool.submit(prep_timed, s, emit_pool)
            for s in starts[:ahead])
        for i in range(len(starts)):
            prepped = prep_futs.popleft().result()
            if i + ahead < len(starts):
                prep_futs.append(
                    prep_pool.submit(prep_timed, starts[i + ahead],
                                     emit_pool))
            out, idxs, segs = dispatch(prepped)
            pending.append(
                fetch_pool.submit(fetch_and_emit, out, idxs, segs,
                                  emit_pool))
            while len(pending) >= ahead:
                emit_futs.extend(pending.popleft().result())
        while pending:
            emit_futs.extend(pending.popleft().result())
        for gi, fut in emit_futs:
            results[gi] = fut.result()
    _acc("total", _t_total)
    return results


__all__ = [
    "dense_packed_step",
    "encode_rgba_batch_pipelined",
    "planes_packed_step",
    "planes_wavefront_packed_step",
    "unpack_g4",
    "unpack_g4v2",
]
