"""Build + load the native C++ entropy layer (ctypes).

Compiles gowebp_tpu/entropy/native/*.cpp into one shared library on
first use (cached by source hash).  Every native function has a pure
Python/NumPy fallback; `available()` gates usage.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from pathlib import Path

_NATIVE_DIR = Path(__file__).parent / "native"
_BUILD_DIR = _NATIVE_DIR / "_build"
_lock = threading.Lock()
_lib = None
_tried = False


def _sources() -> list[Path]:
    return sorted(_NATIVE_DIR.glob("*.cpp"))


def _build() -> Path | None:
    srcs = _sources()
    if not srcs:
        return None
    h = hashlib.sha256()
    for s in srcs:
        h.update(s.read_bytes())
    tag = h.hexdigest()[:16]
    _BUILD_DIR.mkdir(exist_ok=True)
    so_path = _BUILD_DIR / f"libwtpu_{tag}.so"
    if so_path.exists():
        return so_path
    cmd = [
        "g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-pthread",
        "-fno-exceptions", "-march=native", "-funroll-loops",
        "-o", str(so_path),
    ] + [str(s) for s in srcs]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired):
        # Retry without the arch-specific flags (portability fallback).
        cmd = [
            "g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-pthread",
            "-fno-exceptions", "-o", str(so_path),
        ] + [str(s) for s in srcs]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        except (subprocess.CalledProcessError, FileNotFoundError,
                subprocess.TimeoutExpired):
            return None
    return so_path


def get_lib():
    """The loaded CDLL, or None if the native layer is unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        # NOTE: _tried must be written LAST — the unlocked fast path
        # above reads it without the lock, and marking "tried" before
        # _lib is assigned would make concurrent callers see a
        # permanent None (observed with the pipelined batch encoder's
        # emit thread pool).
        lib = None
        so = _build()
        if so is not None:
            try:
                lib = ctypes.CDLL(str(so))
                _configure(lib)
            except OSError:
                lib = None
        _lib = lib
        _tried = True
    return _lib


def available() -> bool:
    return get_lib() is not None


def _configure(lib) -> None:
    c = ctypes
    u8p = c.POINTER(c.c_uint8)
    i32p = c.POINTER(c.c_int32)
    u32p = c.POINTER(c.c_uint32)
    u64p = c.POINTER(c.c_uint64)

    lib.wtpu_vp8l_decode_pixels.restype = c.c_int
    lib.wtpu_vp8l_decode_pixels.argtypes = [
        u8p, c.c_uint64, c.c_uint64,          # data, size, bit_pos
        c.c_int, c.c_int, c.c_int,            # width, height, num_groups
        i32p, i32p, i32p,                     # alphabet_sizes, lengths, offsets
        i32p, c.c_int, c.c_int,               # huffman_image, bits, meta_w
        c.c_int,                              # cache_bits
        u32p, u64p,                           # out, bit_pos_out
    ]

    lib.wtpu_vp8l_add_green.restype = None
    lib.wtpu_vp8l_add_green.argtypes = [u32p, c.c_int64]
    lib.wtpu_vp8l_color_inverse.restype = None
    lib.wtpu_vp8l_color_inverse.argtypes = [
        u32p, c.c_int, c.c_int, u32p, c.c_int, c.c_int,
    ]
    lib.wtpu_argb_to_rgba.restype = None
    lib.wtpu_argb_to_rgba.argtypes = [u32p, u8p, c.c_int64]

    lib.wtpu_vp8l_predictor_inverse.restype = None
    lib.wtpu_vp8l_predictor_inverse.argtypes = [
        u32p, c.c_int, c.c_int, u32p, c.c_int, c.c_int,
    ]

    lib.wtpu_vp8_token_stats.restype = c.c_int
    lib.wtpu_vp8_token_stats.argtypes = [
        c.POINTER(c.c_int16), c.POINTER(c.c_int16), c.POINTER(c.c_int16),
        u8p, c.c_int, c.c_int, c.POINTER(c.c_int64), u8p,
    ]
    lib.wtpu_vp8_token_emit.restype = c.c_int
    lib.wtpu_vp8_token_emit.argtypes = [
        c.POINTER(c.c_int16), c.POINTER(c.c_int16), c.POINTER(c.c_int16),
        u8p, c.c_int, c.c_int, u8p, c.c_int, u8p,
        c.POINTER(c.POINTER(c.c_uint8)), u64p,
    ]
    lib.wtpu_vp8_token_emit_multi.restype = c.c_int
    lib.wtpu_vp8_token_emit_multi.argtypes = [
        c.POINTER(c.c_int16), c.POINTER(c.c_int16), c.POINTER(c.c_int16),
        u8p, c.c_int, c.c_int, u8p, c.c_int, u8p, c.c_int,
        c.POINTER(c.POINTER(c.c_uint8)), u64p, u64p,
    ]
    lib.wtpu_vp8_write_modes.restype = c.c_int
    lib.wtpu_vp8_write_modes.argtypes = [
        u8p, c.c_uint64, c.c_uint64, c.c_uint32, c.c_int,
        u8p, u8p, u8p, u8p, u8p, u8p,
        c.c_int, c.c_int,
        c.c_int, c.c_int, u8p,
        c.POINTER(c.POINTER(c.c_uint8)), u64p,
    ]
    lib.wtpu_free.restype = None
    lib.wtpu_free.argtypes = [c.c_void_p]
    lib.wtpu_vp8l_emit.restype = c.c_int
    lib.wtpu_vp8l_emit.argtypes = [
        u8p, u32p, i32p, i32p, c.c_int64, c.c_int,
        c.POINTER(c.c_uint16), u8p, i32p,
        i32p, c.c_int,
        c.c_uint32, c.c_int,
        c.POINTER(c.POINTER(c.c_uint8)), u64p,
        u32p, i32p,
    ]

    lib.wtpu_vp8l_emit_grouped.restype = c.c_int
    lib.wtpu_vp8l_emit_grouped.argtypes = [
        u8p, u32p, i32p, i32p, i32p, c.c_int64, c.c_int,
        c.POINTER(c.c_uint16), u8p, i32p, c.c_int,
        i32p, c.c_int,
        c.c_uint32, c.c_int,
        c.POINTER(c.POINTER(c.c_uint8)), u64p,
        u32p, i32p,
    ]
    lib.wtpu_vp8l_hashchain_refs.restype = c.c_int64
    lib.wtpu_vp8l_hashchain_refs.argtypes = [
        u32p, c.c_int64, c.c_int, c.c_int, c.c_int,
        u8p, u32p, i32p, i32p,
    ]
    lib.wtpu_vp8l_greedy_refs.restype = c.c_int64
    lib.wtpu_vp8l_greedy_refs.argtypes = [
        u32p, c.c_int64, c.c_int, c.c_int, c.c_int,
        u8p, u32p, i32p, i32p,
    ]
    lib.wtpu_rgba_to_yuv420.restype = None
    lib.wtpu_rgba_to_yuv420.argtypes = [
        u8p, c.c_int, c.c_int, u8p, u8p, u8p,
    ]
    lib.wtpu_vp8l_choose_predictors.restype = None
    lib.wtpu_vp8l_choose_predictors.argtypes = [
        u32p, c.c_int, c.c_int, c.c_int, c.c_int, c.c_int, u8p,
    ]
    lib.wtpu_vp8l_cross_color_fit.restype = None
    lib.wtpu_vp8l_cross_color_fit.argtypes = [
        u32p, c.c_int, c.c_int, c.c_int, c.c_int,
        c.POINTER(c.c_int8), c.POINTER(c.c_double),
    ]
    lib.wtpu_vp8l_predictor_residual.restype = None
    lib.wtpu_vp8l_predictor_residual.argtypes = [
        u32p, c.c_int, c.c_int, c.c_int, u32p, c.c_int, u32p,
    ]
    lib.wtpu_vp8l_cache_score.restype = None
    lib.wtpu_vp8l_cache_score.argtypes = [
        u8p, u32p, i32p, c.c_int64, u32p, c.c_int,
        c.POINTER(c.c_double),
    ]
    lib.wtpu_vp8l_cache_apply.restype = None
    lib.wtpu_vp8l_cache_apply.argtypes = [
        u8p, u32p, i32p, c.c_int64, u32p, c.c_int,
    ]
    f32p = c.POINTER(c.c_float)
    lib.wtpu_vp8l_optimal_refs.restype = c.c_int64
    lib.wtpu_vp8l_optimal_refs.argtypes = [
        u32p, c.c_int64, c.c_int, c.c_int, c.c_int,
        f32p, f32p, f32p, f32p, f32p,
        i32p, c.c_int,
        u8p, u32p, i32p, i32p,
    ]

    i16p = c.POINTER(c.c_int16)
    lib.wtpu_vp8_encode_frame.restype = c.c_int
    u16p = c.POINTER(c.c_uint16)
    lib.wtpu_vp8_encode_frame.argtypes = [
        u8p, u8p, u8p, c.c_int, c.c_int, i32p,
        c.c_int, i32p, c.c_int, u8p,
        u16p, u16p, u16p, i32p,
        i16p, i16p, i16p, u8p, u8p, u8p, u8p,
        u8p, u8p, u8p,
    ]

    lib.wtpu_yuv_to_rgba_fancy.restype = None
    lib.wtpu_yuv_to_rgba_fancy.argtypes = [
        u8p, u8p, u8p, c.c_int, c.c_int, c.c_int, c.c_int, u8p,
    ]

    lib.wtpu_vp8_decode_frame.restype = c.c_int
    lib.wtpu_vp8_decode_frame.argtypes = [
        u8p, c.c_uint64, c.c_uint64, c.c_uint32, c.c_uint32, c.c_uint32,
        u8p, u64p, c.c_int,                   # parts, offsets, num_parts
        c.c_int, c.c_int,                     # mb_w, mb_h
        c.c_int, u8p,                         # update_map, segment_probs
        c.c_int, c.c_int,                     # use_skip, skip_p
        u8p, i32p,                            # coeff_probs, quants
        c.c_int, i32p,                        # filter_type, finfo
        u8p, u8p, u8p,                        # y, u, v out
        i32p,                                 # dither_amps[4]
    ]

    i8p = c.POINTER(c.c_int8)
    i16p_ = c.POINTER(c.c_int16)
    if hasattr(lib, "wtpu_vp8_pack_stats"):
        lib.wtpu_vp8_pack_stats.restype = None
        lib.wtpu_vp8_pack_stats.argtypes = [
            i16p_, u8p, u8p, i32p, c.c_int, c.c_int, i32p,
        ]
        lib.wtpu_vp8_pack_emit.restype = c.c_int
        lib.wtpu_vp8_pack_emit.argtypes = [
            i16p_, u8p, u8p, i32p, c.c_int, c.c_int, c.c_int,
            i8p, i16p_,                       # lv8, dc16
            i32p, i8p, c.c_int64,             # tail idx/val/cap
            i32p, i16p_, c.c_int64,           # exc idx/val/cap
            c.POINTER(c.c_int64),             # counts_out[2]
        ]

    if hasattr(lib, "wtpu_vp8_decode_frame_mt"):
        lib.wtpu_vp8_decode_frame_mt.restype = c.c_int
        lib.wtpu_vp8_decode_frame_mt.argtypes = \
            lib.wtpu_vp8_decode_frame.argtypes

    lib.wtpu_vp8l_read_groups.restype = c.c_int
    lib.wtpu_vp8l_read_groups.argtypes = [
        u8p, c.c_uint64, c.c_uint64,          # data, size, bit_pos
        c.c_int, i32p,                        # num_groups, alphabet_sizes[5]
        i32p, u64p,                           # lengths_out, bit_pos_out
    ]

    lib.wtpu_vp8_recon_frame_arrays.restype = c.c_int
    lib.wtpu_vp8_recon_frame_arrays.argtypes = [
        i16p, u8p,                            # coeffs (N,24,16), modes (N,21)
        c.c_int, c.c_int,                     # mb_w, mb_h
        c.c_int, i32p,                        # filter_type, finfo
        i32p,                                 # dither_amps[4] (NULL = off)
        u8p, u8p, u8p,                        # y, u, v out
    ]

    lib.wtpu_vp8_decode_symbols.restype = c.c_int
    lib.wtpu_vp8_decode_symbols.argtypes = [
        u8p, c.c_uint64, c.c_uint64, c.c_uint32, c.c_uint32, c.c_uint32,
        u8p, u64p, c.c_int,                   # parts, offsets, num_parts
        c.c_int, c.c_int,                     # mb_w, mb_h
        c.c_int, u8p,                         # update_map, segment_probs
        c.c_int, c.c_int,                     # use_skip, skip_p
        u8p, i32p,                            # coeff_probs, quants
        i16p, u8p,                            # coeffs_out, modes_out
    ]

    lib.wtpu_vp8_parse_probs.restype = c.c_int
    lib.wtpu_vp8_parse_probs.argtypes = [
        u8p, c.c_uint64, u64p,                # data, size, state[4]
        u8p, u8p,                             # update_probs, probs (inout)
    ]

    lib.wtpu_vp8_batch_is_vectorized.restype = c.c_int
    lib.wtpu_vp8_batch_is_vectorized.argtypes = []

    lib.wtpu_vp8_decode_symbols_batch.restype = c.c_int
    lib.wtpu_vp8_decode_symbols_batch.argtypes = [
        c.c_int,                              # n_img
        u8p, u64p,                            # p0_all, p0_off
        u64p, u32p, u32p, u32p,               # p0 pos/value/range/bitcount
        u8p, u64p,                            # parts_all, parts_off
        u64p, i32p,                           # part_bounds, part_bounds_off
        i32p,                                 # num_parts
        i32p, i32p,                           # mb_dims, hdr_flags
        u8p, u8p, i32p,                       # seg_probs, coeff_probs, quants
        i16p, u64p,                           # coeffs_all, coeffs_off
        u8p, u64p,                            # modes_all, modes_off
        i32p,                                 # rc_out
    ]


__all__ = ["get_lib", "available"]
