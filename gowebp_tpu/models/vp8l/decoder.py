"""VP8L (WebP lossless) decoder — spec-exact reference implementation.

Host side: bit reading, Huffman symbol decode, LZ77/color-cache resolution
(all inherently sequential byte/bit logic).  Plane side: inverse transforms
(NumPy here; JAX/TPU versions in gowebp_tpu/ops/lossless_ops.py).

Feature parity target: /root/reference/pkg/vp8/vp8l_dec.c.go (header
:107-124, transforms :1221-1269, meta-huffman :344-526, main loop
:1038-1189) — written fresh from the lossless bitstream spec.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ...constants import (
    CODE_LENGTH_CODE_ORDER,
    CODE_LENGTH_REPEATS,
    COLOR_INDEXING_TRANSFORM,
    COLOR_TRANSFORM,
    HASH_MUL,
    NUM_CODE_LENGTH_CODES,
    NUM_DISTANCE_CODES,
    NUM_LENGTH_CODES,
    NUM_LITERAL_CODES,
    PREDICTOR_TRANSFORM,
    SUBTRACT_GREEN_TRANSFORM,
    VP8L_SIGNATURE,
)
from ...entropy.bitio import BitReader
from ...entropy.huffman import HuffmanDecodeTable
from ...errors import BitstreamError
from . import transforms_np as tnp

# ---------------------------------------------------------------------------
# 2-D distance mapping (the 120 near codes)
# ---------------------------------------------------------------------------


def _build_dist_map() -> list[tuple[int, int]]:
    pairs = []
    for dy in range(8):
        lo = 1 if dy == 0 else -7
        for dx in range(lo, 9):
            pairs.append((dx, dy))
    pairs.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], abs(p[0]), p[0] < 0))
    assert len(pairs) == 120
    return pairs


DIST_MAP = _build_dist_map()


def plane_code_to_distance(xsize: int, code: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = DIST_MAP[code - 1]
    dist = dy * xsize + dx
    return dist if dist >= 1 else 1


# ---------------------------------------------------------------------------
# Huffman code reading
# ---------------------------------------------------------------------------


def _read_code_lengths(br: BitReader, alphabet_size: int) -> np.ndarray:
    """One prefix code: simple (1-2 symbols) or code-length-coded.

    Returns the per-symbol code-length array (table built by caller).
    """
    if br.read_bit():  # simple code
        num_symbols = br.read_bit() + 1
        if br.read_bit():  # first symbol is 8 bits
            sym0 = br.read_bits(8)
        else:
            sym0 = br.read_bits(1)
        lengths = np.zeros(alphabet_size, dtype=np.int32)
        if sym0 >= alphabet_size:
            raise BitstreamError("simple-code symbol out of range")
        lengths[sym0] = 1
        if num_symbols == 2:
            sym1 = br.read_bits(8)
            if sym1 >= alphabet_size:
                raise BitstreamError("simple-code symbol out of range")
            lengths[sym1] = 1
        return lengths

    # Code-length-coded.
    num_codes = br.read_bits(4) + 4
    if num_codes > NUM_CODE_LENGTH_CODES:
        raise BitstreamError("too many code length codes")
    cl_lengths = np.zeros(NUM_CODE_LENGTH_CODES, dtype=np.int32)
    for i in range(num_codes):
        cl_lengths[CODE_LENGTH_CODE_ORDER[i]] = br.read_bits(3)
    cl_table = HuffmanDecodeTable(cl_lengths)

    # Optional cap on the number of coded symbols.
    if br.read_bit():
        length_nbits = 2 + 2 * br.read_bits(3)
        max_symbol = 2 + br.read_bits(length_nbits)
        if max_symbol > alphabet_size:
            raise BitstreamError("max_symbol out of range")
    else:
        max_symbol = alphabet_size

    lengths = np.zeros(alphabet_size, dtype=np.int32)
    prev_len = 8
    sym = 0
    while sym < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code = cl_table.decode(br)
        if code < 16:
            lengths[sym] = code
            sym += 1
            if code != 0:
                prev_len = code
        else:
            offset, extra = CODE_LENGTH_REPEATS[code - 16]
            repeat = offset + br.read_bits(extra)
            if sym + repeat > alphabet_size:
                raise BitstreamError("code length repeat overflows alphabet")
            fill = prev_len if code == 16 else 0
            lengths[sym : sym + repeat] = fill
            sym += repeat
        if br.eos:
            raise BitstreamError("truncated huffman code lengths")
    return lengths


class PrefixGroup:
    """One meta-group's five prefix codes.

    Decode tables build lazily from ``lengths`` — the native pixel
    decoder consumes raw lengths only, so when both the group parse and
    the pixel loop run natively no Python table is ever constructed
    (the Python fallback and the incremental decoder still get tables
    on first access)."""

    __slots__ = ("_tables", "lengths")
    _NAMES = ("green", "red", "blue", "alpha", "dist")

    def __init__(self, green=None, red=None, blue=None, alpha=None,
                 dist=None, lengths=None):
        self._tables = [green, red, blue, alpha, dist]
        self.lengths = lengths

    def _tab(self, i):
        t = self._tables[i]
        if t is None:
            t = self._tables[i] = HuffmanDecodeTable(self.lengths[i])
        return t


for _i, _nm in enumerate(PrefixGroup._NAMES):
    setattr(PrefixGroup, _nm, property(
        lambda self, _i=_i: self._tab(_i)))


def _read_prefix_groups_native(br: BitReader, num_groups: int,
                               alphabets: list) -> list | None:
    """C++ fast path for the groups' code-length section; None if
    the native layer is unavailable."""
    import ctypes

    from ...entropy.native_loader import get_lib

    lib = get_lib()
    if lib is None or not hasattr(lib, "wtpu_vp8l_read_groups"):
        return None
    data = br.data if isinstance(br.data, bytes) else bytes(br.data)
    stride = sum(alphabets)
    out = np.zeros(num_groups * stride, np.int32)
    al = np.array(alphabets, np.int32)
    bp = ctypes.c_uint64(0)
    rc = lib.wtpu_vp8l_read_groups(
        ctypes.cast(ctypes.c_char_p(data),
                    ctypes.POINTER(ctypes.c_uint8)),
        len(data), br.bit_pos, num_groups,
        al.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(bp))
    if rc == 2:
        raise BitstreamError("truncated huffman code lengths")
    if rc != 0:
        raise BitstreamError("bad huffman code lengths")
    br.bit_pos = bp.value
    groups = []
    for g in range(num_groups):
        lens, off = [], g * stride
        for a in alphabets:
            lens.append(out[off:off + a])
            off += a
        groups.append(PrefixGroup(lengths=lens))
    return groups


def _read_prefix_groups(
    br: BitReader, num_groups: int, cache_bits: int
) -> list[PrefixGroup]:
    cache_size = (1 << cache_bits) if cache_bits > 0 else 0
    alphabets = [
        NUM_LITERAL_CODES + NUM_LENGTH_CODES + cache_size,
        NUM_LITERAL_CODES,
        NUM_LITERAL_CODES,
        NUM_LITERAL_CODES,
        NUM_DISTANCE_CODES,
    ]
    native = _read_prefix_groups_native(br, num_groups, alphabets)
    if native is not None:
        return native
    groups = []
    for _ in range(num_groups):
        tables = []
        lengths = []
        for a in alphabets:
            ln = _read_code_lengths(br, a)
            tables.append(HuffmanDecodeTable(ln))
            lengths.append(ln)
        groups.append(PrefixGroup(*tables, lengths=lengths))
    return groups


# ---------------------------------------------------------------------------
# Image stream decoding
# ---------------------------------------------------------------------------


def _read_prefix_coded_value(br: BitReader, code: int) -> int:
    """Length/distance prefix decode: code → value (1-based)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read_bits(extra) + 1


def _decode_pixels_native(
    br: BitReader,
    width: int,
    height: int,
    groups: list[PrefixGroup],
    huffman_image: np.ndarray | None,
    huffman_bits: int,
    cache_bits: int,
) -> np.ndarray | None:
    """C++ fast path for the pixel loop; returns None if unavailable."""
    import ctypes

    from ...entropy.native_loader import get_lib

    lib = get_lib()
    if lib is None:
        return None
    cache_size = (1 << cache_bits) if cache_bits > 0 else 0
    alphabets = np.array(
        [256 + 24 + cache_size, 256, 256, 256, 40], np.int32
    )
    all_lengths = []
    offsets = np.zeros(len(groups) * 5, np.int32)
    off = 0
    for g_i, g in enumerate(groups):
        for c_i, ln in enumerate(g.lengths):
            offsets[g_i * 5 + c_i] = off
            all_lengths.append(np.ascontiguousarray(ln, np.int32))
            off += len(ln)
    lengths_cat = np.concatenate(all_lengths)

    data = br.data if isinstance(br.data, bytes) else bytes(br.data)
    out = np.zeros(width * height, np.uint32)
    bit_out = ctypes.c_uint64(0)
    if huffman_image is not None:
        himg = np.ascontiguousarray(huffman_image.reshape(-1), np.int32)
        himg_p = himg.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        meta_w = huffman_image.shape[1]
    else:
        himg_p = None
        meta_w = 0
    rc = lib.wtpu_vp8l_decode_pixels(
        (ctypes.c_uint8 * len(data)).from_buffer_copy(data),
        len(data), br.bit_pos,
        width, height, len(groups),
        alphabets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        lengths_cat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        himg_p, huffman_bits, meta_w,
        cache_bits,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ctypes.byref(bit_out),
    )
    if rc != 0:
        raise BitstreamError(f"native vp8l decode failed (code {rc})")
    br.bit_pos = bit_out.value
    return out.reshape(height, width)


def _decode_pixels(
    br: BitReader,
    width: int,
    height: int,
    groups: list[PrefixGroup],
    huffman_image: np.ndarray | None,
    huffman_bits: int,
    cache_bits: int,
) -> np.ndarray:
    """The hot sequential loop: one ARGB uint32 per pixel."""
    native = _decode_pixels_native(
        br, width, height, groups, huffman_image, huffman_bits, cache_bits
    )
    if native is not None:
        return native
    npix = width * height
    pixels = [0] * npix
    cache = [0] * (1 << cache_bits) if cache_bits > 0 else None
    cache_shift = 32 - cache_bits if cache_bits > 0 else 0
    cache_limit = NUM_LITERAL_CODES + NUM_LENGTH_CODES

    if huffman_image is not None:
        meta_w = huffman_image.shape[1]
        meta_idx = huffman_image.tolist()
    group = groups[0]
    last_group_key = -1

    pos = 0
    x = 0
    while pos < npix:
        if huffman_image is not None:
            key = (pos // width >> huffman_bits) * meta_w + (x >> huffman_bits)
            if key != last_group_key:
                y = pos // width
                group = groups[meta_idx[y >> huffman_bits][x >> huffman_bits]]
                last_group_key = key
        sym = group.green.decode(br)
        if br.eos:
            raise BitstreamError("truncated pixel data")
        if sym < NUM_LITERAL_CODES:
            red = group.red.decode(br)
            blue = group.blue.decode(br)
            alpha = group.alpha.decode(br)
            argb = (alpha << 24) | (red << 16) | (sym << 8) | blue
            pixels[pos] = argb
            if cache is not None:
                cache[(HASH_MUL * argb & 0xFFFFFFFF) >> cache_shift] = argb
            pos += 1
            x += 1
            if x >= width:
                x = 0
        elif sym < cache_limit:
            length = _read_prefix_coded_value(br, sym - NUM_LITERAL_CODES)
            dist_code = group.dist.decode(br)
            dist = plane_code_to_distance(
                width, _read_prefix_coded_value(br, dist_code)
            )
            if dist > pos:
                raise BitstreamError("backward reference before image start")
            if cache is None:
                for _ in range(length):
                    if pos >= npix:
                        raise BitstreamError("backward reference overflows image")
                    pixels[pos] = pixels[pos - dist]
                    pos += 1
            else:
                for _ in range(length):
                    if pos >= npix:
                        raise BitstreamError("backward reference overflows image")
                    argb = pixels[pos - dist]
                    pixels[pos] = argb
                    cache[(HASH_MUL * argb & 0xFFFFFFFF) >> cache_shift] = argb
                    pos += 1
            x = pos % width
            last_group_key = -1
        else:
            if cache is None:
                raise BitstreamError("cache symbol without color cache")
            idx = sym - cache_limit
            argb = cache[idx]
            pixels[pos] = argb
            pos += 1
            x += 1
            if x >= width:
                x = 0

    return np.array(pixels, dtype=np.uint32).reshape(height, width)


@dataclass
class Transform:
    kind: int
    bits: int = 0
    data: np.ndarray | None = None   # sub-image (tiles) or palette
    orig_width: int = 0              # xsize before this transform shrank it


def _read_transform(
    br: BitReader, xsize: int, ysize: int, seen: set[int]
) -> tuple[Transform, int]:
    kind = br.read_bits(2)
    if kind in seen:
        raise BitstreamError("duplicate transform")
    seen.add(kind)
    t = Transform(kind=kind, orig_width=xsize)
    new_xsize = xsize
    if kind in (PREDICTOR_TRANSFORM, COLOR_TRANSFORM):
        t.bits = br.read_bits(3) + 2
        tw = tnp.subsample_size(xsize, t.bits)
        th = tnp.subsample_size(ysize, t.bits)
        t.data = _decode_image_stream(br, tw, th, top_level=False)
    elif kind == COLOR_INDEXING_TRANSFORM:
        num_colors = br.read_bits(8) + 1
        t.bits = 0 if num_colors > 16 else (1 if num_colors > 4 else (2 if num_colors > 2 else 3))
        raw = _decode_image_stream(br, num_colors, 1, top_level=False)
        # Palette entries are delta-coded component-wise.
        palette = np.zeros(num_colors, dtype=np.uint32)
        prev = 0
        for i in range(num_colors):
            cur = 0
            for shift in (24, 16, 8, 0):
                c = ((int(raw[0, i]) >> shift) + (prev >> shift)) & 0xFF
                cur |= c << shift
            palette[i] = cur
            prev = cur
        t.data = palette
        new_xsize = tnp.subsample_size(xsize, t.bits)
    elif kind == SUBTRACT_GREEN_TRANSFORM:
        pass
    else:
        raise BitstreamError("bad transform type")
    return t, new_xsize


class _StreamHeader:
    """Parsed transform + entropy-code headers of one image stream."""

    __slots__ = ("transforms", "cur_xsize", "cache_bits", "huffman_image",
                 "huffman_bits", "groups")


def _parse_stream_header(br: BitReader, xsize: int, ysize: int, *,
                         top_level: bool,
                         trace: dict | None = None) -> _StreamHeader:
    """Everything before the pixel loop (reference VP8LDecodeHeader).

    ``trace`` (optional dict) collects per-syntax-class bit counts —
    the BITTRACE facility (SURVEY.md §5.1).
    """
    hdr = _StreamHeader()
    transforms: list[Transform] = []
    seen: set[int] = set()
    cur_xsize = xsize
    p0 = br.bit_pos
    if top_level:
        while br.read_bit():
            t, cur_xsize = _read_transform(br, cur_xsize, ysize, seen)
            transforms.append(t)
            if len(transforms) > 4:
                raise BitstreamError("too many transforms")
    if trace is not None:
        trace["transforms"] = br.bit_pos - p0
        p0 = br.bit_pos

    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read_bits(4)
        if not (1 <= cache_bits <= 11):
            raise BitstreamError("bad color cache bits")

    huffman_image = None
    huffman_bits = 0
    num_groups = 1
    if top_level and br.read_bit():
        huffman_bits = br.read_bits(3) + 2
        hw = tnp.subsample_size(cur_xsize, huffman_bits)
        hh = tnp.subsample_size(ysize, huffman_bits)
        raw = _decode_image_stream(br, hw, hh, top_level=False)
        huffman_image = ((raw >> 8) & 0xFFFF).astype(np.int32)
        num_groups = int(huffman_image.max()) + 1
    if trace is not None:
        trace["meta_huffman"] = br.bit_pos - p0
        p0 = br.bit_pos

    hdr.transforms = transforms
    hdr.cur_xsize = cur_xsize
    hdr.cache_bits = cache_bits
    hdr.huffman_image = huffman_image
    hdr.huffman_bits = huffman_bits
    hdr.groups = _read_prefix_groups(br, num_groups, cache_bits)
    if trace is not None:
        trace["huffman_codes"] = br.bit_pos - p0
    return hdr


def _apply_inverse_transforms(argb: np.ndarray,
                              transforms: list) -> np.ndarray:
    for t in reversed(transforms):
        if t.kind == COLOR_INDEXING_TRANSFORM:
            argb = tnp.color_index_inverse(argb, t.data, t.orig_width)
        elif t.kind == SUBTRACT_GREEN_TRANSFORM:
            argb = tnp.add_green_inverse(argb)
        elif t.kind == PREDICTOR_TRANSFORM:
            argb = tnp.predictor_inverse(argb, t.data, t.bits)
        elif t.kind == COLOR_TRANSFORM:
            argb = tnp.color_transform_inverse(argb, t.data, t.bits)
    return argb


def _decode_image_stream(
    br: BitReader, xsize: int, ysize: int, *, top_level: bool
) -> np.ndarray:
    """Decode one image stream → (ysize, xsize) ARGB uint32 (pre-inverse).

    At top level, transforms are read and inverse-applied before returning.
    """
    hdr = _parse_stream_header(br, xsize, ysize, top_level=top_level)
    argb = _decode_pixels(
        br, hdr.cur_xsize, ysize, hdr.groups, hdr.huffman_image,
        hdr.huffman_bits, hdr.cache_bits
    )
    return _apply_inverse_transforms(argb, hdr.transforms)


class VP8LIncrementalPixels:
    """Resumable VP8L pixel loop for incremental decode.

    Mirrors the reference's suspend/resume mechanism
    (vp8l_dec.c.go SaveState/RestoreState every SYNC_EVERY_N_ROWS,
    SURVEY.md §2.3): a checkpoint (bit position, pixel position, color
    cache snapshot) is taken at row boundaries; when the reader runs off
    the end of the available bytes the state rolls back to the last
    checkpoint and decoding resumes after more data arrives.
    """

    SYNC_ROWS = 8

    def __init__(self, width: int, height: int, hdr: _StreamHeader,
                 bit_pos: int):
        self.width = hdr.cur_xsize
        self.height = height
        self.groups = hdr.groups
        self.huffman_image = hdr.huffman_image
        self.huffman_bits = hdr.huffman_bits
        self.cache_bits = hdr.cache_bits
        self.transforms = hdr.transforms
        self.npix = self.width * height
        self.pixels = [0] * self.npix
        self.cache = [0] * (1 << hdr.cache_bits) if hdr.cache_bits else None
        self.pos = 0
        self.x = 0
        self.done = False
        # (bit_pos, pos, x, cache snapshot)
        self._ck = (bit_pos, 0, 0, list(self.cache) if self.cache else None)

    def rows_ready(self) -> int:
        return self._ck[1] // self.width if not self.done else self.height

    def resume(self, data: bytes) -> bool:
        """Continue from the last checkpoint over (possibly longer) data.

        Returns True when the whole image has been decoded.
        """
        if self.done:
            return True
        br = BitReader(data)
        br.bit_pos, self.pos, self.x, ck_cache = self._ck
        if self.cache is not None:
            self.cache = list(ck_cache)
        width = self.width
        npix = self.npix
        pixels = self.pixels
        cache = self.cache
        cache_shift = 32 - self.cache_bits if self.cache_bits else 0
        cache_limit = NUM_LITERAL_CODES + NUM_LENGTH_CODES
        hufi = self.huffman_image
        hbits = self.huffman_bits
        meta_w = hufi.shape[1] if hufi is not None else 0
        meta_idx = hufi.tolist() if hufi is not None else None
        group = self.groups[0]
        last_group_key = -1
        next_sync = ((self.pos // width) // self.SYNC_ROWS + 1) * self.SYNC_ROWS

        pos = self.pos
        x = self.x
        while pos < npix:
            if hufi is not None:
                key = (pos // width >> hbits) * meta_w + (x >> hbits)
                if key != last_group_key:
                    y = pos // width
                    group = self.groups[meta_idx[y >> hbits][x >> hbits]]
                    last_group_key = key
            sym = group.green.decode(br)
            if br.eos:
                break
            if sym < NUM_LITERAL_CODES:
                red = group.red.decode(br)
                blue = group.blue.decode(br)
                alpha = group.alpha.decode(br)
                if br.eos:
                    break
                argb = (alpha << 24) | (red << 16) | (sym << 8) | blue
                pixels[pos] = argb
                if cache is not None:
                    cache[(HASH_MUL * argb & 0xFFFFFFFF) >> cache_shift] = argb
                pos += 1
                x += 1
                if x >= width:
                    x = 0
            elif sym < cache_limit:
                length = _read_prefix_coded_value(br, sym - NUM_LITERAL_CODES)
                dist_code = group.dist.decode(br)
                dist = plane_code_to_distance(
                    width, _read_prefix_coded_value(br, dist_code)
                )
                if br.eos:
                    break
                if dist > pos:
                    raise BitstreamError("backward reference before image start")
                if pos + length > npix:
                    raise BitstreamError("backward reference overflows image")
                if cache is None:
                    for _ in range(length):
                        pixels[pos] = pixels[pos - dist]
                        pos += 1
                else:
                    for _ in range(length):
                        argb = pixels[pos - dist]
                        pixels[pos] = argb
                        cache[(HASH_MUL * argb & 0xFFFFFFFF)
                              >> cache_shift] = argb
                        pos += 1
                x = pos % width
                last_group_key = -1
            else:
                idx = sym - cache_limit
                if cache is None or idx >= len(cache):
                    raise BitstreamError("color cache symbol without cache")
                pixels[pos] = cache[idx]
                pos += 1
                x += 1
                if x >= width:
                    x = 0
            if x == 0 and pos // width >= next_sync:
                self._ck = (br.bit_pos, pos, 0,
                            list(cache) if cache is not None else None)
                next_sync = (pos // width // self.SYNC_ROWS + 1) * self.SYNC_ROWS
        self.pos = pos
        self.x = x
        if pos >= npix:
            self.done = True
            self._ck = (br.bit_pos, pos, x, None)
            return True
        # Starved mid-symbol: progress past the checkpoint is discarded
        # (the next resume() rolls back to the checkpoint and redoes it).
        return False

    def partial_argb(self) -> np.ndarray:
        """(rows_ready, cur_xsize) ARGB decoded so far (pre-inverse)."""
        rows = self.rows_ready()
        return np.array(self.pixels[: rows * self.width],
                        np.uint32).reshape(rows, self.width)

    def full_argb(self) -> np.ndarray:
        return np.array(self.pixels, np.uint32).reshape(
            self.height, self.width)


# ---------------------------------------------------------------------------
# Public entry points
# ---------------------------------------------------------------------------


def decode_vp8l_header(payload: bytes) -> tuple[int, int, bool]:
    if len(payload) < 5 or payload[0] != VP8L_SIGNATURE:
        raise BitstreamError("bad VP8L header")
    br = BitReader(payload[1:])
    width = br.read_bits(14) + 1
    height = br.read_bits(14) + 1
    has_alpha = bool(br.read_bit())
    version = br.read_bits(3)
    if version != 0:
        raise BitstreamError("bad VP8L version")
    return width, height, has_alpha


def decode_vp8l(payload: bytes) -> np.ndarray:
    """Decode a VP8L chunk payload → (H, W, 4) uint8 RGBA."""
    width, height, _ = decode_vp8l_header(payload)
    br = BitReader(payload[1:])
    br.skip_bits(14 + 14 + 1 + 3)
    argb = _decode_image_stream(br, width, height, top_level=True)
    from ...entropy.native_loader import get_lib

    lib = get_lib()
    if lib is not None:
        import ctypes

        flat = np.ascontiguousarray(argb.reshape(-1), np.uint32)
        out = np.empty((height, width, 4), np.uint8)
        lib.wtpu_argb_to_rgba(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), flat.size,
        )
        return out
    ch = tnp.argb_to_channels(argb)          # A,R,G,B
    return ch[..., [1, 2, 3, 0]]             # → R,G,B,A


def decode_vp8l_alpha(payload: bytes, width: int, height: int) -> np.ndarray:
    """Decode the 8-bit VP8L stream used inside ALPH chunks (no header)."""
    br = BitReader(payload)
    argb = _decode_image_stream(br, width, height, top_level=True)
    return ((argb >> 8) & 0xFF).astype(np.uint8)   # alpha lives in green


__all__ = [
    "decode_vp8l",
    "decode_vp8l_header",
    "decode_vp8l_alpha",
    "plane_code_to_distance",
    "DIST_MAP",
]
