"""Token-rate cost model for RD decisions (trellis quantization).

Feature parity target: /root/reference/pkg/libwebp/enc/cost_enc.go
(VP8CalculateLevelCosts) and dsp/cost.go (VP8EntropyCost) — the same
idea: per-(type, band, context) bit costs, in 1/256-bit units, for the
boolean-coded token tree.
"""

from __future__ import annotations

import numpy as np

from .tables import CAT_PROBAS

MAX_VARIABLE_LEVEL = 67


def _entropy_cost_table() -> np.ndarray:
    """cost256[p] = -log2(p/256) * 256 for p in 0..255 (p=0 sentinel)."""
    p = np.arange(256, dtype=np.float64)
    p[0] = 1.0
    return np.round(-np.log2(p / 256.0) * 256.0).astype(np.int32)


_COST = _entropy_cost_table()


def _bit_cost(bit: int, prob: int) -> int:
    return int(_COST[prob] if bit == 0 else _COST[255 - prob])


def _value_cost(v: int, p) -> int:
    """Cost of the value tokens (after the p1=1 'nonzero' bit), excl. sign."""
    if v == 1:
        return _bit_cost(0, p[2])
    c = _bit_cost(1, p[2])
    if v <= 4:
        c += _bit_cost(0, p[3])
        if v == 2:
            c += _bit_cost(0, p[4])
        else:
            c += _bit_cost(1, p[4]) + _bit_cost(v - 3, p[5])
        return c
    c += _bit_cost(1, p[3])
    if v <= 10:
        c += _bit_cost(0, p[6])
        if v <= 6:
            c += _bit_cost(0, p[7]) + _bit_cost(v - 5, 159)
        else:
            c += (_bit_cost(1, p[7]) + _bit_cost((v - 7) >> 1, 165)
                  + _bit_cost((v - 7) & 1, 145))
        return c
    c += _bit_cost(1, p[6])
    for cat in range(4):
        base = 3 + (8 << cat)
        span = 1 << len(CAT_PROBAS[cat])
        if v < base + span or cat == 3:
            bit1, bit0 = cat >> 1, cat & 1
            c += _bit_cost(bit1, p[8]) + _bit_cost(bit0, p[9 + bit1])
            residue = min(v, 2114) - base
            nbits = len(CAT_PROBAS[cat])
            for k in range(nbits - 1, -1, -1):
                c += _bit_cost((residue >> k) & 1, CAT_PROBAS[cat][nbits - 1 - k])
            return c
    raise AssertionError


def trellis_cost_tables(probs: np.ndarray):
    """probs (4,8,3,11) → (p0_cost, p1_cost, val_cost) uint16 arrays.

    p0_cost/p1_cost: [4][8][3][2] cost of coding bit 0/1.
    val_cost: [4][8][3][MAX_VARIABLE_LEVEL+1] cost of value v (1..67),
    including the p2 branch but excluding p1 and the sign bit.
    """
    p0 = np.zeros((4, 8, 3, 2), np.uint16)
    p1 = np.zeros((4, 8, 3, 2), np.uint16)
    val = np.zeros((4, 8, 3, MAX_VARIABLE_LEVEL + 1), np.uint16)
    for t in range(4):
        for b in range(8):
            for c in range(3):
                p = probs[t, b, c]
                p0[t, b, c, 0] = min(65535, _bit_cost(0, int(p[0])))
                p0[t, b, c, 1] = min(65535, _bit_cost(1, int(p[0])))
                p1[t, b, c, 0] = min(65535, _bit_cost(0, int(p[1])))
                p1[t, b, c, 1] = min(65535, _bit_cost(1, int(p[1])))
                for v in range(1, MAX_VARIABLE_LEVEL + 1):
                    val[t, b, c, v] = min(65535, _value_cost(v, p))
    return p0, p1, val


__all__ = ["trellis_cost_tables", "MAX_VARIABLE_LEVEL"]
