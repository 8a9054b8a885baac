// Interleaved multi-stream VP8 symbol decode (the batch-decode engine).
//
// The per-image boolean decoder is a strict serial dependency chain
// (~11 cycles/decision), and a branchy token parser adds a mispredict
// per decision — measured ~9 ns per decision on the single-stream
// engine (vp8_dec.cpp get_coeffs).  This engine removes both limits:
//
//   1. The token grammar (RFC 6386 §13.2-13.3) is run as a *branchless
//      DFA*: one table-driven transition per decoded bit — mask
//      arithmetic instead of conditional branches, an always-store
//      slot instead of a conditional coefficient store.
//   2. Many independent bitstreams are stepped round-robin in ONE
//      thread: each image's token partition(s) is its own stream, so
//      the out-of-order core overlaps 4-16 dependency chains
//      (instruction-level parallelism across images — measured
//      2.1-2.3 ns/decision at 4 interleaved streams vs 5.5 single).
//   3. Multi-partition files (our own encoder emits up to 8 token
//      partitions, the format's parallel-decode hook — reference
//      pkg/vp8/vp8_dec.go:293 ParsePartitions) interleave *within* an
//      image: partition p owns rows y ≡ p (mod P); the one coupling —
//      the nz-context row above — is enforced with a per-row progress
//      gate (no atomics: one engine call is single-threaded; thread
//      parallelism comes from running engines on disjoint image sets).
//
// Mode parsing (partition 0) is a separate serial chain per image and
// runs as a sequential pre-pass (~10-15% of decisions).
//
// Outputs are bit-identical to wtpu_vp8_decode_symbols (vp8_dec.cpp),
// which itself is validated against the pure-Python RFC decoder and
// libwebp golden files.

#include <cstdint>
#include <cstring>
#include <vector>

#include "vp8_tables.h"

namespace {

// ----------------------------------------------------------------------
// RFC-convention boolean decoder for the sequential mode pre-pass.
// ----------------------------------------------------------------------
struct BoolDec {
  const uint8_t* data;
  uint64_t size;
  uint64_t pos;
  uint32_t value;
  uint32_t range;
  int bit_count;

  void init(const uint8_t* d, uint64_t n, uint64_t p, uint32_t v,
            uint32_t r, int bc) {
    data = d; size = n; pos = p; value = v; range = r; bit_count = bc;
  }
  inline uint32_t next_byte() {
    uint32_t b = pos < size ? data[pos] : 0;
    pos++;
    return b;
  }
  inline int get(int prob) {
    uint32_t split = 1 + (((range - 1) * (uint32_t)prob) >> 8);
    uint32_t big = split << 8;
    int ret;
    if (value >= big) {
      ret = 1; range -= split; value -= big;
    } else {
      ret = 0; range = split;
    }
    while (range < 128) {
      value <<= 1; range <<= 1;
      if (++bit_count == 8) { bit_count = 0; value |= next_byte(); }
    }
    return ret;
  }
  inline bool exhausted() const { return pos > size + 4; }
};

// ----------------------------------------------------------------------
// Token-grammar DFA.
// States follow get_coeffs (vp8_dec.cpp) / RFC 6386 token tree.
// ----------------------------------------------------------------------
enum : uint32_t {
  S0 = 0,   // EOB check            p[0]
  S1,       // zero check           p[1]
  S2,       // one check            p[2]
  L3,       // large: low/high      p[3]
  L4,       //   low: 2 / 3+bit     p[4]
  L5,       //     v = 3 + bit      p[5]
  L6,       //   high: cat12 / catN p[6]
  L7,       //     cat1/cat2        p[7]
  C159,     //     v = 5 + bit      const 159
  C165,     //     v = 7 + 2*bit    const 165
  C145,     //     v += bit         const 145
  L8,       //   catN bit1          p[8]
  L9A,      //   catN bit0 (b1=0)   p[9]
  L9B,      //   catN bit0 (b1=1)   p[10]
  CAT_BASE, // 23 cat-extra-bit states (3+4+5+11)
  SIGN = CAT_BASE + 23,
  NSTATES,
};

struct Tables {
  uint32_t ent[NSTATES * 2];   // ns(6) adv(1) eob(1) va(8..15) vm(16..17) vb(18..19)
  uint8_t poff[NSTATES];       // index into the 11-prob row (grammar states)
  uint8_t cprob[NSTATES];      // nonzero => constant probability
  uint16_t bandoff[17 * 3];    // (kBands[n]*3 + ctx) * 11
};

static Tables build_tables() {
  Tables t{};
  auto ent = [](uint32_t ns, uint32_t adv, uint32_t eob, uint32_t va,
                uint32_t vm, uint32_t vb) -> uint32_t {
    return ns | (adv << 6) | (eob << 7) | (va << 8) | (vm << 16) | (vb << 18);
  };
  // state, bit -> packed transition
  t.ent[S0 * 2 + 0] = ent(S0, 0, 1, 0, 0, 0);     // EOB
  t.ent[S0 * 2 + 1] = ent(S1, 0, 0, 0, 0, 0);
  t.ent[S1 * 2 + 0] = ent(S1, 1, 0, 0, 0, 0);     // zero: n++
  t.ent[S1 * 2 + 1] = ent(S2, 0, 0, 0, 0, 0);
  t.ent[S2 * 2 + 0] = ent(SIGN, 0, 0, 1, 0, 0);   // v = 1
  t.ent[S2 * 2 + 1] = ent(L3, 0, 0, 0, 0, 0);
  t.ent[L3 * 2 + 0] = ent(L4, 0, 0, 0, 0, 0);
  t.ent[L3 * 2 + 1] = ent(L6, 0, 0, 0, 0, 0);
  t.ent[L4 * 2 + 0] = ent(SIGN, 0, 0, 2, 0, 0);   // v = 2
  t.ent[L4 * 2 + 1] = ent(L5, 0, 0, 0, 0, 0);
  t.ent[L5 * 2 + 0] = ent(SIGN, 0, 0, 3, 0, 1);   // v = 3 + bit
  t.ent[L5 * 2 + 1] = ent(SIGN, 0, 0, 3, 0, 1);
  t.ent[L6 * 2 + 0] = ent(L7, 0, 0, 0, 0, 0);
  t.ent[L6 * 2 + 1] = ent(L8, 0, 0, 0, 0, 0);
  t.ent[L7 * 2 + 0] = ent(C159, 0, 0, 0, 0, 0);
  t.ent[L7 * 2 + 1] = ent(C165, 0, 0, 0, 0, 0);
  t.ent[C159 * 2 + 0] = ent(SIGN, 0, 0, 5, 0, 1);   // v = 5 + bit
  t.ent[C159 * 2 + 1] = ent(SIGN, 0, 0, 5, 0, 1);
  t.ent[C165 * 2 + 0] = ent(C145, 0, 0, 7, 0, 2);   // v = 7 + 2*bit
  t.ent[C165 * 2 + 1] = ent(C145, 0, 0, 7, 0, 2);
  t.ent[C145 * 2 + 0] = ent(SIGN, 0, 0, 0, 1, 1);   // v += bit
  t.ent[C145 * 2 + 1] = ent(SIGN, 0, 0, 0, 1, 1);
  t.ent[L8 * 2 + 0] = ent(L9A, 0, 0, 0, 0, 0);
  t.ent[L8 * 2 + 1] = ent(L9B, 0, 0, 0, 0, 0);
  // cat states: cat c consumes kCatBits[c] extra bits (v = 2v + bit),
  // the last one also adds the category base 3 + (8 << c).
  uint32_t cat_start[4];
  {
    uint32_t s = CAT_BASE;
    for (int c = 0; c < 4; c++) { cat_start[c] = s; s += kCatBits[c]; }
  }
  t.ent[L9A * 2 + 0] = ent(cat_start[0], 0, 0, 0, 0, 0);  // v = 0
  t.ent[L9A * 2 + 1] = ent(cat_start[1], 0, 0, 0, 0, 0);
  t.ent[L9B * 2 + 0] = ent(cat_start[2], 0, 0, 0, 0, 0);
  t.ent[L9B * 2 + 1] = ent(cat_start[3], 0, 0, 0, 0, 0);
  for (int c = 0; c < 4; c++) {
    for (int i = 0; i < kCatBits[c]; i++) {
      uint32_t s = cat_start[c] + i;
      bool last = i == kCatBits[c] - 1;
      uint32_t va = last ? (uint32_t)(3 + (8 << c)) : 0;
      uint32_t ns = last ? SIGN : s + 1;
      t.ent[s * 2 + 0] = ent(ns, 0, 0, va, 2, 1);   // v = 2v + bit (+base)
      t.ent[s * 2 + 1] = ent(ns, 0, 0, va, 2, 1);
      t.cprob[s] = kCatProbas[c][i];
    }
  }
  t.ent[SIGN * 2 + 0] = ent(S0, 1, 0, 0, 0, 0);   // store, n++
  t.ent[SIGN * 2 + 1] = ent(S0, 1, 0, 0, 0, 0);

  t.poff[S0] = 0; t.poff[S1] = 1; t.poff[S2] = 2; t.poff[L3] = 3;
  t.poff[L4] = 4; t.poff[L5] = 5; t.poff[L6] = 6; t.poff[L7] = 7;
  t.poff[L8] = 8; t.poff[L9A] = 9; t.poff[L9B] = 10;
  t.cprob[C159] = 159; t.cprob[C165] = 165; t.cprob[C145] = 145;
  t.cprob[SIGN] = 128;
  for (int n = 0; n <= 16; n++)
    for (int c = 0; c < 3; c++)
      t.bandoff[n * 3 + c] = (uint16_t)((kBands[n] * 3 + c) * 11);
  return t;
}

static const Tables T = build_tables();

// ----------------------------------------------------------------------
// Per-image shared data and per-stream state.
// ----------------------------------------------------------------------
struct ImageCtx {
  int mb_w, mb_h, num_parts;
  const uint8_t* coeff_probs;   // [4][8][3][11]
  const int32_t* quants;        // [4][6]
  const uint8_t* modes;         // [n][21] from the mode pre-pass
  int use_skip;
  int16_t* coeffs_out;          // [n][24][16]
  uint8_t* modes_out;           // [n][21] (skip/dither updated here)
  std::vector<uint32_t> above_nz;   // per MB column
  std::vector<uint8_t> above_dc;
  std::vector<int32_t> prog;        // MBs completed per row (gate)
  std::vector<uint8_t> scratch;     // padded partition bytes
  std::vector<uint64_t> scratch_off;
  int error = 0;
  int pending_streams = 0;
};

enum Phase : uint8_t { PH_MB_START, PH_Y2, PH_LUMA, PH_U, PH_V };

struct alignas(64) Stream {
  // --- hot fields: first cache line (boolean decoder + DFA registers) ---
  uint64_t value;
  const uint8_t* buf;
  const uint8_t* pb;
  int16_t* out;
  const uint8_t* tb_luma;       // active block's prob-table base
  uint32_t range;
  int32_t bits;
  uint32_t state, n, v, nctx;
  int32_t dq0, dq1;
  // --- block/MB bookkeeping (slow path only) ---
  ImageCtx* img;
  const uint8_t* buf_start;
  uint64_t buf_size;            // real (unpadded) size
  int part;                     // partition index = starting row
  int mb_x, mb_y;
  Phase phase;
  uint32_t bi;                  // block index within MB
  uint32_t first;               // 0 or 1 for luma blocks
  uint32_t tnz, lnz, lbit;      // running context bits
  uint32_t out_t, out_l;
  uint32_t any_nz, uv_ac;
  uint32_t ctx_left_nz;
  uint8_t ctx_left_dc;
  int16_t y2tmp[16];
  int blocked;                  // waiting on the row-above gate
  int done;
};

// Branchless interleavable step: one boolean decision + one DFA
// transition.  Returns nonzero when the current block finished.
static inline uint32_t step(Stream& st) {
  if (st.bits < 0) {
    uint64_t in;
    std::memcpy(&in, st.buf, 8);
    st.buf += 7;
    st.value = (__builtin_bswap64(in) >> 8) | (st.value << 56);
    st.bits += 56;
  }
  // Everything below is mask/select arithmetic on purpose: any
  // data-dependent ternary that gcc turns into a conditional branch
  // mispredicts ~50% of the time and collapses the interleaving win
  // (measured 8x slower with branchy selects).
  const uint32_t sidx = st.state;
  const uint32_t cp = T.cprob[sidx];
  const uint32_t gp = st.pb[T.poff[sidx]];
  const uint32_t cmask = 0 - (uint32_t)(cp != 0);
  const uint32_t prob = (cp & cmask) | (gp & ~cmask);
  // boolean decode
  const int pos = st.bits;
  const uint32_t split = (st.range * prob) >> 8;
  const uint32_t vv = (uint32_t)(st.value >> pos) & 0xff;
  const uint32_t bit = vv > split;
  const uint64_t mask = 0 - (uint64_t)bit;
  const uint32_t r_sel = (split + 1) + ((uint32_t)mask & (st.range - 2 * split - 1));
  st.value -= (((uint64_t)split + 1) & mask) << pos;
  const int shift = 7 ^ (31 - __builtin_clz(r_sel));
  st.bits = pos - shift;
  st.range = (r_sel << shift) - 1;
  // DFA transition
  const uint32_t e = T.ent[sidx * 2 + bit];
  const uint32_t adv = (e >> 6) & 1;
  const uint32_t eob = (e >> 7) & 1;
  const uint32_t va = (e >> 8) & 255;
  const uint32_t vm = (e >> 16) & 3;
  const uint32_t vb = (e >> 18) & 3;
  const uint32_t vold = st.v;     // SIGN stores the PRE-transition value
  st.v = vold * vm + bit * vb + va;
  const uint32_t is_s2 = 0 - (uint32_t)(sidx == S2);
  st.nctx = ((1 + bit) & is_s2) | (st.nctx & ~is_s2);
  const uint32_t n = st.n;
  // Unconditional masked store: out[zz[n]] is written at most once per
  // block (at its SIGN step) and the array starts zeroed, so writing
  // (value & mask) — which is 0 on non-SIGN steps — to the position
  // that has not been written yet is a semantic no-op.  This keeps the
  // store address simple (no select), which the memory-disambiguation
  // hardware likes much better than an address that flips between the
  // output array and a dummy slot.
  const int32_t sv = (int32_t)((vold ^ (uint32_t)(0 - bit)) + bit);
  const uint32_t nz_n = 0 - (uint32_t)(n != 0);
  const int32_t dq = (st.dq1 & nz_n) | (st.dq0 & ~nz_n);
  const uint32_t isstore = sidx == SIGN;
  const uint32_t smask = 0 - isstore;
  st.out[kZigzag[n]] = (int16_t)((sv * dq) & (int32_t)smask);
  const uint32_t nn = n + adv;
  st.n = nn;
  const uint32_t csel = st.nctx & smask;
  const uint8_t* pbn = st.tb_luma + T.bandoff[nn * 3 + csel];
  // tb_luma holds the active block's prob-table base (set per block).
  const uintptr_t amask = 0 - (uintptr_t)adv;
  st.pb = (const uint8_t*)((((uintptr_t)pbn) & amask) |
                           (((uintptr_t)st.pb) & ~amask));
  st.state = e & 63;
  return eob | (adv & (nn >> 4));
}

static void iwht4x4(const int16_t* in, int32_t* out) {
  int32_t tmp[16];
  for (int i = 0; i < 4; i++) {
    int32_t a0 = in[0 + i] + in[12 + i];
    int32_t a1 = in[4 + i] + in[8 + i];
    int32_t a2 = in[4 + i] - in[8 + i];
    int32_t a3 = in[0 + i] - in[12 + i];
    tmp[0 + i] = a0 + a1;
    tmp[4 + i] = a3 + a2;
    tmp[8 + i] = a0 - a1;
    tmp[12 + i] = a3 - a2;
  }
  for (int i = 0; i < 4; i++) {
    int32_t dc = tmp[0 + i * 4] + 3;
    int32_t a0 = dc + tmp[3 + i * 4];
    int32_t a1 = tmp[1 + i * 4] + tmp[2 + i * 4];
    int32_t a2 = tmp[1 + i * 4] - tmp[2 + i * 4];
    int32_t a3 = dc - tmp[3 + i * 4];
    out[i * 4 + 0] = (a0 + a1) >> 3;
    out[i * 4 + 1] = (a3 + a2) >> 3;
    out[i * 4 + 2] = (a0 - a1) >> 3;
    out[i * 4 + 3] = (a3 - a2) >> 3;
  }
}

// Launch the DFA on one block.
static inline void arm_block(Stream& st, const uint8_t* tbase, int16_t* out,
                             uint32_t first, uint32_t ctx0,
                             int32_t dq_dc, int32_t dq_ac) {
  st.state = S0;
  st.n = first;
  st.v = 0;
  st.nctx = 0;
  st.tb_luma = tbase;
  st.pb = tbase + T.bandoff[first * 3 + ctx0];
  st.out = out;
  st.dq0 = dq_dc;
  st.dq1 = dq_ac;
  st.first = first;
}

// Forward decl.
static bool start_mb(Stream& st);

// Called when a block's DFA reached DONE; advances the MB state
// machine and arms the next block.  Returns false when the stream has
// no more work (finished or blocked).
static bool block_done(Stream& st) {
  ImageCtx& im = *st.img;
  // Exhaustion check every block: one block consumes < 512 bytes even
  // in the worst case, so with the 4 KB inter-partition guard the hot
  // loop's blind 8-byte reads stay inside the scratch buffer and a
  // truncated/corrupt stream is flagged before leaving it.
  if ((uint64_t)(st.buf - st.buf_start) > st.buf_size + 8) {
    im.error = 1;
    st.done = 1;
    return false;
  }
  const uint32_t nz = st.n;
  const int mbi = st.mb_y * im.mb_w + st.mb_x;
  int16_t* mb_coeffs = im.coeffs_out + (size_t)mbi * 24 * 16;
  uint8_t* mb_modes = im.modes_out + (size_t)mbi * 21;
  const uint8_t* probs = im.coeff_probs;
  const int32_t* q = im.quants + mb_modes[2] * 6;

  switch (st.phase) {
    case PH_Y2: {
      im.above_dc[st.mb_x] = st.ctx_left_dc = (nz > 0);
      st.any_nz |= (nz > 0);
      int32_t dcs[16];
      if (nz > 1) {
        iwht4x4(st.y2tmp, dcs);
      } else {
        int32_t dc0 = (st.y2tmp[0] + 3) >> 3;
        for (int i = 0; i < 16; i++) dcs[i] = dc0;
      }
      for (int i = 0; i < 16; i++) mb_coeffs[i * 16] = (int16_t)dcs[i];
      // fall through to luma: bi = 0
      st.phase = PH_LUMA;
      st.bi = 0;
      st.tnz = im.above_nz[st.mb_x] & 0x0f;
      st.lnz = st.ctx_left_nz & 0x0f;
      st.lbit = st.lnz & 1;
      uint32_t ctx = st.lbit + (st.tnz & 1);
      arm_block(st, probs + 0 * 8 * 3 * 11, mb_coeffs, 1, ctx, q[0], q[1]);
      return true;
    }
    case PH_LUMA: {
      uint32_t l = nz > st.first;
      st.tnz = (st.tnz >> 1) | (l << 7);
      int16_t* bc = mb_coeffs + st.bi * 16;
      bool has = nz > st.first || bc[0] != 0;
      st.any_nz |= (uint32_t)has;
      if ((st.bi & 3) == 3) {
        st.tnz >>= 4;
        st.lnz = (st.lnz >> 1) | (l << 7);
        st.lbit = st.lnz & 1;
      } else {
        st.lbit = l;
      }
      st.bi++;
      if (st.bi < 16) {
        uint32_t ctx = st.lbit + (st.tnz & 1);
        arm_block(st, st.tb_luma, mb_coeffs + st.bi * 16, st.first, ctx,
                  q[0], q[1]);
        // tb_luma unchanged (same table base for all 16 luma blocks)
        return true;
      }
      st.out_t = st.tnz;
      st.out_l = st.lnz >> 4;
      // chroma U
      st.phase = PH_U;
      st.bi = 16;
      st.tnz = (im.above_nz[st.mb_x] >> 4) & 0xff;
      st.lnz = (st.ctx_left_nz >> 4) & 0xff;
      st.lbit = st.lnz & 1;
      uint32_t ctx = st.lbit + (st.tnz & 1);
      arm_block(st, probs + 2 * 8 * 3 * 11, mb_coeffs + 16 * 16, 0, ctx,
                q[4], q[5]);
      return true;
    }
    case PH_U:
    case PH_V: {
      uint32_t l = nz > 0;
      st.any_nz |= l;
      st.uv_ac |= (uint32_t)(nz > 1);
      st.tnz = (st.tnz >> 1) | (l << 3);
      uint32_t local = st.bi - (st.phase == PH_U ? 16 : 20);
      if ((local & 1) == 1) {   // xx == 1: row done
        st.tnz >>= 2;
        st.lnz = (st.lnz >> 1) | (l << 5);
        st.lbit = st.lnz & 1;
      } else {
        st.lbit = l;
      }
      st.bi++;
      uint32_t ch = st.phase == PH_U ? 0 : 2;
      if (st.bi < (st.phase == PH_U ? 20u : 24u)) {
        uint32_t ctx = st.lbit + (st.tnz & 1);
        arm_block(st, probs + 2 * 8 * 3 * 11, mb_coeffs + st.bi * 16, 0,
                  ctx, q[4], q[5]);
        return true;
      }
      st.out_t |= ((st.tnz << 4) << ch);
      st.out_l |= ((st.lnz & 0xf0) << ch);
      if (st.phase == PH_U) {
        st.phase = PH_V;
        st.bi = 20;
        st.tnz = (im.above_nz[st.mb_x] >> 6) & 0xff;
        st.lnz = (st.ctx_left_nz >> 6) & 0xff;
        st.lbit = st.lnz & 1;
        uint32_t ctx = st.lbit + (st.tnz & 1);
        arm_block(st, probs + 2 * 8 * 3 * 11, mb_coeffs + 20 * 16, 0, ctx,
                  q[4], q[5]);
        return true;
      }
      // ---- MB complete ----
      im.above_nz[st.mb_x] = st.out_t;
      st.ctx_left_nz = st.out_l;
      mb_modes[3] = !st.any_nz;          // "empty" skip flag
      mb_modes[4] = st.uv_ac ? 0 : 1;    // dither-eligible
      im.prog[st.mb_y] = st.mb_x + 1;
      st.mb_x++;
      return start_mb(st);
    }
    default:
      break;
  }
  return false;
}

// Position the stream at its next coded MB (handling skip MBs, row
// advance, and the row-above progress gate); arms the first block.
// Returns false if the stream is finished or blocked.
static bool start_mb(Stream& st) {
  ImageCtx& im = *st.img;
  for (;;) {
    if (st.mb_x >= im.mb_w) {
      // next row owned by this partition
      st.mb_y += im.num_parts;
      if (st.mb_y >= im.mb_h) { st.done = 1; return false; }
      st.mb_x = 0;
      st.ctx_left_nz = 0;
      st.ctx_left_dc = 0;
    }
    // gate: the row above must have finished column mb_x
    if (st.mb_y > 0 && im.prog[st.mb_y - 1] <= st.mb_x) {
      st.blocked = 1;
      return false;
    }
    st.blocked = 0;
    const int mbi = st.mb_y * im.mb_w + st.mb_x;
    const uint8_t* m = im.modes + (size_t)mbi * 21;
    uint8_t* mo = im.modes_out + (size_t)mbi * 21;
    const int is_i4 = m[0];
    const int skip = im.use_skip ? m[3] : 0;
    if (skip) {
      im.above_nz[st.mb_x] = 0;
      st.ctx_left_nz = 0;
      if (!is_i4) { im.above_dc[st.mb_x] = 0; st.ctx_left_dc = 0; }
      mo[3] = 1;
      mo[4] = 0;   // explicitly skipped MBs are never dithered
      im.prog[st.mb_y] = st.mb_x + 1;
      st.mb_x++;
      continue;
    }
    st.any_nz = 0;
    st.uv_ac = 0;
    int16_t* mb_coeffs = im.coeffs_out + (size_t)mbi * 24 * 16;
    const int32_t* q = im.quants + m[2] * 6;
    const uint8_t* probs = im.coeff_probs;
    if (!is_i4) {
      st.phase = PH_Y2;
      std::memset(st.y2tmp, 0, sizeof(st.y2tmp));
      uint32_t ctx = im.above_dc[st.mb_x] + st.ctx_left_dc;
      arm_block(st, probs + 1 * 8 * 3 * 11, st.y2tmp, 0, ctx, q[2], q[3]);
    } else {
      st.phase = PH_LUMA;
      st.bi = 0;
      st.tnz = im.above_nz[st.mb_x] & 0x0f;
      st.lnz = st.ctx_left_nz & 0x0f;
      st.lbit = st.lnz & 1;
      uint32_t ctx = st.lbit + (st.tnz & 1);
      arm_block(st, probs + 3 * 8 * 3 * 11, mb_coeffs, 0, ctx, q[0], q[1]);
    }
    return true;
  }
}

// ----------------------------------------------------------------------
// Sequential mode pre-pass (partition 0): segment, skip, modes.
// Mirrors parse_frame_mbs' mode section (vp8_dec.cpp).
// ----------------------------------------------------------------------
static int parse_modes(BoolDec& bd, int mb_w, int mb_h, int update_map,
                       const uint8_t* segment_probs, int use_skip,
                       int skip_p, uint8_t* modes_out) {
  std::vector<uint8_t> intra_t((size_t)4 * mb_w, 0);
  for (int mb_y = 0; mb_y < mb_h; mb_y++) {
    uint8_t intra_l[4] = {0, 0, 0, 0};
    for (int mb_x = 0; mb_x < mb_w; mb_x++) {
      uint8_t* m = modes_out + ((size_t)mb_y * mb_w + mb_x) * 21;
      uint8_t segment = 0;
      if (update_map) {
        if (!bd.get(segment_probs[0]))
          segment = (uint8_t)bd.get(segment_probs[1]);
        else
          segment = (uint8_t)(2 + bd.get(segment_probs[2]));
      }
      uint8_t skip = use_skip ? (uint8_t)bd.get(skip_p) : 0;
      uint8_t is_i4 = (uint8_t)(!bd.get(145));
      uint8_t* top4 = intra_t.data() + 4 * mb_x;
      if (!is_i4) {
        int ymode;
        if (bd.get(156)) ymode = bd.get(128) ? 1 : 3;   // TM : HE
        else ymode = bd.get(163) ? 2 : 0;               // VE : DC
        for (int i = 0; i < 16; i++) m[5 + i] = (uint8_t)ymode;
        std::memset(top4, ymode, 4);
        std::memset(intra_l, ymode, 4);
      } else {
        for (int yy = 0; yy < 4; yy++) {
          int ymode = intra_l[yy];
          for (int xx = 0; xx < 4; xx++) {
            const uint8_t* prob = kBModeProbas + (top4[xx] * 10 + ymode) * 9;
            int i = kBModeTree[bd.get(prob[0])];
            while (i > 0) i = kBModeTree[2 * i + bd.get(prob[i])];
            ymode = -i;
            top4[xx] = (uint8_t)ymode;
            m[5 + 4 * yy + xx] = (uint8_t)ymode;
          }
          intra_l[yy] = (uint8_t)ymode;
        }
      }
      uint8_t uvmode;
      if (!bd.get(142)) uvmode = 0;
      else if (!bd.get(114)) uvmode = 2;
      else uvmode = bd.get(183) ? 1 : 3;
      m[0] = is_i4;
      m[1] = uvmode;
      m[2] = segment;
      m[3] = skip;
      m[4] = 0;
    }
    if (bd.exhausted()) return 2;
  }
  return 0;
}

}  // namespace

extern "C" {

// Interleaved batch symbol decode.  Per-image arrays are passed as
// flat buffers with element-offset tables (ctypes-friendly).  Outputs
// and semantics match wtpu_vp8_decode_symbols exactly; rc_out[i] is
// the per-image status (0 ok, 1 token exhausted, 2 partition-0
// exhausted).  Returns the number of failed images.
int wtpu_vp8_decode_symbols_batch(
    int n_img,
    const uint8_t* p0_all, const uint64_t* p0_off,         // [n+1] bytes
    const uint64_t* p0_pos, const uint32_t* p0_value,
    const uint32_t* p0_range, const uint32_t* p0_bitcount,
    const uint8_t* parts_all, const uint64_t* parts_off,   // [n+1] bytes
    const uint64_t* part_bounds, const int32_t* part_bounds_off,  // per-image boundary lists
    const int32_t* num_parts,                               // [n]
    const int32_t* mb_dims,                                 // [n][2]
    const int32_t* hdr_flags,                               // [n][3]: update_map, use_skip, skip_p
    const uint8_t* seg_probs_all,                           // [n][3]
    const uint8_t* coeff_probs_all,                         // [n][1056]
    const int32_t* quants_all,                              // [n][24]
    int16_t* coeffs_all, const uint64_t* coeffs_off,        // [n+1] int16 elems
    uint8_t* modes_all, const uint64_t* modes_off,          // [n+1] bytes
    int32_t* rc_out) {
  std::vector<ImageCtx> imgs(n_img);
  std::vector<Stream> streams;
  streams.reserve((size_t)n_img * 8);
  int n_failed = 0;

  for (int i = 0; i < n_img; i++) {
    ImageCtx& im = imgs[i];
    im.mb_w = mb_dims[2 * i];
    im.mb_h = mb_dims[2 * i + 1];
    im.num_parts = num_parts[i];
    im.coeff_probs = coeff_probs_all + (size_t)i * 4 * 8 * 3 * 11;
    im.quants = quants_all + (size_t)i * 24;
    im.use_skip = hdr_flags[3 * i + 1];
    im.coeffs_out = coeffs_all + coeffs_off[i];
    im.modes_out = modes_all + modes_off[i];
    im.modes = im.modes_out;
    std::memset(im.coeffs_out, 0,
                (coeffs_off[i + 1] - coeffs_off[i]) * sizeof(int16_t));
    std::memset(im.modes_out, 0, modes_off[i + 1] - modes_off[i]);
    rc_out[i] = 0;

    // mode pre-pass (sequential chain on partition 0)
    BoolDec bd;
    bd.init(p0_all + p0_off[i], p0_off[i + 1] - p0_off[i], p0_pos[i],
            p0_value[i], p0_range[i], (int)p0_bitcount[i]);
    int rc = parse_modes(bd, im.mb_w, im.mb_h, hdr_flags[3 * i],
                         seg_probs_all + (size_t)i * 3,
                         hdr_flags[3 * i + 1], hdr_flags[3 * i + 2],
                         im.modes_out);
    if (rc != 0) {
      rc_out[i] = rc;
      n_failed++;
      continue;
    }

    im.above_nz.assign(im.mb_w, 0);
    im.above_dc.assign(im.mb_w, 0);
    im.prog.assign(im.mb_h, 0);

    // padded per-partition scratch (the hot loop reads 8 bytes blind;
    // the guard must exceed one block's worst-case byte consumption
    // because exhaustion is only checked at block boundaries)
    constexpr uint64_t kGuard = 4096;
    const uint8_t* pbase = parts_all + parts_off[i];
    const uint64_t* bounds = part_bounds + part_bounds_off[i];
    uint64_t total = bounds[im.num_parts];
    im.scratch.assign(total + kGuard * im.num_parts, 0);
    im.scratch_off.resize(im.num_parts + 1);
    uint64_t w = 0;
    for (int p = 0; p < im.num_parts; p++) {
      uint64_t len = bounds[p + 1] - bounds[p];
      im.scratch_off[p] = w;
      std::memcpy(im.scratch.data() + w, pbase + bounds[p], len);
      w += len + kGuard;
    }

    for (int p = 0; p < im.num_parts && p < im.mb_h; p++) {
      streams.emplace_back();
      Stream& st = streams.back();
      std::memset(&st, 0, sizeof(st));
      st.img = &im;
      st.part = p;
      st.buf_start = im.scratch.data() + im.scratch_off[p];
      st.buf_size = bounds[p + 1] - bounds[p];
      st.buf = st.buf_start;
      st.value = 0;
      st.range = 254;       // stored as real_range - 1
      st.bits = -8;
      st.mb_x = 0;
      st.mb_y = p;
      st.ctx_left_nz = 0;
      st.ctx_left_dc = 0;
      im.pending_streams++;
    }
  }

  // Round-robin interleaved scheduler over raw pointer arrays.  The
  // inner sweep is the engine's hot loop: one branchless DFA step per
  // running stream per pass; the rare block-done branch leaves it.
  std::vector<Stream*> runv(streams.size()), blockedv(streams.size());
  Stream** run = runv.data();
  Stream** blocked = blockedv.data();
  size_t nrun = 0, nblk = 0;
  for (auto& st : streams) {
    if (start_mb(st)) run[nrun++] = &st;
    else if (st.blocked) blocked[nblk++] = &st;
  }
  while (nrun || nblk) {
    size_t j = 0;
    while (j < nrun) {
      Stream& st = *run[j];
      if (__builtin_expect(step(st), 0)) {
        if (!block_done(st)) {
          if (st.blocked) blocked[nblk++] = &st;
          run[j] = run[--nrun];
          continue;
        }
      }
      j++;
    }
    if (nblk) {
      size_t k = 0;
      while (k < nblk) {
        Stream& st = *blocked[k];
        if (start_mb(st)) {   // retry the gate
          run[nrun++] = &st;
          blocked[k] = blocked[--nblk];
        } else if (!st.blocked) {   // finished while blocked
          blocked[k] = blocked[--nblk];
        } else {
          k++;
        }
      }
      if (nrun == 0 && nblk) {
        // livelock guard: a gate that can never open means a malformed
        // stream; fail those images rather than spin.
        for (size_t k2 = 0; k2 < nblk; k2++) blocked[k2]->img->error = 1;
        break;
      }
    }
  }

  for (int i = 0; i < n_img; i++) {
    if (imgs[i].error && rc_out[i] == 0) {
      rc_out[i] = 1;
      n_failed++;
    }
  }
  return n_failed;
}

}  // extern "C"
