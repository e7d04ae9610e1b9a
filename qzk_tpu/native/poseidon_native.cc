// Native host-side Poseidon + Goldilocks kernels for the witness
// generator hot path (the TPU handles the bulk prover workloads; this
// covers the inherently sequential hash-chain levels of witness
// generation, where numpy's per-call overhead dominates).
//
// Reference analog: the witness generators of the plonky2 engine the
// Rust reference delegates to (SURVEY.md §2b "Witness generation").
// Built as a plain C-ABI shared object, loaded via ctypes
// (qzk_tpu/native/__init__.py); falls back to numpy if unavailable.

#include <cstdint>
#include <cstring>

using u64 = std::uint64_t;
using u128 = unsigned __int128;

static const u64 P = 0xFFFFFFFF00000001ULL;
static const u64 EPS = 0xFFFFFFFFULL; // 2^64 mod p

static inline u64 reduce128(u128 x) {
  u64 lo = (u64)x;
  u64 hi = (u64)(x >> 64);
  u64 hi_hi = hi >> 32;
  u64 hi_lo = hi & EPS;
  u64 t = lo - hi_hi;
  if (lo < hi_hi) t -= EPS; // wraps correctly mod p
  u64 a = hi_lo * EPS;
  u64 s = t + a;
  if (s < t) s += EPS;
  if (s >= P) s -= P;
  if (s >= P) s -= P;
  return s;
}

static inline u64 gmul(u64 a, u64 b) { return reduce128((u128)a * b); }

static inline u64 gadd(u64 a, u64 b) {
  u64 s = a + b;
  if (s < a) s += EPS;
  if (s >= P) s -= P;
  return s;
}

static inline u64 gsub(u64 a, u64 b) {
  u64 d = a - b;
  if (a < b) d -= EPS;
  return d;
}

static inline u64 sbox7(u64 x) {
  u64 x2 = gmul(x, x);
  u64 x3 = gmul(x2, x);
  u64 x4 = gmul(x2, x2);
  return gmul(x4, x3);
}

// MDS: entries tiny; accumulate in u128.
static inline void mds(const u64 m[12][12], const u64 *in, u64 *out) {
  for (int r = 0; r < 12; ++r) {
    u128 acc = 0;
    for (int c = 0; c < 12; ++c) acc += (u128)m[r][c] * in[c];
    out[r] = reduce128(acc);
  }
}

extern "C" {

// Batched field ops (flat arrays of length n).
void gl_mul(const u64 *a, const u64 *b, u64 *out, long n) {
  for (long i = 0; i < n; ++i) out[i] = gmul(a[i], b[i]);
}
void gl_add(const u64 *a, const u64 *b, u64 *out, long n) {
  for (long i = 0; i < n; ++i) out[i] = gadd(a[i], b[i]);
}
void gl_sub(const u64 *a, const u64 *b, u64 *out, long n) {
  for (long i = 0; i < n; ++i) out[i] = gsub(a[i], b[i]);
}
void gl_mul_sa(u64 s, const u64 *b, u64 *out, long n) {
  for (long i = 0; i < n; ++i) out[i] = gmul(s, b[i]);
}
void gl_add_sa(u64 s, const u64 *b, u64 *out, long n) {
  for (long i = 0; i < n; ++i) out[i] = gadd(s, b[i]);
}
void gl_sub_as(const u64 *a, u64 s, u64 *out, long n) {
  for (long i = 0; i < n; ++i) out[i] = gsub(a[i], s);
}
void gl_sub_sa(u64 s, const u64 *b, u64 *out, long n) {
  for (long i = 0; i < n; ++i) out[i] = gsub(s, b[i]);
}

// Batched Poseidon permutation: states (B, 12) in-place.
// mds_m: (12*12), rc: (n_rounds*12), half_full, n_partial as in python.
void poseidon_permute(u64 *states, long B, const u64 *mds_m, const u64 *rc,
                      int half_full, int n_partial) {
  u64 m[12][12];
  for (int r = 0; r < 12; ++r)
    for (int c = 0; c < 12; ++c) m[r][c] = mds_m[r * 12 + c];
  int n_rounds = 2 * half_full + n_partial;
  for (long b = 0; b < B; ++b) {
    u64 *s = states + b * 12;
    u64 tmp[12];
    for (int r = 0; r < n_rounds; ++r) {
      const u64 *rcr = rc + r * 12;
      bool full = (r < half_full) || (r >= half_full + n_partial);
      if (full) {
        for (int i = 0; i < 12; ++i) s[i] = sbox7(gadd(s[i], rcr[i]));
      } else {
        for (int i = 0; i < 12; ++i) s[i] = gadd(s[i], rcr[i]);
        s[0] = sbox7(s[0]);
      }
      mds(m, s, tmp);
      std::memcpy(s, tmp, sizeof(tmp));
    }
  }
}

// Poseidon gate witness trace (mirrors gates.poseidon_trace):
//   inputs (B, 12), swap (B,) -> deltas (B, 4), stored (B, 106),
//   outputs (B, 12).
// stored layout: full0 rounds 1..3 (3*12) | partial (n_partial) |
//                full1 rounds 0..3 (4*12).
void poseidon_trace(const u64 *inputs, const u64 *swap, long B,
                    const u64 *mds_m, const u64 *rc, int half_full,
                    int n_partial, u64 *deltas, u64 *stored, u64 *outputs) {
  u64 m[12][12];
  for (int r = 0; r < 12; ++r)
    for (int c = 0; c < 12; ++c) m[r][c] = mds_m[r * 12 + c];
  long stored_w = (half_full - 1) * 12 + n_partial + half_full * 12;
  for (long b = 0; b < B; ++b) {
    const u64 *in = inputs + b * 12;
    u64 *dl = deltas + b * 4;
    u64 *st = stored + b * stored_w;
    u64 *out = outputs + b * 12;
    u64 s[12], tmp[12], pre[12];
    for (int i = 0; i < 4; ++i) dl[i] = gmul(swap[b], gsub(in[i + 4], in[i]));
    for (int i = 0; i < 4; ++i) s[i] = gadd(in[i], dl[i]);
    for (int i = 0; i < 4; ++i) s[i + 4] = gsub(in[i + 4], dl[i]);
    for (int i = 8; i < 12; ++i) s[i] = in[i];
    long sp = 0;
    // round 0 (sbox inputs linear, not stored)
    for (int i = 0; i < 12; ++i) tmp[i] = sbox7(gadd(s[i], rc[i]));
    mds(m, tmp, s);
    // full rounds 1..half_full-1: store sbox inputs
    for (int r = 1; r < half_full; ++r) {
      const u64 *rcr = rc + r * 12;
      for (int i = 0; i < 12; ++i) {
        pre[i] = gadd(s[i], rcr[i]);
        st[sp + i] = pre[i];
        tmp[i] = sbox7(pre[i]);
      }
      sp += 12;
      mds(m, tmp, s);
    }
    // partial rounds: store lane-0 sbox input
    for (int pr = 0; pr < n_partial; ++pr) {
      const u64 *rcr = rc + (half_full + pr) * 12;
      for (int i = 0; i < 12; ++i) pre[i] = gadd(s[i], rcr[i]);
      st[sp++] = pre[0];
      pre[0] = sbox7(pre[0]);
      mds(m, pre, s);
    }
    // second-half full rounds: store all sbox inputs
    for (int r = 0; r < half_full; ++r) {
      const u64 *rcr = rc + (half_full + n_partial + r) * 12;
      for (int i = 0; i < 12; ++i) {
        pre[i] = gadd(s[i], rcr[i]);
        st[sp + i] = pre[i];
        tmp[i] = sbox7(pre[i]);
      }
      sp += 12;
      mds(m, tmp, s);
    }
    std::memcpy(out, s, sizeof(s));
  }
}

} // extern "C"
