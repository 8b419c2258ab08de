// BLS12-381 pairing check, native host library.
//
// The TPU runs the batched hot path (field ops, NTT, MSM, KZG commit/open);
// this library is the host-side counterpart of the reference's native Rust
// prover (reference: requirements.txt:3 `fourier`, SURVEY.md §2.1): the O(1)
// per-verify pairing product — branch-heavy scalar code with no batch
// dimension, which a TPU should not run. Exposed over a C ABI and loaded via
// ctypes (zkp_subnet_tpu/utils/native.py); the pure-Python bigint oracle
// (zkp_subnet_tpu/utils/oracle.py) remains the independent reference
// implementation it is tested against.
//
// Arithmetic: 6x64-bit Montgomery form with __uint128 products (CIOS),
// tower Fq2 = Fq[u]/(u^2+1), Fq6 = Fq2[v]/(v^3-(u+1)), Fq12 = Fq6[w]/(w^2-v),
// optimal ate Miller loop in affine coordinates, naive final exponentiation
// by (q^12-1)/r (correct and fast enough for O(1) verifies; the cyclotomic
// fast path is a later optimization).

#include <cstdint>
#include <cstring>

using u64 = uint64_t;
using u128 = unsigned __int128;

// ---------------------------------------------------------------------------
// Fq: 381-bit prime field, Montgomery form
// ---------------------------------------------------------------------------

static const u64 P[6] = {
    0xb9feffffffffaaabULL, 0x1eabfffeb153ffffULL, 0x6730d2a0f6b0f624ULL,
    0x64774b84f38512bfULL, 0x4b1ba7b6434bacd7ULL, 0x1a0111ea397fe69aULL};
static const u64 PINV = 0x89f3fffcfffcfffdULL;  // -p^{-1} mod 2^64
static const u64 R_MOD_P[6] = {
    0x760900000002fffdULL, 0xebf4000bc40c0002ULL, 0x5f48985753c758baULL,
    0x77ce585370525745ULL, 0x5c071a97a256ec6dULL, 0x15f65ec3fa80e493ULL};
static const u64 R2[6] = {
    0xf4df1f341c341746ULL, 0x0a76e6a609d104f1ULL, 0x8de5476c4c95b6d5ULL,
    0x67eb88a9939d83c0ULL, 0x9a793e85b519952dULL, 0x11988fe592cae3aaULL};

#include "final_exp.h"

struct Fq { u64 l[6]; };

static inline Fq fq_zero() { Fq r; std::memset(r.l, 0, 48); return r; }
static inline Fq fq_one() { Fq r; std::memcpy(r.l, R_MOD_P, 48); return r; }

static inline bool fq_is_zero(const Fq &a) {
  u64 acc = 0;
  for (int i = 0; i < 6; i++) acc |= a.l[i];
  return acc == 0;
}

static inline bool fq_eq(const Fq &a, const Fq &b) {
  u64 acc = 0;
  for (int i = 0; i < 6; i++) acc |= a.l[i] ^ b.l[i];
  return acc == 0;
}

static inline int fq_cmp_p(const u64 *a) {  // a <=> p
  for (int i = 5; i >= 0; i--) {
    if (a[i] < P[i]) return -1;
    if (a[i] > P[i]) return 1;
  }
  return 0;
}

static inline void sub_p(u64 *a) {  // a -= p (assumes a >= p)
  u128 borrow = 0;
  for (int i = 0; i < 6; i++) {
    u128 d = (u128)a[i] - P[i] - borrow;
    a[i] = (u64)d;
    borrow = (d >> 64) & 1;
  }
}

static inline Fq fq_add(const Fq &a, const Fq &b) {
  Fq r;
  u128 carry = 0;
  for (int i = 0; i < 6; i++) {
    u128 s = (u128)a.l[i] + b.l[i] + carry;
    r.l[i] = (u64)s;
    carry = s >> 64;
  }
  if (carry || fq_cmp_p(r.l) >= 0) sub_p(r.l);
  return r;
}

static inline Fq fq_sub(const Fq &a, const Fq &b) {
  Fq r;
  u128 borrow = 0;
  for (int i = 0; i < 6; i++) {
    u128 d = (u128)a.l[i] - b.l[i] - borrow;
    r.l[i] = (u64)d;
    borrow = (d >> 64) & 1;
  }
  if (borrow) {  // r += p
    u128 carry = 0;
    for (int i = 0; i < 6; i++) {
      u128 s = (u128)r.l[i] + P[i] + carry;
      r.l[i] = (u64)s;
      carry = s >> 64;
    }
  }
  return r;
}

static inline Fq fq_neg(const Fq &a) {
  if (fq_is_zero(a)) return a;
  Fq r;
  u128 borrow = 0;
  for (int i = 0; i < 6; i++) {
    u128 d = (u128)P[i] - a.l[i] - borrow;
    r.l[i] = (u64)d;
    borrow = (d >> 64) & 1;
  }
  return r;
}

// CIOS Montgomery multiplication: r = a*b*R^{-1} mod p
static Fq fq_mul(const Fq &a, const Fq &b) {
  u64 t[8] = {0};
  for (int i = 0; i < 6; i++) {
    u128 carry = 0;
    for (int j = 0; j < 6; j++) {
      u128 cur = (u128)a.l[j] * b.l[i] + t[j] + carry;
      t[j] = (u64)cur;
      carry = cur >> 64;
    }
    u128 s = (u128)t[6] + carry;
    t[6] = (u64)s;
    t[7] = (u64)(s >> 64);

    u64 m = t[0] * PINV;
    carry = ((u128)m * P[0] + t[0]) >> 64;
    for (int j = 1; j < 6; j++) {
      u128 cur = (u128)m * P[j] + t[j] + carry;
      t[j - 1] = (u64)cur;
      carry = cur >> 64;
    }
    s = (u128)t[6] + carry;
    t[5] = (u64)s;
    t[6] = t[7] + (u64)(s >> 64);
    t[7] = 0;
  }
  Fq r;
  std::memcpy(r.l, t, 48);
  if (t[6] || fq_cmp_p(r.l) >= 0) sub_p(r.l);
  return r;
}

static inline Fq fq_sqr(const Fq &a) { return fq_mul(a, a); }

static inline Fq fq_scalar(const Fq &a, u64 k) {  // small-int multiple
  Fq r = fq_zero();
  Fq base = a;
  while (k) {
    if (k & 1) r = fq_add(r, base);
    base = fq_add(base, base);
    k >>= 1;
  }
  return r;
}

static Fq fq_inv(const Fq &a) {  // Fermat: a^(p-2); 0 -> 0
  // exponent p-2, little-endian limbs
  u64 e[6];
  std::memcpy(e, P, 48);
  e[0] -= 2;  // p is odd, no borrow
  Fq out = fq_one(), base = a;
  for (int i = 0; i < 6; i++)
    for (int b = 0; b < 64; b++) {
      if ((e[i] >> b) & 1) out = fq_mul(out, base);
      base = fq_sqr(base);
    }
  return out;
}

// big-endian 48-byte canonical -> Montgomery
static Fq fq_from_be(const uint8_t *in) {
  Fq r;
  for (int i = 0; i < 6; i++) {
    u64 v = 0;
    for (int j = 0; j < 8; j++) v = (v << 8) | in[(5 - i) * 8 + j];
    r.l[i] = v;
  }
  Fq rr;
  std::memcpy(rr.l, R2, 48);
  return fq_mul(r, rr);
}

// ---------------------------------------------------------------------------
// Fq2 = Fq[u]/(u^2 + 1)
// ---------------------------------------------------------------------------

struct Fq2 { Fq a, b; };  // a + b*u

static inline Fq2 fq2_make(const Fq &a, const Fq &b) { return {a, b}; }
static inline Fq2 fq2_zero() { return {fq_zero(), fq_zero()}; }
static inline Fq2 fq2_one() { return {fq_one(), fq_zero()}; }
static inline bool fq2_is_zero(const Fq2 &x) {
  return fq_is_zero(x.a) && fq_is_zero(x.b);
}
static inline bool fq2_eq(const Fq2 &x, const Fq2 &y) {
  return fq_eq(x.a, y.a) && fq_eq(x.b, y.b);
}
static inline Fq2 fq2_add(const Fq2 &x, const Fq2 &y) {
  return {fq_add(x.a, y.a), fq_add(x.b, y.b)};
}
static inline Fq2 fq2_sub(const Fq2 &x, const Fq2 &y) {
  return {fq_sub(x.a, y.a), fq_sub(x.b, y.b)};
}
static inline Fq2 fq2_neg(const Fq2 &x) { return {fq_neg(x.a), fq_neg(x.b)}; }
static inline Fq2 fq2_mul(const Fq2 &x, const Fq2 &y) {
  Fq t0 = fq_mul(x.a, y.a), t1 = fq_mul(x.b, y.b);
  Fq t2 = fq_mul(fq_add(x.a, x.b), fq_add(y.a, y.b));
  return {fq_sub(t0, t1), fq_sub(t2, fq_add(t0, t1))};
}
static inline Fq2 fq2_sqr(const Fq2 &x) { return fq2_mul(x, x); }
static inline Fq2 fq2_scalar(const Fq2 &x, u64 k) {
  return {fq_scalar(x.a, k), fq_scalar(x.b, k)};
}
static inline Fq2 fq2_inv(const Fq2 &x) {
  Fq norm = fq_add(fq_sqr(x.a), fq_sqr(x.b));
  Fq ninv = fq_inv(norm);
  return {fq_mul(x.a, ninv), fq_neg(fq_mul(x.b, ninv))};
}
// * (1 + u)
static inline Fq2 fq2_mul_nonres(const Fq2 &x) {
  return {fq_sub(x.a, x.b), fq_add(x.a, x.b)};
}

// ---------------------------------------------------------------------------
// Fq6 = Fq2[v]/(v^3 - (1+u)),  Fq12 = Fq6[w]/(w^2 - v)
// ---------------------------------------------------------------------------

struct Fq6 { Fq2 c0, c1, c2; };
struct Fq12 { Fq6 c0, c1; };

static inline Fq6 fq6_zero() { return {fq2_zero(), fq2_zero(), fq2_zero()}; }
static inline Fq6 fq6_one() { return {fq2_one(), fq2_zero(), fq2_zero()}; }
static inline Fq6 fq6_add(const Fq6 &x, const Fq6 &y) {
  return {fq2_add(x.c0, y.c0), fq2_add(x.c1, y.c1), fq2_add(x.c2, y.c2)};
}
static inline Fq6 fq6_sub(const Fq6 &x, const Fq6 &y) {
  return {fq2_sub(x.c0, y.c0), fq2_sub(x.c1, y.c1), fq2_sub(x.c2, y.c2)};
}
static inline Fq6 fq6_neg(const Fq6 &x) {
  return {fq2_neg(x.c0), fq2_neg(x.c1), fq2_neg(x.c2)};
}
static Fq6 fq6_mul(const Fq6 &x, const Fq6 &y) {
  Fq2 a = fq2_mul(x.c0, y.c0), b = fq2_mul(x.c1, y.c1),
      c = fq2_mul(x.c2, y.c2);
  Fq2 t0 = fq2_sub(fq2_mul(fq2_add(x.c1, x.c2), fq2_add(y.c1, y.c2)),
                   fq2_add(b, c));
  Fq2 t1 = fq2_sub(fq2_mul(fq2_add(x.c0, x.c1), fq2_add(y.c0, y.c1)),
                   fq2_add(a, b));
  Fq2 t2 = fq2_sub(fq2_mul(fq2_add(x.c0, x.c2), fq2_add(y.c0, y.c2)),
                   fq2_add(a, c));
  return {fq2_add(a, fq2_mul_nonres(t0)), fq2_add(t1, fq2_mul_nonres(c)),
          fq2_add(t2, b)};
}
static inline Fq6 fq6_sqr(const Fq6 &x) { return fq6_mul(x, x); }
static inline Fq6 fq6_mul_nonres(const Fq6 &x) {  // * v
  return {fq2_mul_nonres(x.c2), x.c0, x.c1};
}
static Fq6 fq6_inv(const Fq6 &x) {
  Fq2 c0 = fq2_sub(fq2_sqr(x.c0), fq2_mul_nonres(fq2_mul(x.c1, x.c2)));
  Fq2 c1 = fq2_sub(fq2_mul_nonres(fq2_sqr(x.c2)), fq2_mul(x.c0, x.c1));
  Fq2 c2 = fq2_sub(fq2_sqr(x.c1), fq2_mul(x.c0, x.c2));
  Fq2 t = fq2_add(
      fq2_mul_nonres(fq2_add(fq2_mul(x.c2, c1), fq2_mul(x.c1, c2))),
      fq2_mul(x.c0, c0));
  Fq2 tinv = fq2_inv(t);
  return {fq2_mul(c0, tinv), fq2_mul(c1, tinv), fq2_mul(c2, tinv)};
}

static inline Fq12 fq12_one() { return {fq6_one(), fq6_zero()}; }
static inline bool fq12_is_one(const Fq12 &x) {
  Fq12 one = fq12_one();
  return fq2_eq(x.c0.c0, one.c0.c0) && fq2_eq(x.c0.c1, one.c0.c1) &&
         fq2_eq(x.c0.c2, one.c0.c2) && fq2_eq(x.c1.c0, one.c1.c0) &&
         fq2_eq(x.c1.c1, one.c1.c1) && fq2_eq(x.c1.c2, one.c1.c2);
}
static Fq12 fq12_mul(const Fq12 &x, const Fq12 &y) {
  Fq6 a = fq6_mul(x.c0, y.c0), b = fq6_mul(x.c1, y.c1);
  Fq6 t = fq6_sub(
      fq6_mul(fq6_add(x.c0, x.c1), fq6_add(y.c0, y.c1)), fq6_add(a, b));
  return {fq6_add(a, fq6_mul_nonres(b)), t};
}
static inline Fq12 fq12_sqr(const Fq12 &x) { return fq12_mul(x, x); }
static inline Fq12 fq12_conj(const Fq12 &x) { return {x.c0, fq6_neg(x.c1)}; }
static Fq12 fq12_inv(const Fq12 &x) {
  Fq6 t = fq6_inv(fq6_sub(fq6_sqr(x.c0), fq6_mul_nonres(fq6_sqr(x.c1))));
  return {fq6_mul(x.c0, t), fq6_neg(fq6_mul(x.c1, t))};
}

// ---------------------------------------------------------------------------
// Optimal ate Miller loop (affine), mirroring the Python oracle's algorithm
// (zkp_subnet_tpu/utils/oracle.py:_miller_loop) as fresh C++.
// ---------------------------------------------------------------------------

static const u64 BLS_X = 0xd201000000010000ULL;  // |x|; x is negative

// sparse element c0 + c1*v + c4*(v*w) evaluated into the 014 basis slots
static inline Fq12 fq12_from_014(const Fq2 &c0, const Fq2 &c1,
                                 const Fq2 &c4) {
  return {{c0, c1, fq2_zero()}, {fq2_zero(), c4, fq2_zero()}};
}

// `degenerate` is set when any chord/tangent denominator is zero (T == ±Q or
// 2T with y = 0). These cases are unreachable for r-torsion inputs during the
// ate loop but ARE reachable with adversarial non-subgroup points; the affine
// formulas would silently divide by zero (fq2_inv(0) == 0), so the caller
// must reject instead of trusting the product.
static Fq12 miller_loop(const Fq &px, const Fq &py, const Fq2 &qx,
                        const Fq2 &qy, bool *degenerate) {
  Fq2 tx = qx, ty = qy;
  Fq12 f = fq12_one();

  auto line = [&](const Fq2 &ax, const Fq2 &ay, const Fq2 &bx,
                  const Fq2 &by, bool is_double) -> Fq12 {
    Fq2 num, den;
    if (is_double) {
      num = fq2_scalar(fq2_sqr(ax), 3);
      den = fq2_scalar(ay, 2);
    } else {
      num = fq2_sub(by, ay);
      den = fq2_sub(bx, ax);
    }
    if (fq2_is_zero(den)) *degenerate = true;
    Fq2 lam = fq2_mul(num, fq2_inv(den));
    Fq2 c0 = fq2_sub(fq2_mul(lam, ax), ay);
    Fq2 c1 = {fq_neg(fq_mul(lam.a, px)), fq_neg(fq_mul(lam.b, px))};
    Fq2 c4 = {py, fq_zero()};
    return fq12_from_014(c0, c1, c4);
  };

  int top = 63;
  while (!((BLS_X >> top) & 1)) top--;
  for (int i = top - 1; i >= 0; i--) {
    f = fq12_sqr(f);
    f = fq12_mul(f, line(tx, ty, tx, ty, true));
    // affine doubling of T
    Fq2 den = fq2_scalar(ty, 2);
    if (fq2_is_zero(den)) *degenerate = true;
    Fq2 lam = fq2_mul(fq2_scalar(fq2_sqr(tx), 3), fq2_inv(den));
    Fq2 x3 = fq2_sub(fq2_sqr(lam), fq2_scalar(tx, 2));
    Fq2 y3 = fq2_sub(fq2_mul(lam, fq2_sub(tx, x3)), ty);
    tx = x3; ty = y3;
    if ((BLS_X >> i) & 1) {
      f = fq12_mul(f, line(tx, ty, qx, qy, false));
      Fq2 den2 = fq2_sub(qx, tx);
      if (fq2_is_zero(den2)) *degenerate = true;
      Fq2 lam2 = fq2_mul(fq2_sub(qy, ty), fq2_inv(den2));
      Fq2 x3a = fq2_sub(fq2_sub(fq2_sqr(lam2), tx), qx);
      Fq2 y3a = fq2_sub(fq2_mul(lam2, fq2_sub(tx, x3a)), ty);
      tx = x3a; ty = y3a;
    }
  }
  return fq12_conj(f);  // x < 0
}

static Fq12 final_exp_naive(const Fq12 &f) {
  // Direct square-and-multiply by (q^12-1)/r — the reference
  // implementation the fast path below is cross-checked against
  // (and by tests/test_native.py vs the Python oracle).
  Fq12 out = fq12_one(), base = f;
  for (int i = 0; i < FINAL_EXP_LIMBS; i++)
    for (int b = 0; b < 64; b++) {
      if ((FINAL_EXP[i] >> b) & 1) out = fq12_mul(out, base);
      base = fq12_sqr(base);
    }
  return out;
}

// ---------------------------------------------------------------------------
// Cyclotomic final exponentiation (VERDICT r2 next-round #9)
//
// easy part f^((q^6-1)(q^2+1)) via conjugation + one Fq12 inversion + a
// q^2-Frobenius; hard part via the Hayashida-Hayasaka-Teruya factorization
//   3*(q^4-q^2+1)/r = (x-1)^2 (x+q)(x^2+q^2-1) + 3   (x = -BLS_X)
// computed with three ~64-bit exponentiation chains. The result is the cube
// of the classic final exp — an equivalent pairing check, since cubing is a
// bijection on the order-r group GT (gcd(3, r) = 1). Chain validated
// against the oracle by scratch/finalexp_derive.py.
// ---------------------------------------------------------------------------

#include "frobenius.h"

static inline Fq2 fq2_conj(const Fq2 &x) { return {x.a, fq_neg(x.b)}; }

static inline Fq2 frob_c(const u64 c[2][6]) {
  Fq2 g;
  std::memcpy(g.a.l, c[0], 48);
  std::memcpy(g.b.l, c[1], 48);
  return g;
}

static Fq12 fq12_frob1(const Fq12 &x) {
  // basis coeffs: c0 = (w^0, w^2, w^4), c1 = (w^1, w^3, w^5)
  Fq12 r;
  r.c0.c0 = fq2_conj(x.c0.c0);
  r.c0.c1 = fq2_mul(fq2_conj(x.c0.c1), frob_c(FROB1[1]));
  r.c0.c2 = fq2_mul(fq2_conj(x.c0.c2), frob_c(FROB1[3]));
  r.c1.c0 = fq2_mul(fq2_conj(x.c1.c0), frob_c(FROB1[0]));
  r.c1.c1 = fq2_mul(fq2_conj(x.c1.c1), frob_c(FROB1[2]));
  r.c1.c2 = fq2_mul(fq2_conj(x.c1.c2), frob_c(FROB1[4]));
  return r;
}

static inline Fq2 fq2_scale(const Fq2 &x, const Fq &k) {
  return {fq_mul(x.a, k), fq_mul(x.b, k)};
}

static Fq12 fq12_frob2(const Fq12 &x) {
  // q^2-Frobenius fixes Fq2; coefficients are real
  Fq12 r;
  r.c0.c0 = x.c0.c0;
  r.c0.c1 = fq2_scale(x.c0.c1, frob_c(FROB2[1]).a);
  r.c0.c2 = fq2_scale(x.c0.c2, frob_c(FROB2[3]).a);
  r.c1.c0 = fq2_scale(x.c1.c0, frob_c(FROB2[0]).a);
  r.c1.c1 = fq2_scale(x.c1.c1, frob_c(FROB2[2]).a);
  r.c1.c2 = fq2_scale(x.c1.c2, frob_c(FROB2[4]).a);
  return r;
}

static Fq12 fq12_exp_u64(const Fq12 &a, u64 e) {
  Fq12 out = fq12_one(), base = a;
  while (e) {
    if (e & 1) out = fq12_mul(out, base);
    base = fq12_sqr(base);
    e >>= 1;
  }
  return out;
}

static Fq12 final_exp(const Fq12 &f) {
  // easy: m = f^((q^6-1)(q^2+1))
  Fq12 m = fq12_mul(fq12_conj(f), fq12_inv(f));
  m = fq12_mul(fq12_frob2(m), m);
  // hard*3: (x-1)^2 = (BLS_X+1)^2 (sign squares away)
  Fq12 a = fq12_exp_u64(fq12_exp_u64(m, BLS_X + 1), BLS_X + 1);
  // a^(x+q) = frob1(a) * conj(a^BLS_X)
  Fq12 b = fq12_mul(fq12_frob1(a), fq12_conj(fq12_exp_u64(a, BLS_X)));
  // b^(x^2+q^2-1) = b^(BLS_X^2) * frob2(b) * conj(b)
  Fq12 c = fq12_mul(
      fq12_mul(fq12_exp_u64(fq12_exp_u64(b, BLS_X), BLS_X), fq12_frob2(b)),
      fq12_conj(b));
  Fq12 m3 = fq12_mul(fq12_sqr(m), m);
  return fq12_mul(c, m3);
}

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

// g1s: n * 96 bytes (x||y big-endian affine); g2s: n * 192 bytes
// (x0||x1||y0||y1 big-endian affine, c0-first). Infinity pairs must be
// filtered out by the caller. Returns 1 iff prod e(P_i, Q_i) == 1, 0 if not,
// -1 on degenerate input (a Miller-loop line denominator hit zero — only
// possible for non-r-torsion G2 points; callers must treat it as reject).
// One-time cross-check of the cyclotomic chain against the naive
// exponentiation: final_exp(f) must equal final_exp_naive(f)^3 for any
// invertible f (cubing is bijective on GT). Runs on the first pairing call
// (~40 ms); a mismatch poisons every subsequent check to reject.
static int final_exp_selfcheck() {
  Fq12 f = fq12_one();
  // an arbitrary invertible, non-cyclotomic element
  f.c0.c0.a = fq_add(fq_one(), fq_one());
  f.c0.c1.b = fq_one();
  f.c1.c2.a = fq_add(fq_one(), fq_add(fq_one(), fq_one()));
  Fq12 naive = final_exp_naive(f);
  Fq12 naive3 = fq12_mul(fq12_sqr(naive), naive);
  Fq12 fast = final_exp(f);
  return (fq2_eq(fast.c0.c0, naive3.c0.c0) &&
          fq2_eq(fast.c0.c1, naive3.c0.c1) &&
          fq2_eq(fast.c0.c2, naive3.c0.c2) &&
          fq2_eq(fast.c1.c0, naive3.c1.c0) &&
          fq2_eq(fast.c1.c1, naive3.c1.c1) &&
          fq2_eq(fast.c1.c2, naive3.c1.c2)) ? 1 : 0;
}

int zkp_pairing_product_is_one(const uint8_t *g1s, const uint8_t *g2s,
                               int n) {
  static const int selfcheck_ok = final_exp_selfcheck();
  if (!selfcheck_ok) return -1;
  Fq12 f = fq12_one();
  bool degenerate = false;
  for (int i = 0; i < n; i++) {
    const uint8_t *g1 = g1s + 96 * i;
    const uint8_t *g2 = g2s + 192 * i;
    Fq px = fq_from_be(g1), py = fq_from_be(g1 + 48);
    Fq2 qx = {fq_from_be(g2), fq_from_be(g2 + 48)};
    Fq2 qy = {fq_from_be(g2 + 96), fq_from_be(g2 + 144)};
    f = fq12_mul(f, miller_loop(px, py, qx, qy, &degenerate));
  }
  if (degenerate) return -1;
  return fq12_is_one(final_exp(f)) ? 1 : 0;
}

const char *zkp_native_version() { return "zkp-native-0.1"; }

}  // extern "C"
