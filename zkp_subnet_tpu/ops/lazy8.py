"""Lazy (redundant) byte-limb Fq engine — the carry-free MSM hot path.

Round-4 profiling showed the carry machinery (Kogge-Stone generate/propagate
ladders + per-op canonical subtraction) is ~60 % of the Montgomery-multiply
kernel's op count (PROFILE.md "next lever"). This engine removes it:

- **49 signed f32 byte digits, R' = 2^392.** One limb more than the
  canonical engine's 48 (ops/lane8.py). Because p/R' ≈ 4·10⁻⁴, a Montgomery
  product's value bound is ≈ 1.005·p *regardless of input bounds* (the
  m·p/R' term dominates): multiplication itself is the reduction, so no
  conditional subtract, no canonicalization, and no value-growth tracking
  are needed anywhere inside a point-formula chain — coordinate values
  self-stabilize at ~2p through arbitrarily long add/double chains.
- **Signed digits, open-top normalization.** Digits live in [-256, 256]
  (exact in f32 AND bf16). Carry relaxation is floor-based local passes
  (exact for signed integers); the top digit only ever *receives* carries,
  so nothing is truncated — and the top digit stays tiny automatically
  because it is value-bound (value ≤ ~12p ⇒ top digit ≤ 2). Subtraction is
  digit-wise `a - b`: no borrows, no C·p offsets.
- **The REDC low-half carry is an f32 dot, not a carry scan.** After local
  normalization the low 49 digits of S = T + m·p represent L ≡ 0 (mod R')
  with |L| < 1.004·R', hence L/R' ∈ {-1, 0, 1}; an 8-digit floating
  estimate (error < 2⁻⁶⁰) recovers it exactly with one dot + round.
- **No Montgomery-domain conversion.** RCB15 add/double are bi-homogeneous,
  so the per-multiply scale mismatch 2^(384-392) accumulates *uniformly* on
  (X, Y, Z) and cancels projectively; canonical-form (R = 2^384) points
  feed in unchanged and every downstream consumer (affinization, the
  canonical engine's point ops) is scale-invariant. Only the final decode
  (`canon`) maps a digit vector to its unique value mod p, via an exact
  49-step Horner in the bigint-checked ops/field.py engine.

Exactness budget (f32 holds integers |x| ≤ 2^24, bf16 |x| ≤ 256):
  schoolbook columns |Σ| ≤ 49·256² ≈ 3.2e6; S = T + U columns ≤ 6.5e6;
  all norm-pass arithmetic is floor/mul-by-2^-8 (exact); the two constant
  products are bf16×bf16→f32 MXU matmuls with |inputs| ≤ 256.

Replaces the compute core of the reference's external Rust prover
(reference: requirements.txt:3, neurons/miner.py:38-54) for the MSM hot
path; bit-exactness of canon() against the bigint oracle is pinned by
tests/test_lazy8.py.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .field import FQ, PrimeField
from . import lane8 as l8
from .lane8 import ByteLaneField, _int_to_bytes, _toeplitz

__all__ = [
    "LazyByteField", "ZFQ",
    "pts_to_lane9", "lane9_to_field", "pts_from_lane9",
    "g19_infinity", "g19_add", "g19_double", "g19_neg", "g19_select",
    "g19_add_seq", "g19_double_seq",
]


class LazyByteField(ByteLaneField):
    """Batched lazy ops on (..., L9, N) signed f32 byte-digit arrays.

    Layout matches ByteLaneField (digits on sublanes, batch on lanes) with
    one extra top limb. Inherits the shape/carry helpers; the canonical
    add/sub/mont_mul of the base class are NOT valid on this limb count —
    use lmul/ladd/lsub/lneg.
    """

    CONST_NAMES = ("p_col", "one_col", "nprime_mat", "p_mat", "b3_col",
                   "wlo_col")

    def __init__(self, base: PrimeField):
        self.base = base
        self.L8 = 2 * base.L + 1          # 49 for Fq — L9, kept as L8 so
        self.p = base.p                   # generic kernel glue (pallas_g1)
        L9 = self.L8                      # sees one limb-count attribute
        Rp = 1 << (8 * L9)                # R' = 2^392
        self.mont_rp = Rp % base.p
        # numpy constants, device-materialized on first use (see
        # ByteLaneField.__getattr__ — imports must not init the backend)
        self._np = {}
        self._np["p_col"] = (_int_to_bytes(base.p, L9).astype(
            np.float32).reshape(L9, 1), jnp.float32)
        self._np["one_col"] = (_int_to_bytes(self.mont_rp, L9).astype(
            np.float32).reshape(L9, 1), jnp.float32)
        # b3 = 3·b = 12 for BLS12-381 G1, in R' Montgomery form so that
        # lmul(t2, b3) = 12·t2 exactly (the formulas' only constant)
        self._np["b3_col"] = (_int_to_bytes(
            12 * Rp % base.p, L9).astype(np.float32).reshape(L9, 1),
            jnp.float32)
        nprime = (-pow(base.p, -1, Rp)) % Rp
        self._np["nprime_mat"] = (
            _toeplitz(_int_to_bytes(nprime, L9), L9), jnp.bfloat16)
        self._np["p_mat"] = (
            _toeplitz(_int_to_bytes(base.p, L9), 2 * L9), jnp.bfloat16)
        # REDC low-half carry estimate weights: w_i = 256^(i-L9) for the top
        # 8 low digits, 0 below (values below 2^-126 would denormalize; the
        # neglected tail is < 2^-56 of the {-1,0,1} decision)
        w = np.zeros((L9, 1), dtype=np.float32)
        for i in range(L9 - 8, L9):
            w[i, 0] = 2.0 ** (8 * (i - L9))
        self._np["wlo_col"] = (w, jnp.float32)

    # -- normalization ------------------------------------------------------

    def _norm_open(self, t, passes: int):
        """Local carry relaxation that never truncates: rows 0..M-2 are
        split mod 256, carries flow upward, the TOP row only accumulates
        (it is value-bound small; see module docstring).

        Formulated as full-array ops with a top-row MASK — sublane-axis
        slice/concat per pass made Mosaic relayout the whole array each
        time (~4.5 ms per pass at 64k lanes, measured r5)."""
        M = t.shape[-2]
        # f32 mask from an int iota (Mosaic rejects f32 iota and i1
        # vectors; max() keeps it pure arithmetic)
        idx = jax.lax.broadcasted_iota(
            jnp.int32, (M, 1), 0).astype(jnp.float32)
        is_top = jnp.maximum(idx - float(M - 2), 0.0)
        not_top = 1.0 - is_top
        for _ in range(passes):
            lo, hi = self._split256(t)
            # top row keeps its value and emits no carry
            t = (lo * not_top + t * is_top
                 + self._shift_up(hi * not_top, 1))
        return t

    # -- lazy ops -----------------------------------------------------------

    def lmul(self, a, b):
        """Redundant Montgomery product a·b·R'⁻¹ (mod p, as a value class).

        Inputs: signed digits |d| ≤ 256, any value (self-stabilizing).
        Output: signed digits |d| ≤ 256, |value| ≤ 1.005·p + 4e-4·|a||b|/p².
        """
        L9 = self.L8
        a, b = jnp.broadcast_arrays(a, b)
        T = self._mul_columns(a, b)                  # (..., 2·L9, N)
        # m = lo(T)·n' mod R' — full norm (top-row drops ARE the mod R')
        Tlo = self._norm(jax.lax.slice_in_dim(T, 0, L9, axis=-2), 3)
        m = self._norm(self._const_mul(self.nprime_mat, Tlo), 3)
        U = self._const_mul(self.p_mat, m)
        S = self._norm_open(T + U, 3)                # digits ≤ 256, exact
        # low half L ≡ 0 (mod R'), |L| < 1.004 R'  ⇒  L/R' ∈ {-1, 0, 1}
        Slo = jax.lax.slice_in_dim(S, 0, L9, axis=-2)
        e = jnp.sum(Slo * self.wlo_col, axis=-2, keepdims=True)
        carry = jnp.floor(e + 0.5)                   # exact (err < 2^-20)
        H = jax.lax.slice_in_dim(S, L9, 2 * L9, axis=-2)
        pad = [(0, 0)] * (H.ndim - 2) + [(0, L9 - 1), (0, 0)]
        out = H + jnp.pad(carry, pad)
        return self._norm_open(out, 1)

    def ladd(self, a, b):
        return self._norm_open(a + b, 2)

    def lsub(self, a, b):
        return self._norm_open(a - b, 2)

    def lneg(self, a):
        return -a

    # aliases so the generic point formulas / pallas facades can use the
    # same method names as the canonical engine
    mont_mul, add, sub, neg = lmul, ladd, lsub, lneg

    def zeros(self, shape):
        s = tuple(shape)
        return jnp.zeros(s[:-1] + (self.L8,) + s[-1:], dtype=jnp.float32)

    def ones(self, shape):
        s = tuple(shape)
        return jnp.broadcast_to(self.one_col, s[:-1] + (self.L8,) + s[-1:])


ZFQ = LazyByteField(FQ)


# -- conversions -------------------------------------------------------------


def pts_to_lane9(p: jnp.ndarray) -> jnp.ndarray:
    """(N, 3, L) uint32 16-bit-limb points → (3, L9, N) signed-digit lanes
    (canonical digits are a valid lazy representation; top digit 0)."""
    lanes = l8.pts_to_lane8(p)                       # (3, 48, N)
    pad = [(0, 0), (0, 1), (0, 0)]
    return jnp.pad(lanes, pad)


def to_lane9(a: jnp.ndarray) -> jnp.ndarray:
    """(..., N, L) uint32 16-bit limbs → (..., L9, N) lazy digits."""
    lanes = l8.to_lane8(a)
    pad = [(0, 0)] * (lanes.ndim - 2) + [(0, 1), (0, 0)]
    return jnp.pad(lanes, pad)


def lane9_to_field(v: jnp.ndarray, F=None) -> jnp.ndarray:
    """(..., L9, N) signed digits → (..., N, L) canonical uint32 limbs of
    the value mod p — exact 49-step Horner in the ops/field.py engine
    (acc = 256·acc + d_i), branchless and bigint-checked.

    Each digit d ∈ [-256, 256] enters as the canonical residue of d + 256
    (a single 16-bit limb) followed by subtracting the constant 256."""
    F = ZFQ if F is None else F
    base = F.base
    L9 = F.L8
    digits = jnp.moveaxis(v, -2, 0)                  # (L9, ..., N)
    batch = digits.shape[1:]

    c256 = base.encode([256])[0]                     # Montgomery form: so
    # mont_mul(acc, c256) = 256·acc for PLAIN acc (mont factors cancel)
    c256 = jnp.broadcast_to(c256, batch + (base.L,))
    neg256 = jnp.asarray(base.to_limbs((base.p - 256) % base.p))
    neg256 = jnp.broadcast_to(neg256, batch + (base.L,))

    def step(acc, d):
        dl = (d + 256.0).astype(jnp.uint32)[..., None]
        dlimbs = jnp.pad(dl, [(0, 0)] * d.ndim + [(0, base.L - 1)])
        acc = base.add(base.mont_mul(acc, c256), dlimbs)
        return base.add(acc, neg256), None

    acc0 = jnp.zeros(batch + (base.L,), dtype=jnp.uint32)
    acc, _ = jax.lax.scan(step, acc0, digits[::-1])
    return acc


def pts_from_lane9(v: jnp.ndarray) -> jnp.ndarray:
    """(3, L9, N) lazy points → (N, 3, L) canonical uint32 limbs (each
    coordinate is reduced to its unique value mod p; the projective point
    is unchanged)."""
    flat = lane9_to_field(v)                         # (3, N, L)
    return jnp.swapaxes(flat, 0, 1)


# -- point formulas (RCB15, a=0, b3=12 — same source as ops/curve.py) --------


def g19_infinity(shape=(), F=None) -> jnp.ndarray:
    F = ZFQ if F is None else F
    s = tuple(shape) if shape else (1,)
    x = F.zeros(s)
    y = F.ones(s)
    return jnp.stack([x, y, x], axis=-3)


def _unpack(p):
    return p[..., 0, :, :], p[..., 1, :, :], p[..., 2, :, :]


def _pack(x, y, z):
    return jnp.stack([x, y, z], axis=-3)


def _stk(*xs):
    return jnp.stack(xs, axis=0)


def g19_add(p, q, F=None):
    """Complete projective add, layer-batched (3 lmul instances — the
    XLA-graph compile-time shape; bit-identical math to g19_add_seq)."""
    F = ZFQ if F is None else F
    p, q = jnp.broadcast_arrays(p, q)
    X1, Y1, Z1 = _unpack(p)
    X2, Y2, Z2 = _unpack(q)
    mul, add, sub = F.mont_mul, F.add, F.sub

    a1, a2, a3, a4, a5, a6 = add(_stk(X1, X2, Y1, Y2, X1, X2),
                                 _stk(Y1, Y2, Z1, Z2, Z1, Z2))
    t0, t1, t2, p1, p2, p3 = mul(_stk(X1, Y1, Z1, a1, a3, a5),
                                 _stk(X2, Y2, Z2, a2, a4, a6))
    s1, s2, s3, dbl0 = add(_stk(t0, t1, t0, t0), _stk(t1, t2, t2, t0))
    t3, t4, ty = sub(_stk(p1, p2, p3), _stk(s1, s2, s3))
    b3 = F.b3_col
    t2b, y3b = mul(_stk(t2, ty), jnp.broadcast_to(b3, (2,) + t2.shape))
    z3t, t0t = add(_stk(t1, dbl0), _stk(t2b, t0))
    t1t = sub(t1, t2b)
    w0, w1, w2, w3, w4, w5 = mul(_stk(t3, t4, y3b, t1t, z3t, t0t),
                                 _stk(t1t, y3b, t0t, z3t, t4, t3))
    X3 = sub(w0, w1)
    Y3, Z3 = add(_stk(w2, w4), _stk(w3, w5))
    return _pack(X3, Y3, Z3)


def g19_double(p, F=None):
    """Complete projective doubling, layer-batched (RCB15 Algorithm 9)."""
    F = ZFQ if F is None else F
    X, Y, Z = _unpack(p)
    mul, add, sub = F.mont_mul, F.add, F.sub

    t0, tyz, tzz, txy = mul(_stk(Y, Y, Z, X), _stk(Y, Z, Z, Y))
    d1 = add(t0, t0)
    d2 = add(d1, d1)
    z8 = add(d2, d2)
    b3 = F.b3_col
    t2b = mul(tzz, jnp.broadcast_to(b3, tzz.shape))
    y3a, t1c = add(_stk(t0, t2b), _stk(t2b, t2b))
    t2c = add(t1c, t2b)
    t0b = sub(t0, t2c)
    x3m, z3, y3m, x3o = mul(_stk(t2b, tyz, t0b, t0b),
                            _stk(z8, z8, y3a, txy))
    Y3 = add(x3m, y3m)
    X3 = add(x3o, x3o)
    return _pack(X3, Y3, z3)


def g19_add_seq(p, q, F=None):
    """Complete RCB15 add, sequential muls — the Pallas-kernel shape (small
    live set per op; see lane8.g18_add_seq's rationale)."""
    F = ZFQ if F is None else F
    X1, Y1, Z1 = _unpack(p)
    X2, Y2, Z2 = _unpack(q)
    mul, add, sub = F.mont_mul, F.add, F.sub

    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    p1 = mul(add(X1, Y1), add(X2, Y2))
    p2 = mul(add(Y1, Z1), add(Y2, Z2))
    p3 = mul(add(X1, Z1), add(X2, Z2))
    t3 = sub(p1, add(t0, t1))
    t4 = sub(p2, add(t1, t2))
    ty = sub(p3, add(t0, t2))
    b3 = jnp.broadcast_to(F.b3_col, t2.shape)
    t2b = mul(t2, b3)
    y3b = mul(ty, b3)
    z3t = add(t1, t2b)
    t0t = add(add(t0, t0), t0)
    t1t = sub(t1, t2b)
    X3 = sub(mul(t3, t1t), mul(t4, y3b))
    Y3 = add(mul(y3b, t0t), mul(t1t, z3t))
    Z3 = add(mul(z3t, t4), mul(t0t, t3))
    return _pack(X3, Y3, Z3)


def g19_add_wide(p, q, F=None):
    """Complete RCB15 add, lane-axis-batched: bit-identical math to
    g19_add / g19_add_seq, but every dependency layer's field ops are
    CONCATENATED along the lane axis so the whole add is 8 field-op
    launches (6n/6n/4n/3n/2n/3n/6n/3n wide) instead of g19_add_seq's 29
    launches of width n.

    Built for the MSM scan regime (ops/msm.py): at the scan's W·T = 8k
    lane width the per-op Pallas kernels are LAUNCH-bound (~0.1 ms fixed
    per launch vs ~0.05 ms of lane work — pallas_g1.CANONS note), so with
    F = pallas_g1.op_lazy_field() the 3.6× launch-count cut is nearly a
    3× scan-step cut; the +14 % lane-volume overhead (33n vs 29n) only
    matters at widths ≥ 64k where g19_add_seq should be used instead
    (pallas_g1.dispatch_ladd picks by width). Negations ride the signed
    digits for free, so the subtract layers merge into add launches."""
    F = ZFQ if F is None else F
    p, q = jnp.broadcast_arrays(p, q)
    X1, Y1, Z1 = _unpack(p)
    X2, Y2, Z2 = _unpack(q)
    mul, add, sub, neg = F.mont_mul, F.add, F.sub, F.neg
    n = X1.shape[-1]

    def cat(*xs):
        return jnp.concatenate(xs, axis=-1)

    def split(a, k):
        return [jax.lax.slice_in_dim(a, i * n, (i + 1) * n, axis=-1)
                for i in range(k)]

    ab = add(cat(X1, Y1, X1, X2, Y2, X2),
             cat(Y1, Z1, Z1, Y2, Z2, Z2))
    a1, a3, a5, a2, a4, a6 = split(ab, 6)
    m = mul(cat(X1, Y1, Z1, a1, a3, a5),
            cat(X2, Y2, Z2, a2, a4, a6))
    t0, t1, t2, p1, p2, p3 = split(m, 6)
    s = add(cat(t0, t1, t0, t0), cat(t1, t2, t2, t0))
    s1, s2, s3, dbl0 = split(s, 4)
    d = sub(cat(p1, p2, p3), cat(s1, s2, s3))
    t3, t4, ty = split(d, 3)
    b3 = jnp.broadcast_to(F.b3_col, t2.shape)
    mb = mul(cat(t2, ty), cat(b3, b3))
    t2b, y3b = split(mb, 2)
    za = add(cat(t1, dbl0, t1), cat(t2b, t0, neg(t2b)))
    z3t, t0t, t1t = split(za, 3)
    w = mul(cat(t3, t4, y3b, t1t, z3t, t0t),
            cat(t1t, y3b, t0t, z3t, t4, t3))
    w0, w1, w2, w3, w4, w5 = split(w, 6)
    fin = add(cat(w0, w2, w4), cat(neg(w1), w3, w5))
    X3, Y3, Z3 = split(fin, 3)
    return _pack(X3, Y3, Z3)


def g19_double_seq(p, F=None):
    """Complete RCB15 doubling, sequential muls."""
    F = ZFQ if F is None else F
    X, Y, Z = _unpack(p)
    mul, add, sub = F.mont_mul, F.add, F.sub

    t0 = mul(Y, Y)
    tyz = mul(Y, Z)
    tzz = mul(Z, Z)
    txy = mul(X, Y)
    z8 = add(add(t0, t0), add(t0, t0))
    z8 = add(z8, z8)
    b3 = jnp.broadcast_to(F.b3_col, tzz.shape)
    t2b = mul(tzz, b3)
    y3a = add(t0, t2b)
    t2c = add(add(t2b, t2b), t2b)
    t0b = sub(t0, t2c)
    Y3 = add(mul(t2b, z8), mul(t0b, y3a))
    x3o = mul(t0b, txy)
    X3 = add(x3o, x3o)
    Z3 = mul(tyz, z8)
    return _pack(X3, Y3, Z3)


def g19_neg(p, F=None):
    F = ZFQ if F is None else F
    X, Y, Z = _unpack(p)
    return _pack(X, F.neg(Y), Z)


def g19_select(cond, p, q):
    """cond ? p : q — cond bool shaped like the points' batch dims + (N,)."""
    return jnp.where(cond[..., None, None, :], p, q)
