"""Byte-limb float32 field engine — the VPU/MXU-native hot path.

Layout: ``(..., L8, N)`` float32 — 8-bit limbs on the TPU *sublane* axis,
batch on the *lane* axis, every limb an exact small integer held in f32.
This is the radix-2^8 rebuild of ``ops.lane``'s radix-2^16 uint32 engine,
motivated by how a TPU v5e actually multiplies:

- the VPU is float-centric: f32 multiply-add runs at native rate, while
  32-bit integer multiplies are emulated (several ops each). With 8-bit
  limbs every partial product (≤ 255² = 65 025) and every schoolbook
  column sum (≤ 48·255² ≈ 3.12e6) stays below 2^24, so plain f32 FMAs
  compute them EXACTLY — no hi/lo splitting, half the passes of the int
  engine;
- the two Montgomery constant products (T·n' mod R and m·p) contract a
  batch axis against a SHARED Toeplitz matrix — a real MXU matmul. Limbs
  ≤ 256 are exact in bfloat16 and the MXU accumulates in f32, so the
  matmuls are bit-exact too (column sums ≤ 48·256·255 < 2^24);
- carries/borrows are Kogge-Stone scans on the sublane axis kept entirely
  in f32 arithmetic (OR = max, AND = product, comparisons as exact floor
  tricks) — no integer multiply anywhere, and no i1 vectors either, which
  Mosaic (Pallas TPU) refuses to pad/cast.

Bit-exactness against ``ops.field``/``ops.lane`` (and transitively the
bigint oracle) is pinned by tests/test_lane8.py.

Replaces the compute core of the reference's external Rust prover
(reference: requirements.txt:3, neurons/miner.py:38-54) for the batched
hot path; ``ops.field`` remains the API/runtime layout at the boundaries.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .field import PrimeField, FQ, FR

#: schoolbook column-sum formulation: "grouped" (aligned shift-FMA, default)
#: or "skew" (pad/flatten/re-split) — A/B measured in scratch/tpu_lmul.py
_SCHOOLBOOK = __import__("os").environ.get("ZKP_MUL_SCHOOLBOOK", "grouped")

__all__ = [
    "ByteLaneField", "BFQ", "BFR",
    "u16_to_u8_limbs", "u8_to_u16_limbs", "to_lane8", "from_lane8",
    "pts_to_lane8", "pts_from_lane8",
    "g18_infinity", "g18_add", "g18_double", "g18_neg", "g18_select",
    "g18_sum",
]


# -- limb-radix conversions ---------------------------------------------------


def u16_to_u8_limbs(a: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """(..., L, ...) uint32 16-bit limbs → (..., 2L, ...) uint32 byte limbs
    along ``axis`` (little-endian within each 16-bit limb)."""
    axis = axis % a.ndim
    lo = a & jnp.uint32(0xFF)
    hi = (a >> 8) & jnp.uint32(0xFF)
    stacked = jnp.stack([lo, hi], axis=axis + 1)   # (..., L, 2, ...)
    shape = list(a.shape)
    shape[axis] *= 2
    return stacked.reshape(shape)


def u8_to_u16_limbs(a: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Inverse of :func:`u16_to_u8_limbs` (input may be any integer dtype)."""
    axis = axis % a.ndim
    shape = list(a.shape)
    shape[axis] //= 2
    shape.insert(axis + 1, 2)
    pairs = a.astype(jnp.uint32).reshape(shape)
    lo = jnp.take(pairs, 0, axis=axis + 1)
    hi = jnp.take(pairs, 1, axis=axis + 1)
    return lo | (hi << 8)


def to_lane8(a: jnp.ndarray) -> jnp.ndarray:
    """(..., N, L) uint32 16-bit-limb batch → (..., 2L, N) f32 byte lanes."""
    return jnp.swapaxes(u16_to_u8_limbs(a, axis=-1), -1, -2).astype(
        jnp.float32)


def from_lane8(a: jnp.ndarray) -> jnp.ndarray:
    """(..., 2L, N) f32 byte lanes → (..., N, L) uint32 16-bit limbs."""
    return u8_to_u16_limbs(
        jnp.swapaxes(a, -1, -2).astype(jnp.uint32), axis=-1)


def pts_to_lane8(p: jnp.ndarray) -> jnp.ndarray:
    """(N, 3, L) uint32 points → (3, 2L, N) f32 byte-lane points."""
    return jnp.transpose(u16_to_u8_limbs(p, axis=-1), (1, 2, 0)).astype(
        jnp.float32)


def pts_from_lane8(p: jnp.ndarray) -> jnp.ndarray:
    """(3, 2L, N) f32 byte-lane points → (N, 3, L) uint32."""
    return u8_to_u16_limbs(
        jnp.transpose(p, (2, 0, 1)).astype(jnp.uint32), axis=-1)


def mm_dtype():
    """Input dtype for the exact small-integer matmuls: bf16 on TPU (native
    MXU mode, exact for integers ≤ 256 with f32 accumulation), f32 on CPU
    (XLA:CPU's DotThunk has no bf16×bf16→f32 kernel; f32 is equally exact
    at these magnitudes)."""
    return (jnp.bfloat16 if jax.default_backend() not in ("cpu",)
            else jnp.float32)


def _int_to_bytes(v: int, n: int) -> np.ndarray:
    return np.frombuffer(v.to_bytes(n, "little"), dtype=np.uint8)


def _toeplitz(limbs: np.ndarray, out_cols: int) -> np.ndarray:
    """(out_cols, L8) matrix M with M[k, j] = limbs[k - j] (0 outside):
    M @ x == column sums of the limb product limbs·x, truncated to
    out_cols columns."""
    L8 = limbs.shape[0]
    M = np.zeros((out_cols, L8), dtype=np.float32)
    for k in range(out_cols):
        j0 = max(0, k - (L8 - 1))
        j1 = min(L8 - 1, k) + 1
        for j in range(j0, j1):
            M[k, j] = float(limbs[k - j])
    return M


class ByteLaneField:
    """Batched ops on (..., L8, N) f32 byte-limb arrays (Montgomery form).

    Mirrors ``ops.lane.LaneField`` at radix 2^8. All ops are branchless and
    jit/vmap-clean; every intermediate is an exact integer < 2^24 in f32.
    """

    #: constants a kernel must inject (ops/pallas_g1.py passes these as
    #: pallas_call inputs — Pallas forbids captured array constants)
    CONST_NAMES = ("p_col", "one_col", "nprime_mat", "p_mat",
                   "b3_col")

    def __init__(self, base: PrimeField):
        self.base = base
        self.L8 = 2 * base.L
        self.p = base.p
        nbytes = self.L8
        # Constants are built as NUMPY and materialized to device arrays on
        # FIRST USE (__getattr__): module-level singletons (BFQ/BFR/ZFQ)
        # must not initialize the XLA backend at import time, or
        # jax.distributed.initialize() in parallel/launch.py can never run
        # first (caught by tests/test_multiprocess.py).
        self._np = {}
        # constants as (L8, 1) f32 columns — broadcast along lanes
        self._np["p_col"] = (_int_to_bytes(base.p, nbytes).astype(
            np.float32).reshape(nbytes, 1), jnp.float32)
        one_mont_int = base.mont_r % base.p
        self._np["one_col"] = (_int_to_bytes(one_mont_int, nbytes).astype(
            np.float32).reshape(nbytes, 1), jnp.float32)
        # n' = -p^{-1} mod R, R = 2^(8·L8) — same integer as the radix-2^16
        # engine's nprime, re-limbed to bytes
        R = 1 << (8 * nbytes)
        nprime = (-pow(base.p, -1, R)) % R
        np_bytes = _int_to_bytes(nprime, nbytes)
        p_bytes = _int_to_bytes(base.p, nbytes)
        # MXU matrices (bf16-exact: all entries ≤ 255):
        #   m = lo(T)·n' mod R   → lower-triangular Toeplitz (L8, L8)
        #   U = m·p (full)       → Toeplitz (2·L8, L8)
        self._np["nprime_mat"] = (_toeplitz(np_bytes, nbytes), jnp.bfloat16)
        self._np["p_mat"] = (_toeplitz(p_bytes, 2 * nbytes), jnp.bfloat16)
        # 3·b = 12 for BLS12-381 G1 (b = 4), Montgomery form — only
        # meaningful for Fq, but kept per-field so kernel const injection
        # is uniform
        self._np["b3_col"] = (
            _int_to_bytes(12 * base.mont_r % base.p, nbytes).astype(
                np.float32).reshape(nbytes, 1), jnp.float32)

    def __getattr__(self, name):
        # deferred device materialization of the numpy constants; after the
        # first access the jnp array is a plain instance attribute (so
        # kernel_view's setattr of kernel-loaded refs keeps working)
        np_map = self.__dict__.get("_np")
        if np_map and name in np_map:
            arr, dtype = np_map[name]
            # concrete even if first touched under a jit/shard_map trace —
            # otherwise the cached value would be an escaped tracer
            with jax.ensure_compile_time_eval():
                val = jnp.asarray(arr, dtype=dtype)
            setattr(self, name, val)
            return val
        raise AttributeError(name)

    def const_args(self):
        """The constant arrays a Pallas kernel needs, in CONST_NAMES order."""
        return tuple(getattr(self, n) for n in self.CONST_NAMES)

    def kernel_view(self, *consts):
        """A shallow copy whose constants are the given (kernel-loaded)
        values — lets the same op code run inside a pallas_call body."""
        import copy
        view = copy.copy(self)
        for name, val in zip(self.CONST_NAMES, consts):
            setattr(view, name, val)
        return view

    # -- shape helpers -------------------------------------------------------

    def zeros(self, shape):
        """shape = batch dims + (N,): returns (..., L8, N) f32 zeros."""
        s = tuple(shape)
        return jnp.zeros(s[:-1] + (self.L8,) + s[-1:], dtype=jnp.float32)

    def ones(self, shape):
        s = tuple(shape)
        one = self.one_col
        return jnp.broadcast_to(one, s[:-1] + (self.L8,) + s[-1:])

    # -- carry machinery (limb axis = -2, f32 digits) ------------------------

    @staticmethod
    def _row(x, i: int):
        """x[..., i, :] via a static lax slice — jnp's integer indexing
        lowers to dynamic_slice, which Mosaic (Pallas TPU) cannot lower;
        this form works both in XLA graphs and inside kernels."""
        n = x.shape[-2]
        i = i % n
        return jax.lax.slice_in_dim(x, i, i + 1, axis=-2).squeeze(-2)

    @staticmethod
    def _shift_up(x, d: int):
        """Shift limbs (axis -2) toward higher significance by d."""
        pad = [(0, 0)] * (x.ndim - 2) + [(d, 0), (0, 0)]
        return jnp.pad(x, pad)[..., : x.shape[-2], :]

    @staticmethod
    def _split256(t):
        """t (exact ints < 2^24) → (t mod 256, t div 256), both exact f32."""
        hi = jnp.floor(t * (1.0 / 256.0))
        return t - hi * 256.0, hi

    def _norm(self, t, passes: int):
        """Carry-relax: after each pass, digit_i ≤ 255 + carry_in where
        carry_in shrinks geometrically (bounds in mont_mul's comments)."""
        for _ in range(passes):
            lo, hi = self._split256(t)
            t = lo + self._shift_up(hi, 1)
        return t

    def _ks_carry(self, digits):
        """Exact carry propagation for integer digits ≤ 256 →
        (limbs ≤ 255, carry_out ∈ {0,1}).

        Kogge-Stone generate/propagate kept entirely in f32 arithmetic
        (OR = max, AND = product, comparisons as exact floor tricks) —
        Mosaic rejects i1 vector pads/casts ("invalid vector register
        cast"), and these digits are exact small integers anyway."""
        g = jnp.floor(digits * (1.0 / 256.0))              # digit ≥ 256
        p = jnp.floor((digits + 1.0) * (1.0 / 256.0)) - g  # digit == 255
        n = digits.shape[-2]
        d = 1
        while d < n:
            g = jnp.maximum(g, p * self._shift_up(g, d))
            p = p * self._shift_up(p, d)
            d <<= 1
        carry_in = self._shift_up(g, 1)
        res = digits + carry_in
        res = res - 256.0 * jnp.floor(res * (1.0 / 256.0))
        return res, self._row(g, -1)

    def _ks_borrow(self, a, b):
        """(a - b) mod 2^(8·L8) limbwise + borrow-out ∈ {0,1} — canonical
        digit inputs (≤ 255), all-f32 (see _ks_carry)."""
        g = jnp.floor((b - a + 255.0) * (1.0 / 256.0))     # a < b
        gt = jnp.floor((a - b + 255.0) * (1.0 / 256.0))    # a > b
        p = 1.0 - g - gt                                   # a == b
        n = a.shape[-2]
        d = 1
        while d < n:
            g = jnp.maximum(g, p * self._shift_up(g, d))
            p = p * self._shift_up(p, d)
            d <<= 1
        borrow_in = self._shift_up(g, 1)
        raw = a - b - borrow_in                            # ∈ [-256, 255]
        neg = jnp.floor((255.0 - raw) * (1.0 / 256.0))     # raw < 0
        diff = raw + 256.0 * neg
        return diff, self._row(g, -1)

    def _sub_p_if_ge(self, v, extra=None):
        """v (canonical digits) minus p when v ≥ p (or when ``extra`` ∈
        {0,1} f32, the dropped 2^(8·L8) carry, says v overflowed)."""
        p_vec = self.p_col
        diff, borrow = self._ks_borrow(v, jnp.broadcast_to(p_vec, v.shape))
        use = 1.0 - borrow if extra is None else jnp.maximum(
            extra, 1.0 - borrow)
        u = use[..., None, :]
        return diff * u + v * (1.0 - u)

    # -- add/sub -------------------------------------------------------------

    def add(self, a, b):
        s = a + b                              # digits ≤ 510
        lo, hi = self._split256(s)
        extra0 = self._row(hi, -1)             # carry out of the top limb
        s = lo + self._shift_up(hi, 1)         # digits ≤ 256
        res, cout = self._ks_carry(s)
        return self._sub_p_if_ge(res, extra=jnp.maximum(extra0, cout))

    def sub(self, a, b):
        d, borrow = self._ks_borrow(a, b)
        s = d + self.p_col
        lo, hi = self._split256(s)
        s = lo + self._shift_up(hi, 1)
        dp, _ = self._ks_carry(s)
        bb = borrow[..., None, :]
        return dp * bb + d * (1.0 - bb)

    def neg(self, a):
        return self.sub(jnp.zeros_like(a), a)

    # -- multiply ------------------------------------------------------------

    @staticmethod
    def _skew_sum(rows, out_cols: int):
        """Σ_i shift(rows[..., i, :, :], i) over limb columns.

        rows: (..., n, m, N) f32 — n product rows of m limb columns each.
        Returns (..., out_cols, N). Row i lands at column offset i via the
        pad/flatten/truncate/reshape trick on leading-of-lane axes (layout
        free on TPU)."""
        n, m = rows.shape[-3], rows.shape[-2]
        W = out_cols
        assert n - 1 + m - 1 < W, "skew would spill"
        pad = [(0, 0)] * (rows.ndim - 3) + [(0, 0), (0, W + 1 - m), (0, 0)]
        padded = jnp.pad(rows, pad)
        nn = rows.shape[-1]
        flat = padded.reshape(padded.shape[:-3] + (n * (W + 1), nn))
        flat = flat[..., : n * W, :]
        return jnp.sum(flat.reshape(flat.shape[:-2] + (n, W, nn)), axis=-3)

    def _mul_columns_skew(self, a, b):
        """Column sums of the limb product a·b — one f32 skew-sum, exact
        (products ≤ 255² and column sums ≤ L8·255² ≈ 3.12e6 < 2^24)."""
        prods = a[..., :, None, :] * b[..., None, :, :]  # (..., L8, L8, N)
        return self._skew_sum(prods, 2 * self.L8)

    #: f32 sublane tile — outer shifts in the grouped schoolbook are
    #: multiples of this, which Mosaic lays out without cross-tile shuffles
    _SUBLANE = 8

    def _mul_columns(self, a, b):
        if _SCHOOLBOOK == "skew":            # A/B knob, scratch/tpu_lmul.py
            return self._mul_columns_skew(a, b)
        return self._mul_columns_grouped(a, b)

    def _mul_columns_grouped(self, a, b):
        """Column sums of the limb product a·b — aligned-group shift-FMA.

        Write the limb index i = 8·j + r.  Then
            T = Σ_j shift_up( Σ_r shift_up(b, r) · a_{8j+r},  8·j )
        The r-shifts build 8 pre-shifted copies of b ONCE (not per limb),
        and every outer shift is a multiple of the f32 sublane tile. This
        replaces the skew-sum's (L8, 2·L8+1, N) pad/flatten/re-split
        intermediate — the single hottest part of the lmul kernel (~60 %
        of its time, PROFILE.md r5) and its dominant VMEM transient
        (~9.9 MB at TILE=512) — with (L8+7, N)-sized terms.  Exactness:
        products ≤ 256², group sums ≤ 8·256² ≈ 5.2e5, total columns
        ≤ L8·256² ≈ 3.2e6 < 2^24, all exact in f32."""
        G = self._SUBLANE
        L = self.L8
        W = 2 * L
        a, b = jnp.broadcast_arrays(a, b)
        pad = [(0, 0)] * (b.ndim - 2) + [(0, G - 1), (0, 0)]
        bw = jnp.pad(b, pad)                             # (..., L8+7, N)
        brs = [bw if r == 0 else self._shift_up(bw, r) for r in range(G)]
        out = None
        for j in range((L + G - 1) // G):
            g = None
            for r in range(G):
                i = G * j + r
                if i >= L:
                    break
                ai = jax.lax.slice_in_dim(a, i, i + 1, axis=-2)  # (..,1,N)
                term = brs[r] * ai
                g = term if g is None else g + term
            keep = min(L + G - 1, W - G * j)             # clip final group
            g = jax.lax.slice_in_dim(g, 0, keep, axis=-2)
            gpad = [(0, 0)] * (g.ndim - 2) + [(G * j, W - keep - G * j),
                                              (0, 0)]
            gp = jnp.pad(g, gpad)
            out = gp if out is None else out + gp
        return out

    def _const_mul(self, mat, x):
        """MXU contraction Σ_j mat[k, j]·x[..., j, :] with bf16-exact
        inputs (digits ≤ 256 = 2^8 exact in bf16) and f32 accumulation
        (sums ≤ L8·256·255 < 2^24): bit-exact by construction."""
        d = mm_dtype()
        return jnp.einsum("kj,...jn->...kn", mat.astype(d), x.astype(d),
                          preferred_element_type=jnp.float32)

    def mont_mul(self, a, b):
        """Montgomery product a·b·R^{-1} mod p (separated SOS, radix 2^8).

        Exactness budget (f32 holds integers ≤ 2^24 exactly):
          T cols ≤ 48·255² ≈ 3.12e6           (skew-sum, f32 FMA)
          lo(T) after 3 norm passes ≤ 256      (bf16-exact for the MXU)
          m cols ≤ 48·256·255 ≈ 3.13e6 → 3 passes → ≤ 256
          U = m·p cols ≤ 3.13e6;  S = T + U ≤ 6.3e6 < 2^24
        Final: 3 norm passes + exact Kogge-Stone carry, take limbs
        [L8:2·L8] (the /R shift), conditional subtract. Result bound:
        m < R(1 + 1/255) ⇒ S/R < p·(p/R + 1 + 1/255) ≈ 1.11·p < 2p,
        so ONE conditional subtraction is enough (p/R ≈ 0.102 for Fq)."""
        L8 = self.L8
        a, b = jnp.broadcast_arrays(a, b)
        T = self._mul_columns(a, b)                       # (..., 2·L8, N)
        Tlo = self._norm(T[..., :L8, :], 3)               # digits ≤ 256
        m = self._norm(self._const_mul(self.nprime_mat, Tlo), 3)
        U = self._const_mul(self.p_mat, m)                # (..., 2·L8, N)
        S = T + U
        pad = [(0, 0)] * (S.ndim - 2) + [(0, 1), (0, 0)]
        S = jnp.pad(S, pad)
        S = self._norm(S, 3)
        S, _ = self._ks_carry(S)
        return self._sub_p_if_ge(
            jax.lax.slice_in_dim(S, L8, 2 * L8, axis=-2),
            extra=self._row(S, 2 * L8))

    def sqr(self, a):
        return self.mont_mul(a, a)

    def mul_const(self, a, c_limbs8: np.ndarray):
        """Multiply by a host constant given as (L8,) byte limbs
        (Montgomery form) — rides the variable-product path."""
        c = jnp.asarray(np.asarray(c_limbs8, dtype=np.float32)
                        .reshape(self.L8, 1))
        return self.mont_mul(a, jnp.broadcast_to(c, a.shape))

    # -- misc ----------------------------------------------------------------

    def select(self, cond, a, b):
        """cond ? a : b; cond bool shaped like the batch dims + (N,)."""
        return jnp.where(cond[..., None, :], a, b)

    def is_zero(self, a):
        return jnp.sum(a, axis=-2) == 0.0


BFQ = ByteLaneField(FQ)
BFR = ByteLaneField(FR)


def g18_infinity(shape=(), F=None) -> jnp.ndarray:
    """(0:1:0) broadcast to batch shape + (N,) lanes → (..., 3, L8, N).

    ``shape`` = batch dims + (N,); shape=() means a single point (N=1)."""
    F = BFQ if F is None else F
    s = tuple(shape) if shape else (1,)
    x = F.zeros(s)
    y = F.ones(s)
    return jnp.stack([x, y, x], axis=-3)


def g18_unpack(p):
    return p[..., 0, :, :], p[..., 1, :, :], p[..., 2, :, :]


def g18_pack(x, y, z):
    return jnp.stack([x, y, z], axis=-3)


def _stk(*xs):
    return jnp.stack(xs, axis=0)


def g18_add(p, q, F=None):
    """Complete projective addition, byte-lane layout (RCB15 Algorithm 7,
    a=0, b3=12; same layer-batched structure as ops.curve.g1_add — the
    formula source for all three engines). ``F`` lets Pallas kernels pass
    a kernel_view of BFQ (injected constants)."""
    F = BFQ if F is None else F
    p, q = jnp.broadcast_arrays(p, q)
    X1, Y1, Z1 = g18_unpack(p)
    X2, Y2, Z2 = g18_unpack(q)
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
    return g18_pack(X3, Y3, Z3)


def g18_double(p, F=None):
    """Complete projective doubling, byte-lane layout (RCB15 Algorithm 9)."""
    F = BFQ if F is None else F
    X, Y, Z = g18_unpack(p)
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
    return g18_pack(X3, Y3, z3)


def g18_neg(p, F=None):
    F = BFQ if F is None else F
    X, Y, Z = g18_unpack(p)
    return g18_pack(X, F.neg(Y), Z)


def g18_select(cond, p, q):
    """cond ? p : q — cond bool shaped like the points' batch dims + (N,)."""
    return jnp.where(cond[..., None, None, :], p, q)


def g18_sum(points):
    """Reduce (..., 3, L8, N) over the lane axis to (..., 3, L8, 1).

    Halving tree over lanes: 2N point-add work, log2(N) sequential levels.
    N must be a power of two."""
    n = points.shape[-1]
    assert n & (n - 1) == 0
    while n > 1:
        half = n // 2
        points = g18_add(points[..., :half], points[..., half:])
        n = half
    return points


# -- sequential (unstacked) point formulas for Pallas kernels ----------------
#
# The layer-batched versions above stack operands into (6, L8, N) so XLA
# compiles 3 mont_mul instances instead of 14 — right for XLA graphs, wrong
# inside a Pallas kernel: the stacked schoolbook product materializes a
# (6, L8, L8, TILE) f32 intermediate (~28 MB at TILE=512) that blows VMEM
# and the Mosaic compile with it (r4: remote compile helper SIGKILL). These
# run the SAME formulas one (L8, N) mul at a time — each intermediate is the
# proven-compilable 2D shape. Bit-exact vs the stacked versions by
# construction (identical ops in identical order, just unstacked); pinned in
# tests/test_lane8.py.


def g18_add_seq(p, q, F=None):
    """Complete RCB15 add (Algorithm 7, a=0, b3=12), sequential muls."""
    F = BFQ if F is None else F
    X1, Y1, Z1 = g18_unpack(p)
    X2, Y2, Z2 = g18_unpack(q)
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
    return g18_pack(X3, Y3, Z3)


def g18_double_seq(p, F=None):
    """Complete RCB15 doubling (Algorithm 9, a=0), sequential muls."""
    F = BFQ if F is None else F
    X, Y, Z = g18_unpack(p)
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
    return g18_pack(X3, Y3, Z3)
