"""Batched prime-field arithmetic for TPU in JAX.

Design: field elements are ``(..., L)`` uint32 arrays holding L little-endian
16-bit limbs (Fr: L=16 → 256 bits, Fq: L=24 → 384 bits), kept in Montgomery
form (R = 2^(16·L)). 16-bit limbs are the sweet spot for TPU: limb products
(< 2^32) are exact in native uint32 vector lanes, and column accumulations of
lo/hi halves stay far below 2^32, so no 64-bit arithmetic is ever needed —
TPUs have none. All control flow is branchless (select-based), so everything
jits and vmaps cleanly.

This replaces the field stack of the reference's external Rust `fourier`
prover (reference: requirements.txt:3, base/miner.py:74-84) with an idiomatic
TPU formulation; correctness is pinned against the bigint oracle
(zkp_subnet_tpu.utils.oracle) bit-exactly.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1

__all__ = ["PrimeField", "FR", "FQ"]


def _int_to_limbs(x: int, n_limbs: int) -> np.ndarray:
    return np.array([(x >> (LIMB_BITS * k)) & LIMB_MASK for k in range(n_limbs)],
                    dtype=np.uint32)


def _limbs_to_int(limbs) -> int:
    out = 0
    for k, v in enumerate(np.asarray(limbs, dtype=np.uint64).tolist()):
        out |= int(v) << (LIMB_BITS * k)
    return out


def jit_method(*static_argnums):
    """jax.jit for methods: `self` is always static (PrimeField instances are
    constant singletons), plus any extra static positions."""
    def deco(fn):
        jitted = jax.jit(fn, static_argnums=(0,) + tuple(static_argnums))
        return functools.wraps(fn)(jitted)
    return deco


class PrimeField:
    """Precomputed constants + batched ops for one prime field."""

    def __init__(self, modulus: int, n_limbs: int, name: str):
        self.p = modulus
        self.L = n_limbs
        self.name = name
        self.bits = modulus.bit_length()
        R = 1 << (LIMB_BITS * n_limbs)
        assert R > modulus
        self.mont_r = R % modulus
        self.mont_r2 = (R * R) % modulus
        # -p^{-1} mod 2^16
        self.n0inv = (-pow(modulus, -1, 1 << LIMB_BITS)) & LIMB_MASK
        # N' = -p^{-1} mod R (for separated Montgomery reduction)
        self.nprime_limbs = _int_to_limbs((-pow(modulus, -1, R)) % R, n_limbs)
        self.p_limbs = _int_to_limbs(modulus, n_limbs)
        self.r2_limbs = _int_to_limbs(self.mont_r2, n_limbs)
        self.one_mont = _int_to_limbs(self.mont_r, n_limbs)
        self.zero_limbs = np.zeros(n_limbs, dtype=np.uint32)

    # -- host-side conversions ------------------------------------------------

    def to_limbs(self, x: int) -> np.ndarray:
        """Canonical int → limb vector (NOT Montgomery form)."""
        return _int_to_limbs(x % self.p, self.L)

    def from_limbs(self, limbs) -> int:
        return _limbs_to_int(limbs)

    def encode(self, xs: Sequence[int]) -> jnp.ndarray:
        """Host ints → device array in Montgomery form, shape (len(xs), L)."""
        arr = np.stack([_int_to_limbs(x % self.p * self.mont_r % self.p, self.L)
                        for x in xs])
        return jnp.asarray(arr, dtype=jnp.uint32)

    def decode(self, arr) -> List[int]:
        """Device array in Montgomery form → host ints."""
        host = np.asarray(jax.device_get(self.from_mont(arr)), dtype=np.uint64)
        flat = host.reshape(-1, self.L)
        return [_limbs_to_int(row) for row in flat]

    def encode_vec(self, xs: Sequence[int]) -> jnp.ndarray:
        """Vectorized host ints → Montgomery device array (fast path for
        large polynomials: byte-packing on host, to_mont on device)."""
        nbytes = self.L * 2
        raw = b"".join(int(x % self.p).to_bytes(nbytes, "little") for x in xs)
        limbs = np.frombuffer(raw, dtype="<u2").reshape(len(xs), self.L)
        return self.to_mont(jnp.asarray(limbs.astype(np.uint32)))

    def decode_vec(self, arr) -> List[int]:
        """Vectorized Montgomery device array → host ints."""
        host = np.asarray(jax.device_get(self.from_mont(arr)),
                          dtype=np.uint32).reshape(-1, self.L)
        raw = host.astype("<u2").tobytes()
        nbytes = self.L * 2
        return [int.from_bytes(raw[i * nbytes:(i + 1) * nbytes], "little")
                for i in range(host.shape[0])]

    # -- limb helpers ---------------------------------------------------------

    def _unpack(self, a):
        return [a[..., k] for k in range(self.L)]

    def _pack(self, limbs):
        return jnp.stack(limbs, axis=-1)

    def _const(self, np_limbs):
        return [jnp.uint32(int(v)) for v in np_limbs]

    # -- core ops (all on (..., L) uint32 arrays, Montgomery form) ------------

    def zero_like(self, a):
        return jnp.zeros_like(a)

    def zeros(self, shape):
        return jnp.zeros(tuple(shape) + (self.L,), dtype=jnp.uint32)

    def ones(self, shape):
        """Montgomery ONE broadcast to shape."""
        one = jnp.asarray(self.one_mont, dtype=jnp.uint32)
        return jnp.broadcast_to(one, tuple(shape) + (self.L,))

    # -- carry/borrow propagation: log-depth Kogge-Stone scans ----------------
    # Long sequential per-limb chains make XLA's CPU pipeline pathologically
    # slow to compile (and serialize the VPU); all carry handling below is
    # log2(L)-depth with whole-vector ops only.

    @staticmethod
    def _shift_up(x, d: int):
        """Shift limbs toward higher significance by d (zeros shifted in)."""
        lead = [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, lead + [(d, 0)])[..., :x.shape[-1]]

    def _ks_carry(self, digits):
        """Exact carry propagation for digits ≤ 2^16 (i.e. ≤ MASK+1).

        Returns (limbs < 2^16, carry_out ∈ {0,1}). Kogge-Stone on
        (generate, propagate) bits, log2(n) rounds of vector ops.
        """
        n = digits.shape[-1]
        g = digits >> LIMB_BITS               # 1 iff digit == 2^16
        p = (digits == LIMB_MASK).astype(jnp.uint32)
        d = 1
        while d < n:
            g = g | (p & self._shift_up(g, d))
            p = p & self._shift_up(p, d)
            d <<= 1
        carry_in = self._shift_up(g, 1)
        res = (digits + carry_in) & LIMB_MASK
        return res, g[..., -1]

    def _ks_borrow(self, a, b):
        """a - b limbwise with borrow scan; a, b limbs < 2^16.

        Returns (diff limbs, borrow_out ∈ {0,1})."""
        g = (a < b).astype(jnp.uint32)
        p = (a == b).astype(jnp.uint32)
        n = a.shape[-1]
        d = 1
        while d < n:
            g = g | (p & self._shift_up(g, d))
            p = p & self._shift_up(p, d)
            d <<= 1
        borrow_in = self._shift_up(g, 1)
        diff = (a - b - borrow_in) & LIMB_MASK
        return diff, g[..., -1]

    def _sub_p_if_ge(self, v, extra=None):
        """v - p if v ≥ p else v, branchless. v: (..., L) exact limbs; extra
        is the optional 2^(16L) bit of v (v < 2p overall)."""
        p_vec = jnp.asarray(self.p_limbs, dtype=jnp.uint32)
        diff, borrow = self._ks_borrow(v, p_vec)
        if extra is not None:
            use_diff = (extra | (1 - borrow)).astype(jnp.uint32)
        else:
            use_diff = (1 - borrow).astype(jnp.uint32)
        mask = use_diff[..., None] * jnp.uint32(0xFFFFFFFF)
        return (diff & mask) | (v & ~mask)

    @jit_method()
    def add(self, a, b):
        s = a + b                                # digits ≤ 2·MASK
        lo = s & LIMB_MASK
        hi = s >> LIMB_BITS
        extra0 = hi[..., -1]
        s = lo + self._shift_up(hi, 1)           # digits ≤ 2^16
        res, cout = self._ks_carry(s)
        return self._sub_p_if_ge(res, extra=extra0 | cout)

    @jit_method()
    def sub(self, a, b):
        d, borrow = self._ks_borrow(a, b)        # a - b (+2^(16L) if borrow)
        # on borrow: result = d + p (the implicit 2^(16L) and p's complement
        # cancel: (a - b + 2^(16L)) + p ≡ a - b + p mod 2^(16L))
        p_vec = jnp.asarray(self.p_limbs, dtype=jnp.uint32)
        s = d + p_vec
        lo = s & LIMB_MASK
        s = lo + self._shift_up(s >> LIMB_BITS, 1)
        dp, _ = self._ks_carry(s)
        mask = borrow.astype(jnp.uint32)[..., None] * jnp.uint32(0xFFFFFFFF)
        return (dp & mask) | (d & ~mask)

    @jit_method()
    def neg(self, a):
        return self.sub(self.zero_like(a), a)

    @staticmethod
    def _skew_sum(rows, shift0: int, out_cols: int):
        """Σ_i shift_right(rows[..., i, :], i + shift0), truncated to out_cols.

        The shift-by-row-index layout is produced with zero gathers/scatters:
        pad each row to width out_cols+1, flatten, truncate, reshape — row i
        then starts at column i (the classic skew trick) — and reduce.
        Requires shift0 + n + m - 1 ≤ out_cols (no spill into the next row).
        """
        n, m = rows.shape[-2], rows.shape[-1]
        W = out_cols
        assert shift0 + n - 1 + m - 1 < W, "skew would spill"
        lead = [(0, 0)] * (rows.ndim - 2)
        padded = jnp.pad(rows, lead + [(0, 0), (shift0, W + 1 - m - shift0)])
        flat = padded.reshape(padded.shape[:-2] + (n * (W + 1),))[..., :n * W]
        return jnp.sum(flat.reshape(flat.shape[:-1] + (n, W)), axis=-2)

    def _mul_columns(self, a, b, out_cols: int):
        """Unnormalized column sums of the limb product a·b.

        a, b: (..., L') uint32 with limbs ≲ 2^16 (a hair over is fine).
        Returns (..., out_cols) uint32 with column k = Σ_{i+j=k} a_i·b_j,
        accumulated as lo/hi 16-bit halves; every column < 4L·2^16 ≪ 2^32.
        Fully loop-free (outer product + two skew reductions) so the jaxpr
        stays tiny — XLA compile time, not FLOPs, was the limiting factor for
        rolled/scatter formulations of bigint multiply.
        """
        prods = a[..., :, None] * b[..., None, :]      # (..., La, Lb) exact
        lo = prods & jnp.uint32(LIMB_MASK)
        hi = prods >> LIMB_BITS
        return (self._skew_sum(lo, 0, out_cols) +
                self._skew_sum(hi, 1, out_cols))

    def _norm2(self, t):
        """Two vectorized carry passes: limbs < 2^23 → limbs ≤ 2^16.

        Not an exact normalization (a limb may still be 2^16), but the result
        is safe as a multiplicand: products stay < 2^32. The top limb's carry
        is dropped (callers either pad or rely on mod-2^(16L) semantics).
        """
        for _ in range(2):
            t = (t & LIMB_MASK) + self._shift_up(t >> LIMB_BITS, 1)
        return t

    @jit_method()
    def mont_mul(self, a, b):
        """Montgomery product a*b*R^{-1} mod p, separated SOS form.

        1. T = a·b as 2L columns (outer product + shifted adds).
        2. m = T·N' mod R with N' = -p^{-1} mod R (low-half product).
        3. result = (T + m·p) / R — exact division; low limbs vanish.
        All steps are loop-free; only the final exact carry chain is a short
        static unroll. Result < 2p → one conditional subtract.
        """
        L = self.L
        p_vec = jnp.asarray(self.p_limbs, dtype=jnp.uint32)
        np_vec = jnp.asarray(self.nprime_limbs, dtype=jnp.uint32)

        T = self._mul_columns(a, b, 2 * L)             # ~2^22 per column
        Tn = self._norm2(T)                            # limbs ≤ 2^16
        m = self._norm2(
            self._mul_columns(Tn[..., :L], np_vec, 2 * L)[..., :L])
        U = self._mul_columns(m, p_vec, 2 * L)
        S = Tn + U                                     # columns < 2^23

        # Exact normalize S (2L+1 limbs, padded for the top carry); the low L
        # limbs of T + m·p are ≡ 0 and vanish, the rest is the result /R.
        lead = [(0, 0)] * (S.ndim - 1)
        S = jnp.pad(S, lead + [(0, 1)])
        S = self._norm2(S)                             # digits ≤ 2^16
        S, _ = self._ks_carry(S)
        return self._sub_p_if_ge(S[..., L:2 * L], extra=S[..., 2 * L])

    @jit_method()
    def sqr(self, a):
        return self.mont_mul(a, a)

    def mul_const(self, a, c_mont: np.ndarray):
        """Multiply by a constant given as Montgomery limbs (numpy)."""
        return self.mont_mul(a, jnp.asarray(c_mont, dtype=jnp.uint32))

    @jit_method()
    def to_mont(self, a):
        return self.mul_const(a, self.r2_limbs)

    @jit_method()
    def from_mont(self, a):
        one = np.zeros(self.L, dtype=np.uint32)
        one[0] = 1
        return self.mont_mul(a, jnp.asarray(one))

    def select(self, cond, a, b):
        """cond ? a : b, with cond a (...,)-shaped bool/int array."""
        c = cond.astype(jnp.uint32)[..., None]
        mask = c * jnp.uint32(0xFFFFFFFF)
        return (a & mask) | (b & ~mask)

    def is_zero(self, a):
        return jnp.sum(a, axis=-1) == 0

    def eq(self, a, b):
        return jnp.sum(a ^ b, axis=-1) == 0

    @jit_method(2)
    def pow_static(self, a, e: int):
        """a^e for a *static* Python-int exponent. Small jaxpr: the bits are a
        device array driven through lax.fori_loop."""
        nbits = max(e.bit_length(), 1)
        bits = jnp.asarray([(e >> i) & 1 for i in range(nbits)],
                           dtype=jnp.uint32)

        def body(i, carry):
            out, base = carry
            mult = self.mont_mul(out, base)
            out = self.select(bits[i], mult, out)
            base = self.sqr(base)
            return (out, base)

        out0 = self.ones(a.shape[:-1])
        out, _ = jax.lax.fori_loop(0, nbits, body, (out0, a))
        return out

    @jit_method()
    def inv(self, a):
        """Batched inversion via Fermat (a^(p-2)); a=0 maps to 0."""
        return self.pow_static(a, self.p - 2)

    @jit_method(2)
    def powers(self, x_mont, n: int):
        """[1, x, x^2, ..., x^(n-1)] in Montgomery form, shape (n, L).

        Log-depth: repeated doubling of the prefix block.
        """
        out = self.ones((1,))
        cur = x_mont.reshape(1, -1)  # x^(len(out))
        while out.shape[0] < n:
            nxt = self.mont_mul(out, jnp.broadcast_to(cur, out.shape))
            out = jnp.concatenate([out, nxt], axis=0)
            cur = self.mont_mul(cur, cur)
        return out[:n]


FR = PrimeField(
    0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001,
    n_limbs=16, name="fr")
FQ = PrimeField(
    0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB,
    n_limbs=24, name="fq")
