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

    def _carry_limbs(self, limbs):
        """Propagate carries so every limb < 2^16 (input limbs < 2^32-ish)."""
        out = []
        carry = jnp.zeros_like(limbs[0])
        for k in range(len(limbs)):
            t = limbs[k] + carry
            out.append(t & LIMB_MASK)
            carry = t >> LIMB_BITS
        return out, carry

    def _sub_p_if_ge(self, limbs, extra=None):
        """Given value v (< 2p, as L normalized limbs + optional carry bit),
        return v - p if v >= p else v. Branchless."""
        p = self._const(self.p_limbs)
        borrow = jnp.zeros_like(limbs[0])
        diff = []
        for k in range(self.L):
            t = limbs[k] - p[k] - borrow
            diff.append(t & LIMB_MASK)
            borrow = (t >> LIMB_BITS) & 1
        if extra is not None:
            # value had a 2^(16L) bit: v - p surely >= 0 iff extra==1 or no borrow
            use_diff = (extra | (1 - borrow)).astype(jnp.uint32)
        else:
            use_diff = (1 - borrow).astype(jnp.uint32)
        mask = use_diff * jnp.uint32(0xFFFFFFFF)
        return [(d & mask) | (l & ~mask) for d, l in zip(diff, limbs)]

    @jit_method()
    def add(self, a, b):
        al, bl = self._unpack(a), self._unpack(b)
        s = [x + y for x, y in zip(al, bl)]
        s, carry = self._carry_limbs(s)
        return self._pack(self._sub_p_if_ge(s, extra=carry))

    @jit_method()
    def sub(self, a, b):
        """a - b mod p, computed as (a + p - b) with a biased carry chain.

        Each limb step computes t = a_k + p_k - b_k + c + 2^16 (the +2^16 bias
        keeps t nonnegative in uint32 even when c = -1); the true carry is
        (t >> 16) - 1, representable in wrapping uint32 arithmetic.
        """
        al, bl = self._unpack(a), self._unpack(b)
        p = self._const(self.p_limbs)
        bias = jnp.uint32(1 << LIMB_BITS)
        c = jnp.zeros_like(al[0])
        res = []
        for k in range(self.L):
            t = al[k] + p[k] + c - bl[k] + bias
            res.append(t & LIMB_MASK)
            c = (t >> LIMB_BITS) - jnp.uint32(1)  # in {-1,0,1}, wraps for -1
        # a,b < p ⇒ a - b + p ∈ (0, 2p) ⇒ final carry c ∈ {0, 1}
        extra = c & jnp.uint32(1)
        return self._pack(self._sub_p_if_ge(res, extra=extra))

    @jit_method()
    def neg(self, a):
        return self.sub(self.zero_like(a), a)

    @jit_method()
    def mont_mul(self, a, b):
        """Montgomery product a*b*R^{-1} mod p: CIOS with a shifting window.

        One fori_loop iteration per limb of ``a``: accumulate a_i * b and the
        Montgomery correction m*p into an (L+2)-limb window, then shift the
        window down one limb (the zeroed limb falls off). All slices are
        static, so the jaxpr is tiny and compiles fast; all arithmetic is
        vectorized over the batch dims. Column values stay < 4L·2^16 ≪ 2^32.
        """
        L = self.L
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        a = jnp.broadcast_to(a, shape)
        b = jnp.broadcast_to(b, shape)
        p_vec = jnp.asarray(self.p_limbs, dtype=jnp.uint32)
        n0 = jnp.uint32(self.n0inv)
        mask = jnp.uint32(LIMB_MASK)
        t0 = jnp.zeros(shape[:-1] + (L + 2,), dtype=jnp.uint32)

        def body(i, t):
            ai = jax.lax.dynamic_slice_in_dim(a, i, 1, axis=-1)  # (..., 1)
            prod = ai * b
            t = t.at[..., 0:L].add(prod & mask)
            t = t.at[..., 1:L + 1].add(prod >> LIMB_BITS)
            m = (t[..., 0:1] * n0) & mask
            prod2 = m * p_vec
            t = t.at[..., 0:L].add(prod2 & mask)
            t = t.at[..., 1:L + 1].add(prod2 >> LIMB_BITS)
            t = t.at[..., 1].add(t[..., 0] >> LIMB_BITS)  # t[0] ≡ 0 mod 2^16
            return jnp.concatenate(
                [t[..., 1:], jnp.zeros_like(t[..., :1])], axis=-1)

        t = jax.lax.fori_loop(0, L, body, t0, unroll=2)
        limbs = [t[..., k] for k in range(L + 2)]
        limbs, carry = self._carry_limbs(limbs)
        # result < 2p: after normalization limbs[L] is the single overflow bit
        extra = limbs[L]
        return self._pack(self._sub_p_if_ge(limbs[:L], extra=extra))

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
