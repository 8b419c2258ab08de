"""Batched BLS12-381 G1 arithmetic for TPU.

Points are homogeneous projective (X:Y:Z) over Fq, each coordinate a
``(..., 24)`` uint32 Montgomery limb array, packed as one ``(..., 3, 24)``
array. Addition uses the Renes–Costello–Batina complete formulas
(eprint 2015/1060, Algorithm 7 for a=0 curves): a single branchless routine
that is correct for *all* input pairs — doubling, infinity, inverses —
which is exactly what TPU vectorization wants (no data-dependent control
flow, ever). Infinity is (0:1:0).

This is the TPU replacement for the reference's Rust curve backend feeding
``worker_commit``/``worker_open`` (reference: neurons/miner.py:38-54).
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .field import FQ, FR
from ..utils import oracle as o

# 3*b = 12 for BLS12-381 (b = 4), in Montgomery form
_B3_MONT = FQ.to_limbs(12 * FQ.mont_r % FQ.p)


def g1_infinity(shape=()) -> jnp.ndarray:
    """(0:1:0) broadcast to shape + (3, L)."""
    x = FQ.zeros(shape)
    y = FQ.ones(shape)
    z = FQ.zeros(shape)
    return jnp.stack([x, y, z], axis=-2)


def g1_pack(x, y, z):
    return jnp.stack([x, y, z], axis=-2)


def g1_unpack(p):
    return p[..., 0, :], p[..., 1, :], p[..., 2, :]


def g1_encode(points: Sequence) -> jnp.ndarray:
    """Host oracle points (Jacobian int tuples) → device (N, 3, L) array."""
    affs = [o.G1.to_affine(p) for p in points]
    xs, ys, zs = [], [], []
    for a in affs:
        if a is None:
            xs.append(0); ys.append(1); zs.append(0)
        else:
            xs.append(a[0]); ys.append(a[1]); zs.append(1)
    return g1_pack(FQ.encode_vec(xs), FQ.encode_vec(ys), FQ.encode_vec(zs))


def g1_decode(p) -> List:
    """Device (..., 3, L) → list of oracle Jacobian points."""
    x, y, z = g1_unpack(p)
    xs = FQ.decode_vec(x.reshape(-1, FQ.L))
    ys = FQ.decode_vec(y.reshape(-1, FQ.L))
    zs = FQ.decode_vec(z.reshape(-1, FQ.L))
    out = []
    for xi, yi, zi in zip(xs, ys, zs):
        if zi == 0:
            out.append(o.G1.infinity())
        else:
            zinv = o.fq_inv(zi)
            out.append(o.G1.from_affine((xi * zinv % o.Q, yi * zinv % o.Q)))
    return out


def g1_add(p, q):
    """Complete projective addition (RCB15 Algorithm 7, a=0, b3=12).

    14 field multiplications, no branches; valid for every input pair.
    """
    X1, Y1, Z1 = g1_unpack(p)
    X2, Y2, Z2 = g1_unpack(q)
    mul, add, sub = FQ.mont_mul, FQ.add, FQ.sub

    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    t3 = add(X1, Y1)
    t4 = add(X2, Y2)
    t3 = mul(t3, t4)
    t4 = add(t0, t1)
    t3 = sub(t3, t4)          # X1Y2 + X2Y1
    t4 = add(Y1, Z1)
    X3 = add(Y2, Z2)
    t4 = mul(t4, X3)
    X3 = add(t1, t2)
    t4 = sub(t4, X3)          # Y1Z2 + Y2Z1
    X3 = add(X1, Z1)
    Y3 = add(X2, Z2)
    X3 = mul(X3, Y3)
    Y3 = add(t0, t2)
    Y3 = sub(X3, Y3)          # X1Z2 + X2Z1
    X3 = add(t0, t0)
    t0 = add(X3, t0)          # 3 X1X2
    t2 = FQ.mul_const(t2, _B3_MONT)   # 3b Z1Z2
    Z3 = add(t1, t2)
    t1 = sub(t1, t2)
    Y3 = FQ.mul_const(Y3, _B3_MONT)   # 3b (X1Z2 + X2Z1)
    X3 = mul(t4, Y3)
    t2 = mul(t3, t1)
    X3 = sub(t2, X3)
    Y3 = mul(Y3, t0)
    t1 = mul(t1, Z3)
    Y3 = add(t1, Y3)
    t0 = mul(t0, t3)
    Z3 = mul(Z3, t4)
    Z3 = add(Z3, t0)
    return g1_pack(X3, Y3, Z3)


def g1_double(p):
    """Complete projective doubling (RCB15 Algorithm 9, a=0, b3=12)."""
    X, Y, Z = g1_unpack(p)
    mul, add, sub = FQ.mont_mul, FQ.add, FQ.sub

    t0 = mul(Y, Y)
    Z3 = add(t0, t0)
    Z3 = add(Z3, Z3)
    Z3 = add(Z3, Z3)          # 8 Y^2
    t1 = mul(Y, Z)
    t2 = mul(Z, Z)
    t2 = FQ.mul_const(t2, _B3_MONT)   # 3b Z^2
    X3 = mul(t2, Z3)
    Y3 = add(t0, t2)
    Z3 = mul(t1, Z3)
    t1 = add(t2, t2)
    t2 = add(t1, t2)
    t0 = sub(t0, t2)
    Y3 = mul(t0, Y3)
    Y3 = add(X3, Y3)
    t1 = mul(X, Y)
    X3 = mul(t0, t1)
    X3 = add(X3, X3)
    return g1_pack(X3, Y3, Z3)


def g1_neg(p):
    X, Y, Z = g1_unpack(p)
    return g1_pack(X, FQ.neg(Y), Z)


def g1_select(cond, p, q):
    """cond ? p : q — cond shaped like the points' batch dims."""
    c = cond.astype(jnp.uint32)[..., None, None]
    mask = c * jnp.uint32(0xFFFFFFFF)
    return (p & mask) | (q & ~mask)


def g1_is_infinity(p):
    _, _, z = g1_unpack(p)
    return FQ.is_zero(z)


@jax.jit
def g1_scalar_mul(p, scalars):
    """Batched scalar multiplication: [k_i] P_i.

    p: (..., 3, L); scalars: (..., 16) canonical (non-Montgomery) Fr limbs.
    Double-and-add over 256 bits via fori_loop, MSB first.
    """
    nbits = FR.L * 16

    def body_t(i, acc):
        bit_index = nbits - 1 - i
        limb = bit_index // 16
        shift = bit_index % 16
        limb_vals = jnp.take_along_axis(
            scalars, jnp.broadcast_to(limb, scalars.shape[:-1] + (1,)), axis=-1
        )[..., 0]
        bits = (limb_vals >> shift) & 1
        acc = g1_double(acc)
        added = g1_add(acc, p)
        return g1_select(bits, added, acc)

    acc = g1_infinity(p.shape[:-2])
    return jax.lax.fori_loop(0, nbits, body_t, acc)


@jax.jit
def g1_sum(points):
    """Tree-reduce a (N, 3, L) array of points to a single point (3, L).

    N must be a power of two (pad with infinity otherwise).
    """
    n = points.shape[0]
    assert n & (n - 1) == 0

    # trace-time loop: log2(N) levels of pairwise complete adds
    while n > 1:
        half = n // 2
        points = g1_add(points[:half], points[half:])
        n = half
    return points[0]


def fr_to_scalar_limbs(xs: Sequence[int]) -> jnp.ndarray:
    """Host scalars → (N, 16) canonical (non-Montgomery) limb array."""
    raw = b"".join(int(x % o.R).to_bytes(32, "little") for x in xs)
    limbs = np.frombuffer(raw, dtype="<u2").reshape(len(xs), 16)
    return jnp.asarray(limbs.astype(np.uint32))
