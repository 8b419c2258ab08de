"""Polynomial operations over Fr (coefficient form, c[0] = constant term).

Semantics match the reference prover's ``eval`` RPC
(reference: neurons/validator.py:97-104) and the quotient construction used by
KZG ``worker_open`` (reference: neurons/miner.py:47-54).

TPU-first formulation: Horner is a length-N *sequential* chain — poison for a
vector machine. Instead both evaluation and the synthetic-division quotient
come from one log-depth pipeline over the termwise products t_k = c_k·x^k:

    f(x)  = Σ_k t_k                      (tree reduction)
    S_j   = Σ_{k≥j} t_k                  (suffix sums: one Hillis-Steele scan)
    q_j   = (f(X) − f(x))/(X − x)[j] = x^{-(j+1)}·S_{j+1}

so a degree-2^16 opening is ~log₂N sequential steps instead of 2^16.

The wide ops (termwise products, suffix adds, quotient scaling) run on the
byte-limb f32 engine (ops/lane8.py) through the fused Pallas field kernels
(ops/pallas_g1.pfield) on TPU — the (N, L) uint32 limb-minor layout this
module previously computed in measured ~100 ms per 64k-wide Fr multiply on
a v5e, which would dominate the proving pipeline once the MSM is fast.
Boundaries stay (N, L) uint32 Montgomery for API compatibility.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .field import FR
from . import lane8 as l8
from . import pallas_g1 as pg

BFR = l8.BFR


def _fmul(a, b):
    """(L8, N) byte-lane Montgomery product — fused kernel when aligned."""
    if pg.aligned(a.shape[-1]) and a.shape == b.shape and a.ndim == 2:
        return pg.pfield("mont_mul", BFR, a, b)
    return BFR.mont_mul(a, b)


def _fadd(a, b):
    if pg.aligned(a.shape[-1]) and a.shape == b.shape and a.ndim == 2:
        return pg.pfield("add", BFR, a, b)
    return BFR.add(a, b)


def _powers_lane(x_col, n: int):
    """[1, x, ..., x^(n-1)] as (L8, n) byte lanes, log-depth doubling."""
    out = BFR.ones((1,))
    cur = x_col                                   # x^(len(out))
    while out.shape[-1] < n:
        w = out.shape[-1]
        nxt = _fmul(out, jnp.broadcast_to(cur, (BFR.L8, w)))
        out = jnp.concatenate([out, nxt], axis=-1)
        cur = _fmul(cur, cur)
    return out[..., :n]


def _suffix_sums(terms):
    """Inclusive suffix sums over the lane axis (Hillis-Steele; the shifted-
    in identity is the field zero, so plain zero-padding is correct)."""
    n = terms.shape[-1]
    d = 1
    while d < n:
        shifted = jnp.concatenate(
            [terms[..., d:], jnp.zeros((BFR.L8, d), jnp.float32)], axis=-1)
        terms = _fadd(terms, shifted)
        d <<= 1
    return terms


def _tree_sum_lane(terms):
    """Field-sum over lanes by halving (n a power of two)."""
    n = terms.shape[-1]
    while n > 1:
        half = n // 2
        terms = _fadd(terms[..., :half], terms[..., half:])
        n = half
    return terms


def poly_eval(coeffs, x):
    """Evaluate f(x). coeffs: (N, L) Montgomery; x: (L,). Returns (L,)."""
    n = coeffs.shape[0]
    c8 = l8.to_lane8(coeffs)
    pw = _powers_lane(l8.to_lane8(x[None]), n)
    terms = _fmul(c8, pw)
    if n & (n - 1) == 0:
        y8 = _tree_sum_lane(terms)
    else:
        y8 = _suffix_sums(terms)[..., :1]
    return l8.from_lane8(y8)[0]


def poly_eval_many(coeffs, xs):
    """Evaluate one polynomial at many points: coeffs (N,L), xs (B,L) → (B,L)."""
    return jax.vmap(lambda x: poly_eval(coeffs, x))(xs)


def poly_eval_and_quotient(coeffs, x):
    """(f(x), q) with q(X) = (f(X) − f(x))/(X − x), shape (N−1, L).

    One suffix scan serves both: f(x) = S_0 and q_j = x^{-(j+1)}·S_{j+1}.
    The x = 0 corner (never hit by random challenge points, but kept exact)
    degenerates to q = c[1:], selected branchlessly.
    """
    n = coeffs.shape[0]
    c8 = l8.to_lane8(coeffs)
    x8 = l8.to_lane8(x[None])                     # (L8, 1)
    pw = _powers_lane(x8, n)
    terms = _fmul(c8, pw)                         # t_k = c_k·x^k
    suffix = _suffix_sums(terms)
    y8 = suffix[..., :1]

    x_inv = FR.inv(x)                             # 0 → 0 (Fermat, narrow)
    xi8 = l8.to_lane8(x_inv[None])
    # q_j = x^{-(j+1)}·S_{j+1}: compute at full (aligned) width n, slice
    inv_pw = _fmul(_powers_lane(xi8, n),
                   jnp.broadcast_to(xi8, (BFR.L8, n)))  # x^{-1}..x^{-n}
    s_next = jnp.concatenate(
        [suffix[..., 1:], jnp.zeros((BFR.L8, 1), jnp.float32)], axis=-1)
    q8 = _fmul(s_next, inv_pw)                    # (L8, n); last col junk

    y = l8.from_lane8(y8)[0]
    q = l8.from_lane8(q8[..., :n - 1])            # (n-1, L)
    q_zero = coeffs[1:]                           # exact quotient at x = 0
    zero = FR.is_zero(x)
    q = FR.select(jnp.broadcast_to(zero, q.shape[:-1]), q_zero, q)
    return y, q


def poly_quotient(coeffs, x):
    """q(X) = (f(X) − f(x))/(X − x) via the suffix-scan identity above."""
    return poly_eval_and_quotient(coeffs, x)[1]


def poly_open_scalars(coeffs, x):
    """(f(x), canonical quotient scalars) for a KZG opening, all-aligned.

    Returns (y (L,) Montgomery, q (N, 16) CANONICAL 16-bit limbs) where
    q[N-1] = 0 — the quotient padded to full width so every wide op (and
    the caller's MSM over all N bases) stays lane-aligned; the de-Mont
    conversion is fused into the same byte-lane pipeline instead of a
    separate limb-minor from_mont pass."""
    n = coeffs.shape[0]
    c8 = l8.to_lane8(coeffs)
    x8 = l8.to_lane8(x[None])
    pw = _powers_lane(x8, n)
    terms = _fmul(c8, pw)
    suffix = _suffix_sums(terms)
    y8 = suffix[..., :1]

    x_inv = FR.inv(x)
    xi8 = l8.to_lane8(x_inv[None])
    inv_pw = _fmul(_powers_lane(xi8, n),
                   jnp.broadcast_to(xi8, (BFR.L8, n)))
    s_next = jnp.concatenate(
        [suffix[..., 1:], jnp.zeros((BFR.L8, 1), jnp.float32)], axis=-1)
    one = jnp.zeros((BFR.L8, 1), jnp.float32).at[0, 0].set(1.0)
    q8 = _fmul(_fmul(s_next, inv_pw),
               jnp.broadcast_to(one, s_next.shape))    # canonical limbs
    # zero the junk last column; x = 0 corner → q = c[1:] (canonical)
    q8 = q8.at[..., n - 1:].set(0.0)
    q = l8.from_lane8(q8)                              # (n, L) canonical
    zero = FR.is_zero(x)
    q_zero = jnp.concatenate(
        [FR.from_mont(coeffs[1:]), jnp.zeros((1, FR.L), jnp.uint32)], axis=0)
    q = FR.select(jnp.broadcast_to(zero, q.shape[:-1]), q_zero, q)
    return l8.from_lane8(y8)[0], q


def poly_add(a, b):
    return FR.add(a, b)


def poly_scale(coeffs, k):
    """Multiply every coefficient by scalar k (Montgomery)."""
    return FR.mont_mul(coeffs, jnp.broadcast_to(k, coeffs.shape))


def from_mont_wide(coeffs):
    """(N, L) Montgomery → canonical limbs via the byte engine (the wide
    from_mont in kzg.commit/open_ — limb-minor FR.from_mont measured ~100 ms
    at 64k on a v5e)."""
    c8 = l8.to_lane8(coeffs)
    one = jnp.zeros((BFR.L8, 1), jnp.float32).at[0, 0].set(1.0)
    out = _fmul(c8, jnp.broadcast_to(one, c8.shape))
    return l8.from_lane8(out)
