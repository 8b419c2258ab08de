"""Polynomial operations over Fr (coefficient form, c[0] = constant term).

Semantics match the reference prover's ``eval`` RPC
(reference: neurons/validator.py:97-104) and the quotient construction used by
KZG ``worker_open`` (reference: neurons/miner.py:47-54): Horner evaluation and
synthetic division, both expressed as ``lax.scan``/``fori_loop`` so the jaxpr
stays small and TPU-friendly at any degree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .field import FR


def poly_eval(coeffs, x):
    """Evaluate f(x) by Horner. coeffs: (N, L) Montgomery; x: (L,)."""
    n = coeffs.shape[0]

    def body(i, acc):
        # process coefficients high → low
        c = jax.lax.dynamic_slice_in_dim(coeffs, n - 1 - i, 1, axis=0)[0]
        return FR.add(FR.mont_mul(acc, x), c)

    acc = jnp.zeros_like(x)
    return jax.lax.fori_loop(0, n, body, acc)


def poly_eval_many(coeffs, xs):
    """Evaluate one polynomial at many points: coeffs (N,L), xs (B,L) → (B,L)."""
    n = coeffs.shape[0]

    def body(i, acc):
        c = jax.lax.dynamic_slice_in_dim(coeffs, n - 1 - i, 1, axis=0)
        return FR.add(FR.mont_mul(acc, xs), jnp.broadcast_to(c, xs.shape))

    return jax.lax.fori_loop(0, n, body, jnp.zeros_like(xs))


def poly_quotient(coeffs, x):
    """q(X) = (f(X) - f(x)) / (X - x) via synthetic division.

    coeffs: (N, L); returns (N-1, L). q[n-2] = c[n-1]; q[i-1] = c[i] + x*q[i].
    Expressed as a scan from the top coefficient down.
    """
    n = coeffs.shape[0]
    rev_high = coeffs[1:][::-1]  # c[n-1], c[n-2], ..., c[1]

    def step(acc, c):
        acc = FR.add(FR.mont_mul(acc, x), c)
        return acc, acc

    _, qs = jax.lax.scan(step, jnp.zeros_like(x), rev_high)
    return qs[::-1]  # q[0] ... q[n-2]


def poly_add(a, b):
    return FR.add(a, b)


def poly_scale(coeffs, k):
    """Multiply every coefficient by scalar k (Montgomery)."""
    return FR.mont_mul(coeffs, jnp.broadcast_to(k, coeffs.shape))
